package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2) re-expressed over the
  * driver-provided TPC-H-ish tables. Each entry cites the reference behavior
  * it generalizes (file:line into /root/reference) and is written
  * Catalyst-first: declarative DataFrame plans so predicate pushdown, column
  * pruning, partial aggregation and join selection come from the optimizer,
  * not hand-scheduling.
  *
  * Determinism rules for the DuckDB oracle hash-compare:
  *   - double aggregates are `round(_, 2..4)` (binary double sums differ only
  *     ~1e-7 relative across engines/orders — far below the rounding grain);
  *   - counts / lengths / ranks are cast to LongType to match DuckDB BIGINT;
  *   - every ORDER BY carries a full tie-break so LIMIT-k sets are unique.
  */
object Relational {

  private def ev(s: SparkSession, d: String)  = Tables.events(s, d)
  private def li(s: SparkSession, d: String)  = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  val all: Seq[Q] = Seq(

    // ---- scans / projections / filters --------------------------------

    Q("q01_scan_project",
      "S1/P1: projection + comparison predicate, both pushed into the " +
        "parquet scan (reference: SELECT list main.py:139-145, WHERE main.py:154).",
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin) {
      (s, d) =>
        li(s, d)
          .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
          .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
    },

    Q("q02_case_project",
      "P2/P3/P6: row-shaping projection with rename and CASE threshold " +
        "(reference: status classification main.py:106,166).",
      """SELECT event_id, user_id, value AS score,
        |  CASE WHEN value < 50 THEN 'Critical' ELSE 'Normal' END AS status
        |FROM events""".stripMargin) { (s, d) =>
      ev(s, d).select(
        col("event_id"), col("user_id"), col("value").as("score"),
        when(col("value") < 50, "Critical").otherwise("Normal").as("status"))
    },

    // ---- joins ---------------------------------------------------------

    Q("q03_join_inner_agg",
      "J1+A: inner equi-join then grouped aggregate; customer is " +
        "broadcast-sized so Catalyst plans a broadcast hash join " +
        "(reference join main.py:146).",
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin) { (s, d) =>
      ord(s, d)
        .join(broadcast(cust(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
             round(sum("o_totalprice"), 2).as("total_price"))
    },

    Q("q04_join_left_compound",
      "J2/P7: left outer join on a compound equi-condition with NULL " +
        "coalesce on the probe side (reference main.py:147-148,165).",
      """SELECT o_orderkey, o_orderstatus,
        |  COALESCE(l_quantity, 0) AS first_line_qty
        |FROM orders LEFT JOIN lineitem
        |  ON l_orderkey = o_orderkey AND l_linenumber = 1""".stripMargin) {
      (s, d) =>
        ord(s, d)
          .join(li(s, d),
                col("l_orderkey") === col("o_orderkey") && col("l_linenumber") === 1,
                "left_outer")
          .select(col("o_orderkey"), col("o_orderstatus"),
                  coalesce(col("l_quantity"), lit(0.0)).as("first_line_qty"))
    },

    Q("q05_join_semi",
      "P5: existence filter as a left-semi join (reference referential " +
        "filter db_loader.py:121-129).",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) {
      (s, d) =>
        cust(s, d)
          .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey", "c_name")
    },

    Q("q06_join_anti",
      "Anti join: negation of P5 (customers with no orders) — NOT EXISTS.",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin) {
      (s, d) =>
        cust(s, d)
          .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
    },

    Q("q07_explode_wordcount",
      "U3/F8/J3: array generation (explode) + grouped count — the Spark " +
        "form of the reference's array-unnest enrichment " +
        "(db_loader.py:102-108).",
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |GROUP BY word""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
    },

    // ---- aggregates ----------------------------------------------------

    Q("q08_stats_scalar",
      "A1/A2: filtered count + truncated global average in one pass " +
        "(reference dashboard stats main.py:154-155,172).",
      """SELECT count(*) AS n_events,
        |  count(*) FILTER (WHERE value < 50) AS critical_alerts,
        |  CAST(FLOOR(avg(value)) AS BIGINT) AS avg_score_trunc
        |FROM events""".stripMargin) { (s, d) =>
      ev(s, d).agg(
        count(lit(1)).as("n_events"),
        count(when(col("value") < 50, lit(1))).as("critical_alerts"),
        floor(avg(col("value"))).cast("long").as("avg_score_trunc"))
    },

    Q("q09_latest_per_key",
      "A3/A4/S4/T3: arg-max per key via max_by — the latest-state-per-user " +
        "semantics of the reference's stream state + serving read " +
        "(stream_processor.py:32-40, main.py:58-61). max_by aggregates in " +
        "one shuffle with map-side partials; no per-partition sort needed.",
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS last_ts,
        |  event_type, value
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
      ev(s, d)
        .groupBy("user_id")
        .agg(max_by(
          struct(col("event_id"), col("ts"), col("event_type"), col("value")),
          struct(col("ts_ns"), col("event_id"))).as("r"))
        .select(col("user_id"), col("r.event_id").as("event_id"),
                col("r.ts").as("last_ts"), col("r.event_type").as("event_type"),
                col("r.value").as("value"))
    },

    Q("q10_topk_global",
      "O1: global top-k — Catalyst plans TakeOrderedAndProject (per-partition " +
        "heap + single merge, no full sort) (reference ORDER BY ... LIMIT 50 " +
        "main.py:149).",
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
        |FROM events ORDER BY ts DESC, event_id DESC LIMIT 50""".stripMargin) {
      (s, d) =>
        ev(s, d)
          .orderBy(col("ts_ns").desc, col("event_id").desc)
          .limit(50)
          .select("event_id", "user_id", "ts", "event_type", "value")
    },

    Q("q11_topk_per_key",
      "O2/A4 generalized: top-3 per key via ranking window.",
      """SELECT user_id, event_id, value, CAST(rn AS BIGINT) AS rn
        |FROM (SELECT user_id, event_id, value, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events) WHERE rn <= 3""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts_ns").desc, col("event_id").desc)
      ev(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("value"), col("rn").cast("long").as("rn"))
    },

    Q("q12_group_agg_wide",
      "A: multi-aggregate groupBy (TPC-H Q1 shape) — partial (map-side) " +
        "aggregation before the shuffle is Catalyst-automatic.",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      li(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          round(avg("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },

    Q("q13_json_extract",
      "F7: semi-structured extraction from a JSON string column, then " +
        "grouped aggregate (reference event-body JSON handling " +
        "ingestion.py:19, stream_processor.py:26).",
      """SELECT event_type,
        |  CAST(sum(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |  count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      ev(s, d)
        .withColumn("k", regexp_extract(col("props"), "\"k\": ([0-9]+)", 1).cast("long"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("n"))
    },

    Q("q14_string_funcs",
      "F10/F13: concat + substring + upper + length — the reference's " +
        "device-id shaping (gen_wearables.py:43) and renames.",
      """SELECT c_custkey, concat('dev_', substr(c_name, 1, 8)) AS device_id,
        |  upper(c_mktsegment) AS segment, CAST(length(c_name) AS BIGINT) AS name_len
        |FROM customer""".stripMargin) { (s, d) =>
      cust(s, d).select(
        col("c_custkey"),
        concat(lit("dev_"), substring(col("c_name"), 1, 8)).as("device_id"),
        upper(col("c_mktsegment")).as("segment"),
        length(col("c_name")).cast("long").as("name_len"))
    },

    Q("q15_date_parts",
      "F4/F5: date-part extraction + grouped aggregate (reference timestamp " +
        "normalization db_loader.py:127,144).",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2""".stripMargin) { (s, d) =>
      ord(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
                 month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
    },

    // ---- set operations (extension beyond the reference, SURVEY §2.7) --

    Q("q16_union_all",
      "Set op: UNION ALL of two filtered scans (the reference's dual-write " +
        "fan-out ingestion.py:31-49 re-read as a union).",
      """SELECT user_id, 'purchase' AS kind, value FROM events WHERE event_type = 'purchase'
        |UNION ALL
        |SELECT user_id, 'click' AS kind, value FROM events WHERE event_type = 'click'""".stripMargin) {
      (s, d) =>
        val e = ev(s, d)
        e.filter(col("event_type") === "purchase")
          .select(col("user_id"), lit("purchase").as("kind"), col("value"))
          .unionAll(
            e.filter(col("event_type") === "click")
              .select(col("user_id"), lit("click").as("kind"), col("value")))
    },

    Q("q17_intersect",
      "Set op: INTERSECT of two key sets.",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'error'""".stripMargin) {
      (s, d) =>
        val e = ev(s, d)
        e.filter(col("event_type") === "purchase").select("user_id")
          .intersect(e.filter(col("event_type") === "error").select("user_id"))
    },

    Q("q18_distinct_agg",
      "Distinct aggregate: exact count(DISTINCT) per group.",
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      ev(s, d).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
    },

    // ---- analytic windows (extension, SURVEY §2.5) ---------------------

    Q("q19_window_running",
      "Analytic window: running sum per key — exact cross-engine match " +
        "because the frame order is fully tie-broken (sequential fp sum).",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ord(s, d).select(col("o_custkey"), col("o_orderkey"),
                       round(sum("o_totalprice").over(w), 2).as("running_total"))
    },

    Q("q20_window_lag",
      "Analytic window: lag — days since the key's previous order.",
      """SELECT o_custkey, o_orderkey,
        |  CAST(date_diff('day',
        |    lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |    o_orderdate) AS BIGINT) AS days_since_prev
        |FROM orders""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      ord(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast("long").as("days_since_prev"))
    },

    Q("q21_rollup",
      "Grouping sets: ROLLUP over two grouping columns (extension; the " +
        "reference has no grouping sets — SURVEY §2.4).",
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) {
      (s, d) =>
        li(s, d).rollup("l_returnflag", "l_linestatus")
          .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
    },

    // ---- as-of join (robust generalization of J2, SURVEY §2.3) ---------

    Q("q22_asof_join",
      "As-of join: for each order, the latest event of that key at-or-before " +
        "the order date — the robust generalization of the reference's " +
        "fragile timestamp-equality left join (main.py:147-148; see SURVEY " +
        "§7.4.5). Implemented shuffle-once: tag+union both sides, one " +
        "window pass per key ordered by time, last non-null event carried " +
        "forward. Scales as a single sort-shuffle on the key — no range " +
        "cross-product.",
      """SELECT o_orderkey, o_custkey, e.value AS asof_value
        |FROM orders o ASOF LEFT JOIN events e
        |  ON o.o_custkey = e.user_id AND e.ts <= CAST(o.o_orderdate AS TIMESTAMP_NS)""".stripMargin) {
      (s, d) =>
        val e = ev(s, d).select(
          col("user_id").as("k"), col("ts_ns").as("t"),
          lit(0).as("side"), col("event_id").as("seq"), col("value"))
        val o = ord(s, d).select(
          col("o_custkey").as("k"),
          // NTZ parquet timestamp -> LTZ (identity under the pinned UTC session)
          (unix_micros(col("o_orderdate").cast("timestamp")) * 1000L).as("t"),
          lit(1).as("side"), col("o_orderkey").as("seq"),
          lit(null).cast("double").as("value"))
        // events sort before orders at equal t (side 0 < 1) => `<=` semantics
        val w = Window.partitionBy("k")
          .orderBy(col("t"), col("side"), col("seq"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.unionAll(o)
          .withColumn("asof_value", last(col("value"), ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select(col("seq").as("o_orderkey"), col("k").as("o_custkey"), col("asof_value"))
    },

    // ---- CPMS dashboard, end-to-end shape (SURVEY §3.3) ----------------

    Q("q23_dashboard_recent",
      "Reference dashboard recent-checks query end-to-end (main.py:139-151): " +
        "scores joined to the user dimension (broadcast), CASE status, " +
        "global top-50 by time.",
      """SELECT e.event_id, c.c_name AS user_name, e.value AS score,
        |  CAST(e.ts AS TIMESTAMP) AS ts,
        |  CASE WHEN e.value < 50 THEN 'Critical' ELSE 'Normal' END AS status
        |FROM events e JOIN customer c ON c.c_custkey = e.user_id
        |ORDER BY e.ts DESC, e.event_id DESC LIMIT 50""".stripMargin) { (s, d) =>
      ev(s, d)
        .join(broadcast(cust(s, d)), col("c_custkey") === col("user_id"))
        .orderBy(col("ts_ns").desc, col("event_id").desc)
        .limit(50)
        .select(col("event_id"), col("c_name").as("user_name"),
                col("value").as("score"), col("ts"),
                when(col("value") < 50, "Critical").otherwise("Normal").as("status"))
    }
  )
}
