package graft.operators

import graft.{Q, Tables}
import graft.functions.TopKBy.top_k_by
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational batch: analytics the reference delegates wholesale to
  * Postgres/DynamoDB generalized to their full Spark forms — sessionization,
  * percentiles, statistical aggregates, pivot, subqueries, cube, range
  * joins, analytic frames, sketches.
  */
object Relational2 {

  private def ev(s: SparkSession, d: String)  = Tables.events(s, d)
  private def li(s: SparkSession, d: String)  = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)

  /** q51's pair generation with skew-salted blocks (exposed so tests can
    * force salting with a tiny `maxBlock`).
    *
    * The plain bucketed self-join keys on (lang, length-bucket); a hot
    * block — one dominant language at one dominant length — routes its
    * entire B^2 candidate workload through ONE join task. Salting splits
    * it: a per-block size statistic (map-side-partial aggregate over a
    * domain-bounded key space, broadcast back) assigns each block
    * nsalt = ceil(size / maxBlock) sub-blocks; the build side lands in
    * sub-block hash(doc_id) % nsalt, the probe side fans out to all of
    * them. Every (build, probe) pair still meets exactly once — the build
    * doc's salt is a function of its id, and the probe enumerates salts
    * exhaustively — so the candidate SET is identical to the unsalted
    * join; only its distribution over tasks changes. Cold blocks get
    * nsalt = 1 and pay nothing. Probe fanout to the {b-1, b, b+1} length
    * buckets is unchanged (every |Δchars| <= 20 pair differs by at most
    * one bucket, so it matches on the build doc's bucket exactly once —
    * no distinct needed).
    */
  /** maxBlock default: a task's candidate workload is bounded by
    * maxBlock x |block| pairs, each paying a thresholded levenshtein —
    * at 4096 a single dominant (lang, bucket) block kept the whole DP
    * bill on one or two tasks (measured ~1.4 s single-threaded at
    * sf0.1); 512 splits a hot block ~8x for a probe-fanout duplication
    * that is linear in nsalt. The candidate SET is invariant under
    * maxBlock (RecallSpec pins row identity under forced maxBlock=8),
    * so this is purely a parallelism knob.
    */
  def fuzzyPairs(s: SparkSession, d: String, maxBlock: Int = 512): DataFrame = {
    val base = Tables.documents(s, d).select(
      col("doc_id"), col("lang"), col("n_chars"),
      substring(col("text"), 1, 32).as("head"),
      floor(col("n_chars") / 20).cast("long").as("bkt"))
    // block-size stats: keyed by (lang, length-bucket) — domain-bounded
    // (#langs x #distinct-length-buckets), so tiny and broadcastable at
    // any corpus size even though it aggregates every row
    val salts = base
      .groupBy(col("lang"), col("bkt").as("bucket"))
      .agg(ceil(count(lit(1)).cast("double") / maxBlock).cast("int").as("nsalt"))
    val build = base.withColumnRenamed("bkt", "bucket")
      .join(broadcast(salts), Seq("lang", "bucket"))
      .withColumn("salt", pmod(hash(col("doc_id")), col("nsalt")))
      .drop("nsalt")
    val probe = base.select(
        col("doc_id").as("p_id"), col("lang"), col("n_chars").as("p_chars"),
        col("head").as("p_head"),
        explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("bucket"))
      // inner join doubles as existence pruning: probes into empty
      // neighbor buckets (no build rows -> no stats row) are dropped here
      // instead of shuffling to a matchless join task
      .join(broadcast(salts), Seq("lang", "bucket"))
      .withColumn("salt", explode(sequence(lit(0), col("nsalt") - 1)))
      .drop("nsalt")
    // r20: pin the candidate join to the shuffle path AND pin its
    // partition count. Two separate planner choices were serializing
    // the per-pair levenshtein bill onto 1-2 tasks at bench scale
    // (measured ~1.4 s single-threaded): the planner BROADCASTS the
    // exploded probe side (leaving the stream side as the unsplit
    // scan), and with the shuffle forced, AQE coalesces the
    // kilobyte-sized exchanges to ONE partition — partition sizing is
    // byte-based and blind to per-row CPU. An explicit keyed
    // repartition at defaultParallelism is AQE-coalesce-proof
    // (REPARTITION_BY_NUM) and scale-adaptive (cluster cores); the
    // join reuses its partitioning, so no extra exchange. At corpus
    // scale the probe side could never broadcast anyway (the q112
    // no-broadcast rule) and the shuffle carries the same bytes it
    // always did.
    val p = s.sparkContext.defaultParallelism
    val keys = Seq(col("lang"), col("bucket"), col("salt"))
    build.repartition(p, keys: _*)
      .join(probe.repartition(p, keys: _*).hint("shuffle_hash"),
            Seq("lang", "bucket", "salt"))
      .filter(col("doc_id") < col("p_id") &&
              abs(col("n_chars") - col("p_chars")) <= 20)
      .select(col("doc_id").as("id_a"), col("p_id").as("id_b"),
              // thresholded form: the DP early-exits (returns -1) once the
              // distance provably exceeds 12 — most candidate pairs do
              levenshtein(col("head"), col("p_head"), 13).cast("long").as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= 12)
  }

  val all: Seq[Q] = Seq(

    Q("q24_sessionize",
      "Sessionization: per-user session ids from >30min event gaps (lag + " +
        "running conditional sum), then per-session stats. One shuffle on " +
        "user_id serves both windows and the final group.",
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms, value,
        |    CASE WHEN epoch_ms(CAST(ts AS TIMESTAMP))
        |           - lag(epoch_ms(CAST(ts AS TIMESTAMP)))
        |             OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           > 1800000 THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, ms, value,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  round(sum(value), 2) AS session_value, min(ms) AS start_ms, max(ms) AS end_ms
        |FROM s GROUP BY user_id, session_id""".stripMargin) { (s, d) =>
      // epoch_ms(micros-truncated ts) == ts_ns div 1e6 (both floor)
      val e = ev(s, d).withColumn("ms", expr("ts_ns div 1000000"))
      val wOrd = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
      val wRun = Window.partitionBy("user_id").orderBy(col("ms"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("brk",
          when(col("ms") - lag(col("ms"), 1).over(wOrd) > 1800000L, 1).otherwise(0))
        .withColumn("session_id", sum(col("brk")).over(wRun))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("session_value"),
             min("ms").as("start_ms"), max("ms").as("end_ms"))
    },

    Q("q25_percentiles",
      "Exact percentiles (linear interpolation) per group — the full form " +
        "of threshold analytics the reference hardcodes (score<50).",
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      ev(s, d).groupBy("event_type").agg(
        round(percentile(col("value"), lit(0.5)), 4).as("p50"),
        round(percentile(col("value"), lit(0.9)), 4).as("p90"),
        round(percentile(col("value"), lit(0.99)), 4).as("p99"))
    },

    Q("q26_stats_agg",
      "Statistical aggregates: sample stddev/variance, correlation and " +
        "covariance per group.",
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_discount), 6) AS var_disc,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(covar_samp(l_quantity, l_discount), 6) AS covar_qty_disc
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, d) =>
      li(s, d).groupBy("l_returnflag").agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_discount")), 6).as("var_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("covar_qty_disc"))
    },

    Q("q27_pivot",
      "Pivot: events wide by type per user (explicit value list keeps the " +
        "output schema static — no extra distinct-values job at scale).",
      """SELECT user_id,
        |  round(sum(value) FILTER (WHERE event_type = 'click'), 2) AS click,
        |  round(sum(value) FILTER (WHERE event_type = 'view'), 2) AS view,
        |  round(sum(value) FILTER (WHERE event_type = 'purchase'), 2) AS purchase,
        |  round(sum(value) FILTER (WHERE event_type = 'signup'), 2) AS signup,
        |  round(sum(value) FILTER (WHERE event_type = 'error'), 2) AS error
        |FROM events GROUP BY user_id""".stripMargin) { (s, d) =>
      val types = Seq("click", "view", "purchase", "signup", "error")
      ev(s, d).groupBy("user_id")
        .pivot("event_type", types)
        .agg(round(sum("value"), 2))
    },

    Q("q28_scalar_subquery",
      "Scalar subquery: orders above the global average price (single-row " +
        "aggregate broadcast against the scan — no per-row recompute).",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""".stripMargin) {
      (s, d) =>
        val o = ord(s, d)
        val avgDf = o.agg(avg("o_totalprice").as("avg_price"))
        o.join(broadcast(avgDf), col("o_totalprice") > col("avg_price"))
          .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    Q("q29_cube",
      "CUBE grouping sets over two dimensions.",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  round(sum(l_extendedprice), 2) AS total
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin) {
      (s, d) =>
        li(s, d).cube("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))
    },

    Q("q44_range_join",
      "Range join: events within 7 days after each order of the same key " +
        "— equi-join on the key with the range as residual, so it plans as " +
        "a hash join, not a cross-product.",
      """SELECT o_orderkey,
        |  count(e.event_id) AS n_events,
        |  round(coalesce(sum(e.value), 0), 2) AS sum_value
        |FROM orders o LEFT JOIN events e
        |  ON e.user_id = o.o_custkey
        |  AND e.ts >= CAST(o.o_orderdate AS TIMESTAMP_NS)
        |  AND e.ts < CAST(o.o_orderdate + INTERVAL 7 DAY AS TIMESTAMP_NS)
        |GROUP BY o_orderkey""".stripMargin) { (s, d) =>
      val e = ev(s, d).select(col("user_id"), col("event_id"), col("value"),
                              col("ts_ns"))
      val o = ord(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        (unix_micros(col("o_orderdate").cast("timestamp")) * 1000L).as("lo"),
        ((unix_micros(col("o_orderdate").cast("timestamp")) + 7L * 86400L * 1000000L) * 1000L).as("hi"))
      o.join(e, col("user_id") === col("o_custkey") &&
                col("ts_ns") >= col("lo") && col("ts_ns") < col("hi"), "left_outer")
        .groupBy("o_orderkey")
        .agg(count(col("event_id")).as("n_events"),
             round(coalesce(sum("value"), lit(0.0)), 2).as("sum_value"))
    },

    Q("q45_analytic_frames",
      "Analytic window frames: first/last/nth value over a bounded frame " +
        "plus rank and dense_rank.",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price,
        |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_rank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFull = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wRank = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      ord(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(wFull).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
        rank().over(wRank).cast("long").as("price_rank"))
    },

    Q("q47_tumbling_window",
      "Event-time tumbling window aggregation (SURVEY T5): 5-minute " +
        "buckets per event_type — the batch form of the Structured " +
        "Streaming `window()` aggregate (same expression runs on " +
        "readStream with a watermark; see graft.cpms.Streaming tests).",
      """SELECT event_type,
        |  epoch_ms(time_bucket(INTERVAL 5 MINUTES, CAST(ts AS TIMESTAMP))) AS window_start_ms,
        |  count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      ev(s, d)
        .groupBy(col("event_type"),
                 window(col("ts"), "5 minutes").getField("start").as("ws"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total"))
        .select(col("event_type"),
                (unix_micros(col("ws")) / 1000L).cast("long").as("window_start_ms"),
                col("n"), col("total"))
    },

    Q("q48_sliding_window",
      "Sliding event-time windows (10 min width, 5 min slide): each event " +
        "contributes to two overlapping buckets.",
      """SELECT s.window_start_ms, count(*) AS n,
        |  round(round(sum(e.value), 2) / count(*), 4) AS avg_value
        |FROM events e CROSS JOIN LATERAL (
        |  SELECT unnest(ARRAY[
        |    epoch_ms(time_bucket(INTERVAL 5 MINUTES, CAST(e.ts AS TIMESTAMP))),
        |    epoch_ms(time_bucket(INTERVAL 5 MINUTES, CAST(e.ts AS TIMESTAMP))) - 300000
        |  ]) AS window_start_ms) s
        |GROUP BY 1""".stripMargin) { (s, d) =>
      ev(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").getField("start").as("ws"))
        // avg from the 2dp-rounded sum: summation order differs across
        // engines, and a raw avg can straddle a round-half boundary
        .agg(count(lit(1)).as("n"),
             round(round(sum("value"), 2) / count(lit(1)), 4).as("avg_value"))
        .select((unix_micros(col("ws")) / 1000L).cast("long").as("window_start_ms"),
                col("n"), col("avg_value"))
    },

    Q("q49_salted_agg",
      "Skew-resistant aggregation: two-phase salted groupBy for hot keys " +
        "(event_type has only 5 values — a guaranteed shuffle skew). Phase " +
        "1 aggregates on (key, salt16) spreading each hot key over 16 " +
        "reducers; phase 2 combines the 16 partials. Result is identical " +
        "to the plain GROUP BY the oracle runs.",
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
        |FROM events GROUP BY event_type""".stripMargin) { (s, d) =>
      ev(s, d)
        .withColumn("salt", pmod(hash(col("event_id")), lit(16)))
        .groupBy("event_type", "salt")
        .agg(count(lit(1)).as("pn"), sum("value").as("psum"))
        .groupBy("event_type")
        .agg(sum("pn").as("n"), round(sum("psum"), 2).as("total"))
    },

    Q("q50_topk_agg",
      "Top-k per key via the custom bounded-state aggregate (top_k_by, a " +
        "TypedImperativeAggregate): O(k) buffer per group with map-side " +
        "partial aggregation — vs the window formulation (q11) that must " +
        "sort every row of every group. Oracle-checked against the window " +
        "spelling, so the heap path is proven equivalent.",
      """SELECT user_id, event_id, value, CAST(rk AS BIGINT) AS rk
        |FROM (SELECT user_id, event_id, value, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk
        |      FROM events) WHERE rk <= 3""".stripMargin) { (s, d) =>
      ev(s, d)
        .groupBy("user_id")
        .agg(top_k_by(struct(col("event_id"), col("value")),
                      struct(col("ts_ns"), col("event_id")), 3).as("top"))
        .select(col("user_id"), posexplode(col("top")))
        .select(col("user_id"), col("col.event_id").as("event_id"),
                col("col.value").as("value"), (col("pos") + 1).cast("long").as("rk"))
    },

    Q("q51_fuzzy_match",
      "Edit-distance fuzzy matching: Levenshtein over 32-char document " +
        "prefixes within (lang, length-bucket) blocks — the same bucketed " +
        "candidate generation as the dedup family, with the quadratic " +
        "distance only on candidates.",
      """WITH t AS (SELECT doc_id, lang, n_chars, left(text, 32) AS head,
        |             CAST(floor(n_chars / 20) AS BIGINT) AS b FROM documents),
        |     e AS (SELECT doc_id, lang, n_chars, head, unnest(ARRAY[b, b + 1]) AS bucket FROM t)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
        |FROM e a JOIN e b ON a.lang = b.lang AND a.bucket = b.bucket
        |WHERE a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 20
        |  AND levenshtein(a.head, b.head) <= 12
        |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      // Asymmetric probe join with skew salting — see [[fuzzyPairs]]:
      // build side sits in its own length bucket once, probe fans out to
      // {b-1, b, b+1}, and oversize (lang, bucket) blocks are split into
      // hash-salted sub-blocks so no join task ever holds more than
      // ~maxBlock build rows.
      fuzzyPairs(s, d)
    },

    Q("q52_date_arith",
      "Date/interval arithmetic: truncation, offsets, month deltas, " +
        "weekday extraction.",
      """SELECT o_orderkey,
        |  date_trunc('month', o_orderdate) AS order_month,
        |  o_orderdate + INTERVAL 30 DAY AS due_ts,
        |  CAST(datediff('month', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS months_since_95,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow -- duckdb 0=Sun, spark 1=Sun
        |FROM orders""".stripMargin) { (s, d) =>
      ord(s, d).select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("order_month"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_ts"),
        (months_between(date_trunc("month", col("o_orderdate")),
                        lit("1995-01-01").cast("timestamp_ntz"))).cast("long")
          .as("months_since_95"),
        dayofweek(col("o_orderdate")).cast("long").as("dow"))
    },

    Q("q53_except",
      "Set op: EXCEPT (keys seen in purchases but never in errors).",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'error'""".stripMargin) {
      (s, d) =>
        val e = ev(s, d)
        e.filter(col("event_type") === "purchase").select("user_id")
          .except(e.filter(col("event_type") === "error").select("user_id"))
    },

    Q("q66_join_full_outer",
      "Full outer join: union the key spaces of two per-user aggregates " +
        "(purchasers vs error reporters), null-coalesced counts. Completes " +
        "the join-type spectrum (inner/left/semi/anti/range/as-of here).",
      """WITH p AS (SELECT user_id, count(*) AS n_purch FROM events
        |           WHERE event_type = 'purchase' GROUP BY 1),
        |     e AS (SELECT user_id, count(*) AS n_err FROM events
        |           WHERE event_type = 'error' GROUP BY 1)
        |SELECT COALESCE(p.user_id, e.user_id) AS user_id,
        |  COALESCE(n_purch, 0) AS n_purch, COALESCE(n_err, 0) AS n_err
        |FROM p FULL OUTER JOIN e ON p.user_id = e.user_id""".stripMargin) {
      (s, d) =>
        val base = ev(s, d)
        val p = base.filter(col("event_type") === "purchase")
          .groupBy(col("user_id").as("p_user")).agg(count(lit(1)).as("n_purch"))
        val e = base.filter(col("event_type") === "error")
          .groupBy(col("user_id").as("e_user")).agg(count(lit(1)).as("n_err"))
        p.join(e, col("p_user") === col("e_user"), "full_outer")
          .select(coalesce(col("p_user"), col("e_user")).as("user_id"),
                  coalesce(col("n_purch"), lit(0L)).as("n_purch"),
                  coalesce(col("n_err"), lit(0L)).as("n_err"))
    },

    Q("q67_analytic_ranks",
      "The remaining analytic window family: ntile quartiles, " +
        "percent_rank, cume_dist, nth_value — one window spec, one " +
        "shuffle+sort on the partition key serves all four.",
      """SELECT event_id, user_id,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd,
        |  round(nth_value(value, 2) OVER
        |    (PARTITION BY user_id ORDER BY value, event_id
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
        |    AS second_lowest
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)""".stripMargin) {
      (s, d) =>
        val w = Window.partitionBy("user_id").orderBy(col("value"), col("event_id"))
        val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ev(s, d).select(
          col("event_id"), col("user_id"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"),
          round(nth_value(col("value"), 2).over(wFull), 2).as("second_lowest"))
    },

    Q("q68_null_semantics",
      "Null-comparison semantics: null-safe equality (<=> / IS NOT " +
        "DISTINCT FROM), null-aware counts, and NULLS FIRST/LAST ranking " +
        "— the SQL corners that silently diverge between engines unless " +
        "pinned.",
      """WITH t AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS pri,
        |    CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END AS price
        |  FROM orders)
        |SELECT
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(pri) AS BIGINT) AS n_pri,
        |  CAST(count(*) FILTER (WHERE pri IS NOT DISTINCT FROM NULL) AS BIGINT)
        |    AS n_null_safe_null,
        |  CAST(count(*) FILTER (WHERE pri IS NOT DISTINCT FROM '1-URGENT') AS BIGINT)
        |    AS n_urgent,
        |  round(sum(COALESCE(price, 0)), 2) AS price_nvl
        |FROM t""".stripMargin) { (s, d) =>
      val t = ord(s, d).select(
        when(col("o_orderkey") % 3 === 0, lit(null)).otherwise(col("o_orderpriority")).as("pri"),
        when(col("o_orderkey") % 5 === 0, lit(null)).otherwise(col("o_totalprice")).as("price"))
      t.agg(
        count(lit(1)).as("n_rows"),
        count(col("pri")).as("n_pri"),
        count(when(col("pri") <=> lit(null), 1)).as("n_null_safe_null"),
        count(when(col("pri") <=> lit("1-URGENT"), 1)).as("n_urgent"),
        round(sum(coalesce(col("price"), lit(0.0))), 2).as("price_nvl"))
    },

    Q("q69_funnel",
      "Funnel analysis: per-user view -> click -> purchase conversion in " +
        "event-time order (first view, first click after it, first " +
        "purchase after that), then per-stage counts. One shuffle on " +
        "user_id; conditional min-aggregates, no self-joins.",
      """WITH m AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_ms(CAST(ts AS TIMESTAMP)) END) AS t_view
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, m.t_view,
        |    min(CASE WHEN event_type = 'click'
        |             AND epoch_ms(CAST(ts AS TIMESTAMP)) >= m.t_view
        |             THEN epoch_ms(CAST(ts AS TIMESTAMP)) END) AS t_click
        |  FROM events e JOIN m ON e.user_id = m.user_id
        |  GROUP BY 1, 2),
        |p AS (
        |  SELECT e.user_id, c.t_view, c.t_click,
        |    min(CASE WHEN event_type = 'purchase'
        |             AND epoch_ms(CAST(ts AS TIMESTAMP)) >= c.t_click
        |             THEN epoch_ms(CAST(ts AS TIMESTAMP)) END) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  GROUP BY 1, 2, 3)
        |SELECT
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(count(t_view) AS BIGINT) AS stage_view,
        |  CAST(count(t_click) AS BIGINT) AS stage_click,
        |  CAST(count(t_purchase) AS BIGINT) AS stage_purchase
        |FROM p""".stripMargin) { (s, d) =>
      // one shuffle: the three stage times stack as whole-partition window
      // aggregates over the same user_id partitioning (each references the
      // previous stage's column), where the naive spelling is three
      // groupBys + two re-joins of the full event table
      val wU = Window.partitionBy("user_id")
      def firstAfter(tpe: String, after: Column) =
        min(when(col("event_type") === tpe && col("ms") >= after, col("ms"))).over(wU)
      ev(s, d).withColumn("ms", expr("ts_ns div 1000000"))
        .withColumn("t_view", min(when(col("event_type") === "view", col("ms"))).over(wU))
        .withColumn("t_click", firstAfter("click", col("t_view")))
        .withColumn("t_purchase", firstAfter("purchase", col("t_click")))
        .groupBy("user_id")
        .agg(first("t_view").as("t_view"), first("t_click").as("t_click"),
             first("t_purchase").as("t_purchase"))
        .agg(
          count(lit(1)).as("n_users"),
          count(col("t_view")).as("stage_view"),
          count(col("t_click")).as("stage_click"),
          count(col("t_purchase")).as("stage_purchase"))
    },

    Q("q70_retention",
      "Cohort retention: users grouped by first-active day, counted per " +
        "day-offset they return. Two aggregates (first-seen, then cohort x " +
        "offset) — the standard retention matrix at any scale.",
      """WITH f AS (
        |  SELECT user_id,
        |    min(CAST(epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS BIGINT)) AS d0
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT DISTINCT e.user_id, f.d0,
        |    CAST(epoch_ms(CAST(ts AS TIMESTAMP)) // 86400000 AS BIGINT) - f.d0 AS offs
        |  FROM events e JOIN f ON e.user_id = f.user_id)
        |SELECT d0 AS cohort_day, offs AS day_offset,
        |  CAST(count(*) AS BIGINT) AS active_users
        |FROM a GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val e = ev(s, d).withColumn("day", expr("(ts_ns div 1000000) div 86400000"))
      val f = e.groupBy("user_id").agg(min("day").as("d0"))
      e.join(f, "user_id")
        .select(col("user_id"), col("d0"), (col("day") - col("d0")).as("offs"))
        .distinct()
        .groupBy(col("d0").as("cohort_day"), col("offs").as("day_offset"))
        .agg(count(lit(1)).as("active_users"))
    },

    Q("q72_posexplode",
      "Ordinal-preserving generator (U3 extension): posexplode keeps each " +
        "element's position — the building block for positional n-gram / " +
        "alignment work that plain explode loses. Bigram reconstruction " +
        "proves the ordinals are real.",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok
        |           FROM documents WHERE doc_id % 50 = 0),
        |e AS (SELECT doc_id, pos, tok[pos + 1] AS term, len(tok) AS n
        |      FROM t CROSS JOIN LATERAL unnest(range(len(tok))) AS u(pos))
        |SELECT doc_id, CAST(pos AS BIGINT) AS pos, term,
        |  CASE WHEN pos + 1 < n THEN term || ' ' ||
        |    (SELECT e2.term FROM e e2 WHERE e2.doc_id = e.doc_id AND e2.pos = e.pos + 1)
        |  END AS bigram
        |FROM e""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d)
        .filter(col("doc_id") % 50 === 0)
        .select(col("doc_id"), split(col("text"), " ").as("tok"))
      t.select(col("doc_id"), size(col("tok")).as("n"),
               posexplode(col("tok")).as(Seq("pos", "term")),
               col("tok"))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("term"),
                when(col("pos") + 1 < col("n"),
                     concat(col("term"), lit(" "),
                            element_at(col("tok"), col("pos") + 2))).as("bigram"))
    },

    Q("q73_like_predicates",
      "Pattern predicates: LIKE prefix/contains (both push to the parquet " +
        "scan as StringStartsWith/StringContains), case-insensitive ILIKE, " +
        "and an RLIKE regex class — counted side by side.",
      """SELECT
        |  CAST(count(*) FILTER (WHERE c_name LIKE 'Customer%') AS BIGINT) AS n_prefix,
        |  CAST(count(*) FILTER (WHERE c_name LIKE '%9%') AS BIGINT) AS n_contains,
        |  CAST(count(*) FILTER (WHERE c_mktsegment ILIKE 'bUiLdInG') AS BIGINT) AS n_ilike,
        |  CAST(count(*) FILTER (WHERE regexp_matches(c_name, '[13579]$')) AS BIGINT) AS n_rlike
        |FROM customer""".stripMargin) { (s, d) =>
      Tables.customer(s, d).agg(
        count(when(col("c_name").like("Customer%"), 1)).as("n_prefix"),
        count(when(col("c_name").like("%9%"), 1)).as("n_contains"),
        count(when(col("c_mktsegment").ilike("bUiLdInG"), 1)).as("n_ilike"),
        count(when(col("c_name").rlike("[13579]$"), 1)).as("n_rlike"))
    },

    Q("q75_outliers",
      "Anomaly detection: per-type z-scores against the type's own " +
        "mean/stddev. The stats come from a groupBy (map-side partial " +
        "aggregation, a handful of output rows) broadcast-joined back onto " +
        "the events, so scoring stays a scan-parallel projection — NOT a " +
        "window partitioned by the ~5 event types, which would funnel " +
        "every row of a type through one task at scale.",
      """WITH z AS (
        |  SELECT event_type, value,
        |    (value - avg(value) OVER (PARTITION BY event_type)) /
        |      stddev_samp(value) OVER (PARTITION BY event_type) AS zscore
        |  FROM events)
        |SELECT event_type,
        |  CAST(count(*) FILTER (WHERE abs(zscore) > 3) AS BIGINT) AS n_outliers,
        |  round(min(zscore), 4) AS min_z, round(max(zscore), 4) AS max_z
        |FROM z GROUP BY event_type""".stripMargin) { (s, d) =>
      val stats = ev(s, d)
        .groupBy("event_type")
        .agg(avg("value").as("mu"), stddev_samp(col("value")).as("sigma"))
      ev(s, d)
        .join(broadcast(stats), "event_type")
        .withColumn("zscore", (col("value") - col("mu")) / col("sigma"))
        .groupBy("event_type")
        .agg(count(when(abs(col("zscore")) > 3, 1)).as("n_outliers"),
             round(min("zscore"), 4).as("min_z"),
             round(max("zscore"), 4).as("max_z"))
    },

    Q("q76_transitions",
      "Sequence analytics: per-user event-type transition counts (the " +
        "first-order Markov matrix of user behavior) via lag over " +
        "event-time order — integer counts, exactly reproducible.",
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_type
        |  FROM events)
        |SELECT prev_type, event_type AS next_type,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM o WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
      ev(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
    },

    Q("q56_sql_grouping_sets",
      "SQL entry path (S5): spark.sql over a registered view, with " +
        "explicit GROUPING SETS (finer-grained than rollup/cube) and " +
        "grouping() null-disambiguation.",
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n, round(sum(l_quantity), 2) AS qty,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin) {
      (s, d) =>
        li(s, d).createOrReplaceTempView("graft_lineitem")
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |  count(*) AS n, round(sum(l_quantity), 2) AS qty,
            |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
            |  CAST(grouping(l_linestatus) AS BIGINT) AS g_status
            |FROM graft_lineitem
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    },

    Q.noOracle("q57_approx_quantiles",
      "Sketch quantiles: approx_percentile (T-digest-style bounded-memory " +
        "estimator) next to the exact interpolated percentiles of q25 — " +
        "the 100 TB path where exact per-group sorts are unaffordable.") {
      (s, d) =>
        ev(s, d).groupBy("event_type").agg(
          approx_percentile(col("value"), lit(0.5), lit(1000)).as("p50_approx"),
          approx_percentile(col("value"), lit(0.99), lit(1000)).as("p99_approx"),
          count(lit(1)).as("n"))
    },

    Q.noOracle("q58_hll_sketch",
      "Mergeable HLL sketches (Apache DataSketches): per-type user sketches " +
        "built once, unioned for the global distinct — the pattern that " +
        "lets rollups reuse partial sketches instead of rescanning.") {
      (s, d) =>
        val perType = ev(s, d).groupBy("event_type")
          .agg(hll_sketch_agg(col("user_id")).as("sk"),
               countDistinct(col("user_id")).as("exact"))
        val global = perType.agg(
          hll_sketch_estimate(hll_union_agg(col("sk"))).as("global_estimate"))
        perType.select(col("event_type"),
                       hll_sketch_estimate(col("sk")).as("estimate"), col("exact"))
          .crossJoin(broadcast(global))
    },

    Q.noOracle("q46_approx_distinct",
      "Sketch aggregates: HLL++ approx_count_distinct next to the exact " +
        "count — the scale path for distincts (exact is oracle-checked in " +
        "q18; the sketch estimate is engine-specific by construction).") {
      (s, d) =>
        // spread (r21): the HLL++/distinct partial aggregates are CPU-bound
        // per-row work off a single-split local scan — project the two
        // needed columns first (guide §2.3) so the spread exchange carries
        // 16 bytes/row. Register maxima are merge-order-independent, so
        // the estimate is partitioning-invariant (output unchanged).
        //
        // r21: exact and sketch run as SEPARATE aggregates joined on the
        // 5-row type key. Mixed together, Catalyst's distinct rewrite
        // groups by (event_type, user_id) first and the HLL++ buffer
        // rides that near-unique key — ~7.5k multi-KB sketch buffers
        // per pass (25 MB through the exchange) merged pairwise, for 5
        // output rows. Split, the sketch aggregate keeps 5 buffers per
        // task and the distinct path shuffles bare 16-byte keys; both
        // sides share the spread exchange (same pruned columns). Values
        // are unchanged: same input set per type on both paths.
        {
          val e = TrainingData.spread(ev(s, d).select("event_type", "user_id"))
          val exact = e.groupBy("event_type").agg(
            countDistinct(col("user_id")).as("exact_users"),
            count(lit(1)).as("n"))
          val approx = e.groupBy("event_type").agg(
            approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
          exact.join(broadcast(approx), "event_type")
            .select(col("event_type"), col("exact_users"),
                    col("approx_users"), col("n"))
        }
    },

    Q("q104_decayed_engagement",
      "Time-decayed per-user engagement: every event contributes " +
        "0.5^(age_weeks) against the corpus's newest event date — the " +
        "recency-weighted activity feature scoring/retention models " +
        "consume (a user with 10 events last week outranks one with 10 " +
        "events last quarter). Scale shape: the anchor date is an " +
        "in-plan 1-row broadcast (q28 pattern), the weight is a " +
        "codegen'd projection, and the rollup is one shuffle on " +
        "high-cardinality user_id with map-side partials. Cross-engine " +
        "fp discipline: age buckets are INTEGER weeks, so every weight " +
        "is an exactly-representable power of two and the sum is " +
        "order-independent — no libm or accumulation-order hazard.",
      """WITH e AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS dt
        |           FROM events),
        |a AS (SELECT max(dt) AS anchor FROM e)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  round(sum(power(0.5, date_diff('day', dt, anchor) // 7)), 6)
        |    AS decayed_score
        |FROM e CROSS JOIN a
        |GROUP BY user_id""".stripMargin) { (s, d) =>
      val e = ev(s, d).select(col("user_id"), to_date(col("ts")).as("dt"))
      val anchor = e.agg(max("dt").as("anchor"))
      e.crossJoin(broadcast(anchor))
        .withColumn("age_weeks", (datediff(col("anchor"), col("dt")) / 7).cast("int"))
        .groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_events"),
             round(sum(pow(lit(0.5), col("age_weeks"))), 6).as("decayed_score"))
    },

    Q("q105_session_windows",
      "Sessionization via the native session_window operator (the same " +
        "gap semantics Streaming.sessionizeStream runs in-stream), " +
        "cross-validated against q24's lag-gap-cumsum spelling by the " +
        "shared DuckDB oracle: a session closes when the NEXT event is " +
        ">= 30 minutes after the last (session_window's end bound is " +
        "exclusive, so the oracle's break predicate is >= on MICROsecond " +
        "diffs — spelling the diff in a coarser unit would disagree on " +
        "exact-boundary gaps). One shuffle on user_id; session assembly " +
        "is Spark's merging aggregate, not a window sort.",
      """WITH g AS (
        |  SELECT user_id, event_id, value, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
        |           - lag(epoch_us(CAST(ts AS TIMESTAMP)))
        |             OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, us, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g)
        |SELECT user_id, min(us) AS start_us, max(us) + 1800000000 AS end_us,
        |  CAST(count(*) AS BIGINT) AS n_events, round(sum(value), 2) AS session_value
        |FROM s GROUP BY user_id, sid""".stripMargin) { (s, d) =>
      ev(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_events"),
             round(sum("value"), 2).as("session_value"))
        .select(col("user_id"),
                unix_micros(col("session_window.start")).as("start_us"),
                unix_micros(col("session_window.end")).as("end_us"),
                col("n_events"), col("session_value"))
    }
  )
}
