package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression tests: the physical plans the scale story
  * depends on must not silently degrade (broadcast joins for bounded
  * dims, TakeOrderedAndProject for top-k, parquet filter pushdown).
  */
class PlanSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q01: predicate and projection reach the parquet scan") {
    val p = plan("q01_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"),
           s"filter not pushed:\n$p")
    assert(!p.contains("l_quantity"), "column pruning lost — reads unneeded columns")
  }

  test("q03/q23: bounded dimension joins broadcast, not shuffle") {
    assert(plan("q03_join_inner_agg").contains("BroadcastHashJoin"))
    assert(plan("q23_dashboard_recent").contains("BroadcastHashJoin"))
    assert(!plan("q23_dashboard_recent").contains("SortMergeJoin"))
  }

  test("q10/q23: global top-k plans TakeOrderedAndProject (no full sort)") {
    assert(plan("q10_topk_global").contains("TakeOrderedAndProject"))
    assert(plan("q23_dashboard_recent").contains("TakeOrderedAndProject"))
  }

  test("q09: latest-per-key is an aggregate with map-side partials, not a window sort") {
    val p = plan("q09_latest_per_key")
    assert(p.contains("max_by") || p.contains("MaxBy") || p.contains("HashAggregate")
             || p.contains("SortAggregate"),
           s"expected aggregate plan:\n$p")
    assert(!p.contains("Window"), s"latest-per-key regressed to a window sort:\n$p")
  }

  test("custom text/vector hash expressions stay inside whole-stage codegen") {
    // A CodegenFallback child splits the stage: its Project prints without
    // the codegen marker. Every line evaluating our expressions must carry
    // the `*(n)` whole-stage prefix.
    // AQE prints unfinalized stages without codegen markers; disable it so
    // the whole plan shows its `*(n)` spans.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for ((q, fn) <- Seq("q35_dedup_minhash_lsh" -> "word_shingles",
                          "q39_dedup_cosine" -> "srp_sig",
                          "q36_simhash_fingerprint" -> "simhash64")) {
        val lines = plan(q).linesIterator
          .filter(l => l.contains(fn + "(") && !l.contains("FileScan")).toSeq
        assert(lines.nonEmpty, s"$q no longer evaluates $fn")
        assert(lines.forall(l => l.contains("*(")),
               s"$fn fell out of whole-stage codegen in $q:\n${lines.mkString("\n")}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q59/q61: hash-split and PII scrub are pure scan projections — zero shuffles") {
    for (q <- Seq("q59_train_split", "q61_pii_scrub", "q77_source_mixing")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles a per-row projection:\n$p")
      assert(!p.contains("Sort"), s"$q sorts needlessly:\n$p")
    }
  }

  test("q69: funnel stages stack on one window partitioning — no joins") {
    val p = plan("q69_funnel")
    assert(!p.contains("Join"), s"funnel regressed to re-joins:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1, s"funnel shuffles more than once:\n$p")
  }

  test("q50: custom top_k_by aggregates partially before the exchange") {
    val p = plan("q50_topk_agg")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(user_id")
    val partialIdx = p.indexOf("partial_top_k_by")
    assert(partialIdx >= 0, s"no partial aggregation:\n$p")
    // plans print top-down: the map-side partial sits BELOW the exchange
    // in the tree, i.e. later in the string
    assert(partialIdx > exchangeIdx,
           "partial top_k_by must run map-side, before the shuffle")
  }
}
