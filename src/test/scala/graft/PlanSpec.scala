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
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
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
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
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

  test("q75: outlier stats are a partial-aggregating groupBy + broadcast join — no window") {
    val p = plan("q75_outliers")
    assert(!p.contains("Window"),
           s"q75 regressed to a low-cardinality window partition:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"stats not broadcast back:\n$p")
  }

  test("q78/q79: no single-partition exchange over raw data; windows see only bounded inputs") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.window.WindowExec
    // AQE wraps the plan in unfinalized stages; disable it so the full
    // physical tree is walkable.
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q78_token_budget", "q79_stratum_budget", "q62_stratified_sample")) {
        val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
        // every single-partition shuffle must carry a bounded row set: its
        // input subtree aggregates (domain-bounded bucket table) or joins
        // against the broadcast candidate filter (budget-bounded rows) —
        // never the raw corpus scan
        p.collect {
          case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 => e
        }.foreach { e =>
          val bounded = e.child.collectFirst {
            case a: BaseAggregateExec => a
            case j: BroadcastHashJoinExec => j
          }
          assert(bounded.isDefined,
                 s"$q: single-partition exchange fed by unbounded data:\n$e")
        }
        // every window's input is pre-pruned the same way — or by a
        // partial WindowGroupLimit (q62's shape since the naive-rank
        // rewrite: each map task ships at most k rows per stratum, so
        // the window sorts k x mapTasks rows, never the corpus)
        p.collect { case w: WindowExec => w }.foreach { w =>
          val bounded = w.child.collectFirst {
            case a: BaseAggregateExec => a
            case j: BroadcastHashJoinExec => j
            case g: org.apache.spark.sql.execution.window
                      .WindowGroupLimitExec => g
          }
          assert(bounded.isDefined,
                 s"$q: window consumes an unpruned scan:\n$w")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("q80/q81/q82: new pipeline ops keep scale-safe shapes") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // q81: the packing window must be PARTITIONED (by hash bucket) —
      // an empty partition spec would be the q78-style global
      // single-partition sort over the raw corpus
      val p81 = SparkEntry.queries("q81_pack_sequences")(spark, sf)
        .queryExecution.executedPlan
      val wins = p81.collect { case w: WindowExec => w }
      assert(wins.nonEmpty)
      wins.foreach(w => assert(w.partitionSpec.nonEmpty,
        s"q81 packing window is unpartitioned:\n$w"))
      // q80/q82: no single-partition shuffle anywhere except a broadcast
      // build or final tiny aggregate fed by an aggregate
      for (q <- Seq("q80_decontaminate", "q82_unigram_logprob")) {
        val p = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan
        p.collect {
          case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 => e
        }.foreach { e =>
          val agg = e.child.collectFirst {
            case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
          }
          assert(agg.isDefined,
                 s"$q: single-partition exchange over unaggregated data:\n$e")
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("q85-q88: round-5 ops keep scale-safe shapes") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // q87: PPS sampling is a pure scan projection — zero shuffles, no sort
      val p87 = plan("q87_weighted_sample")
      assert(!p87.contains("Exchange"), s"q87 shuffles a per-row decision:\n$p87")
      assert(!p87.contains("Sort"), s"q87 sorts needlessly:\n$p87")
      // q88: no window over doc-level rows — the only window input is the
      // aggregated (bounded) value table; docs come back via broadcast join
      val p88 = SparkEntry.queries("q88_quality_deciles")(spark, sf)
        .queryExecution.executedPlan
      val wins88 = p88.collect { case w: WindowExec => w }
      assert(wins88.nonEmpty)
      wins88.foreach { w =>
        assert(w.child.collectFirst { case a: BaseAggregateExec => a }.isDefined,
               s"q88 window consumes unaggregated doc rows:\n$w")
      }
      assert(p88.toString.contains("BroadcastHashJoin"),
             "q88 docs must rejoin the value table by broadcast")
      // q85: the pair generation is an equi-join on the fingerprint —
      // never a nested-loop/cartesian pair scan
      val p85 = plan("q85_winnowing_overlap")
      assert(!p85.contains("CartesianProduct") &&
               !p85.contains("BroadcastNestedLoopJoin"),
             s"q85 pair generation degenerated to a cross product:\n$p85")
      // q86: term filter applies before the first aggregate's exchange
      // (scan-parallel pre-filter), and (doc_id, term) counts are partial
      val p86 = plan("q86_keyword_search")
      val partialIdx = p86.indexOf("partial_count")
      val exchangeIdx = p86.indexOf("Exchange hashpartitioning")
      assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
             s"q86 must partially aggregate map-side before its shuffle:\n$p86")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("q98-q100: round-6 ops keep scale-safe shapes") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // q98: top-20 is TakeOrderedAndProject (never a global sort), and the
      // term IN prune runs scan-side — partial (doc, term) counts sit below
      // their exchange exactly like q86
      val p98 = plan("q98_bm25_rank")
      assert(p98.contains("TakeOrderedAndProject"),
             s"q98 top-k degenerated to a global sort:\n$p98")
      val partialIdx = p98.indexOf("partial_count")
      val exchangeIdx = p98.indexOf("Exchange hashpartitioning")
      assert(partialIdx >= 0 && exchangeIdx >= 0 && partialIdx > exchangeIdx,
             s"q98 must partially aggregate map-side before its shuffle:\n$p98")
      // q99: same contract as q88 — windows only ever consume the bounded
      // aggregated value table, docs rejoin by broadcast
      val p99 = SparkEntry.queries("q99_grouped_deciles")(spark, sf)
        .queryExecution.executedPlan
      val wins99 = p99.collect { case w: WindowExec => w }
      assert(wins99.nonEmpty)
      wins99.foreach { w =>
        assert(w.child.collectFirst { case a: BaseAggregateExec => a }.isDefined,
               s"q99 window consumes unaggregated doc rows:\n$w")
      }
      assert(p99.toString.contains("BroadcastHashJoin"),
             "q99 docs must rejoin the value table by broadcast")
      // q100: window-bounded pair generation is a pure array-HOF
      // projection (linear in doc length — no doc_id self-join anywhere);
      // the df-band prefilter and the bounded pair table broadcast, and
      // the only nested-loop allowed is the 1-row token-total scalar
      val p100 = plan("q100_pmi_collocations")
      assert(!p100.contains("CartesianProduct"),
             s"q100 pair generation degenerated to a cross product:\n$p100")
      assert(!p100.contains("SortMergeJoin"),
             s"q100 must not shuffle-join (band/pair tables broadcast):\n$p100")
      assert(p100.contains("BroadcastHashJoin"),
             s"q100 band/marginal joins must broadcast:\n$p100")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("q101/q102/q104: round-6 ops keep scale-safe shapes") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // q101: source attachment is equi-joins on the doc-id keys plus the
      // final aggregate — no cross product anywhere
      val p101 = plan("q101_source_overlap")
      assert(!p101.contains("CartesianProduct"),
             s"q101 must stay equi-join shaped:\n$p101")
      val partial101 = p101.indexOf("partial_count")
      val exch101 = p101.indexOf("Exchange hashpartitioning")
      assert(partial101 >= 0 && exch101 >= 0 && partial101 > exch101,
             s"q101 matrix aggregate must combine map-side:\n$p101")
      // q102: query set broadcasts against the corpus scan, and the
      // within-list pair join stays an equi-join on qid
      val p102 = plan("q102_topk_diversity")
      assert(p102.contains("BroadcastNestedLoopJoin") ||
               p102.contains("BroadcastHashJoin"),
             s"q102 query set must broadcast:\n$p102")
      assert(!p102.contains("CartesianProduct"),
             s"q102 pair join degenerated to a cross product:\n$p102")
      // q104: the anchor date is a 1-row broadcast (q28 pattern), the
      // weight projection is codegen'd, and the user rollup partially
      // aggregates before its exchange
      val p104 = plan("q104_decayed_engagement")
      assert(p104.contains("BroadcastNestedLoopJoin"),
             s"q104 anchor must ride as a broadcast scalar:\n$p104")
      val partial104 = p104.indexOf("partial_count")
      val exch104 = p104.indexOf("Exchange hashpartitioning")
      assert(partial104 >= 0 && exch104 >= 0 && partial104 > exch104,
             s"q104 user rollup must combine map-side:\n$p104")
      // executedPlan.toString marks codegen stages with "*(n)"; the weight
      // projection (POWER over the age bucket) must carry the marker
      val weightLine = p104.linesIterator
        .find(l => l.contains("Project") && l.contains("age_weeks"))
      assert(weightLine.exists(_.contains("*(")),
             s"q104 weight math must stay inside codegen:\n$p104")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("q40/q102: per-qid top-k keeps a partial WindowGroupLimit below the shuffle") {
    // Spark 4 plans `row_number() <= k` as a pair of WindowGroupLimit
    // nodes — a map-side Partial BELOW the qid exchange and a Final above
    // it — so each input partition forwards at most k rows per qid into
    // the shuffle. qid is low-cardinality by construction, so losing the
    // partial (e.g. by filtering on a derived rank column Catalyst can't
    // see through) silently degrades to a full per-qid sort of the whole
    // candidate set. Pin it for the per-qid top-k family (q40, q41, q54,
    // q102, q103 candidate gen — q40/q102 stand in for the shared shape).
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (q <- Seq("q40_ann_brute", "q102_topk_diversity")) {
        val lines = plan(q).linesIterator.toSeq
        val limits = lines.zipWithIndex.collect {
          case (l, i) if l.contains("WindowGroupLimit") => i
        }
        assert(limits.length >= 2,
               s"$q lost the WindowGroupLimit rank-limit pattern:\n${lines.mkString("\n")}")
        val exch = lines.indexWhere(l =>
          l.contains("Exchange hashpartitioning(qid"))
        assert(exch >= 0, s"$q window exchange not found:\n${lines.mkString("\n")}")
        // plans print top-down: the map-side partial sits BELOW the
        // exchange in the tree, i.e. later in the string
        assert(limits.last > exch,
               s"$q partial WindowGroupLimit must run map-side, before the shuffle:\n${lines.mkString("\n")}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("q127/q128: phrase join prunes terms pre-shuffle; top-256 plans ordered heaps") {
    // q127: the phrase terms' IN filter must run scan-side, beneath the
    // (doc_id, pos) join — a post-join filter would shuffle every
    // position of every document
    val p127 = plan("q127_phrase_search")
    val lines127 = p127.linesIterator.toSeq
    val joinIdx = lines127.indexWhere(l => l.contains("SortMergeJoin") ||
                                           l.contains("ShuffledHashJoin") ||
                                           l.contains("BroadcastHashJoin"))
    val termFilterIdx = lines127.indexWhere(l =>
      l.contains("Filter") && l.contains("table") && l.contains("hash"))
    assert(joinIdx >= 0 && termFilterIdx > joinIdx,
           s"q127 term filter must prune beneath the position join:\n$p127")
    assert(!p127.contains("CartesianProduct"),
           s"q127 must stay an equi-join on (doc_id, pos):\n$p127")
    // q128: the top-256 must plan as TakeOrderedAndProject (per-partition
    // heaps), never a full vocabulary sort
    val p128 = plan("q128_vocab_coverage")
    assert(p128.contains("TakeOrderedAndProject"),
           s"q128 top-256 lost the ordered-heap plan:\n$p128")
  }

  test("q90: bloom prune runs as an in-plan scalar subquery before the exact join") {
    val p = plan("q90_bloom_decontaminate")
    assert(p.contains("might_contain"), s"bloom probe missing from plan:\n$p")
    assert(p.contains("Subquery") || p.contains("subquery"),
           s"bloom must be an in-plan subquery, not a driver-collected literal:\n$p")
    assert(p.contains("bloom_filter_agg") || p.contains("BloomFilter"),
           s"bloom build must be the native distributed aggregate:\n$p")
    // the prune is a Filter on the probe side BELOW the join: the
    // might_contain predicate must not sit above any join operator
    val lines = p.linesIterator.toSeq
    val probeIdx = lines.indexWhere(_.contains("might_contain"))
    val joinIdx = lines.indexWhere(l => l.contains("SortMergeJoin") ||
                                        l.contains("ShuffledHashJoin") ||
                                        l.contains("BroadcastHashJoin"))
    assert(probeIdx >= 0 && joinIdx >= 0 && probeIdx > joinIdx,
           "might_contain must filter the probe side beneath the exact join")
    // and q90 must agree with q80 row-for-row (bloom is output-invariant)
    val a = SparkEntry.queries("q80_decontaminate")(spark, sf)
      .orderBy("doc_id").collect().map(_.toString)
    val b = SparkEntry.queries("q90_bloom_decontaminate")(spark, sf)
      .orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b), "bloom-pruned output diverged from q80")
  }

  test("q108/q109/q112/q113: round-7 prep ops keep scale-safe shapes") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // q108: two-phase packing (r8). A window partitioned solely by
      // low-cardinality `source` over raw documents funnels each source
      // through ONE task — the q62 hazard. Pin: every Window whose
      // partition spec is [source] alone runs over the BUCKET-SUBTOTAL
      // table (its frame sums bucket_tokens), the per-doc running sum
      // windows by (source, bkt), and the doc side reuses the join's
      // (source, bkt) partitioning — no Exchange between the SMJ and the
      // doc-side Window. The corpus/width-sized offsets table must
      // never broadcast (the q112 hazard).
      val p108 = plan("q108_sequence_pack")
      val lines108 = p108.linesIterator.toSeq
      // the doc-side window is windowspecdefinition(source, bkt, doc_id
      // ASC ...); a source-solo spec never mentions doc_id in its line
      val soloSourceWins = lines108.filter(l =>
        l.contains("Window") && l.contains("windowspecdefinition(source#") &&
          !l.contains("doc_id#"))
      assert(soloSourceWins.nonEmpty && soloSourceWins.forall(_.contains("bucket_tokens")),
             s"q108: a source-solo window left the bounded bucket table:\n$p108")
      val docWinIdx = lines108.indexWhere(l =>
        l.contains("Window") && l.contains("bkt#") &&
          l.contains("doc_id#") && l.contains("sum(n_tok#"))
      assert(docWinIdx >= 0,
             s"q108 per-doc window must partition by (source, bkt):\n$p108")
      val smjIdx = lines108.indexWhere(_.contains("SortMergeJoin"))
      assert(smjIdx > docWinIdx,
             s"q108 offsets join must sit beneath the per-doc window:\n$p108")
      assert(!lines108.slice(docWinIdx, smjIdx).exists(_.contains("Exchange")),
             s"q108 per-doc window must reuse the join's (source, bkt) partitioning:\n$p108")
      assert(!p108.contains("BroadcastHashJoin"),
             s"q108 offsets table scales with corpus/width and must not broadcast:\n$p108")
      // q109/q113: pure per-row projections — chunk generation and PII
      // redaction must not shuffle at all (spread()'s round-robin rebalance
      // is not a hash shuffle and carries no per-key state)
      for (q <- Seq("q109_doc_chunks", "q113_pii_redact")) {
        val p = plan(q)
        assert(!p.contains("Exchange hashpartitioning"),
               s"$q is per-row work and must not hash-shuffle:\n$p")
      }
      // q111's deflate scalar must stay inside whole-stage codegen
      val p111 = plan("q111_compress_quality")
      val defLine = p111.linesIterator
        .filter(l => l.contains("deflate_ratio(") && !l.contains("FileScan")).toSeq
      assert(defLine.nonEmpty && defLine.forall(_.contains("*(")),
             s"deflate_ratio fell out of codegen:\n$p111")
      // q112: only the 1-row corpus total broadcasts; the vocabulary-sized
      // (term) marginal join must stay a shuffle join, never a broadcast.
      // The registry query serves the persisted source_stats artifact —
      // audit the derivation plan the one build pass runs
      val p112 = graft.operators.Prep.sourceStatsPlan(spark, sf)
        .queryExecution.executedPlan.toString
      assert(p112.contains("BroadcastNestedLoopJoin"),
             s"q112 total must ride as a broadcast scalar:\n$p112")
      val termBroadcast = p112.linesIterator.filter(l =>
        l.contains("BroadcastHashJoin") && l.contains("term"))
      assert(termBroadcast.isEmpty,
             s"q112 vocabulary marginal must not broadcast:\n${termBroadcast.mkString("\n")}")
      // q124: same hazard, windowed — the corpus reference join is
      // vocabulary-sized and must stay on the shuffle path; only the
      // 1-row (n, v) scalar table broadcasts
      val p124 = plan("q124_source_drift_windows")
      assert(p124.contains("BroadcastNestedLoopJoin"),
             s"q124 corpus scalars must ride as a broadcast:\n$p124")
      val refBroadcast = p124.linesIterator.filter(l =>
        l.contains("BroadcastHashJoin") && l.contains("term"))
      assert(refBroadcast.isEmpty,
             s"q124 corpus reference must not broadcast:\n${refBroadcast.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("q82: unigram table joins on the shuffle path — vocabulary never broadcast") {
    // the q112/q119 rule: the corpus unigram (term, c) table scales with
    // open-web vocabulary and must NEVER broadcast; only the 1-row token
    // total rides as a broadcast scalar. The static planner would happily
    // broadcast it at toy scale, so pin with AQE off.
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = plan("q82_unigram_logprob")
      val termBroadcast = p.linesIterator.filter(l =>
        l.contains("BroadcastHashJoin") && l.contains("term"))
      assert(termBroadcast.isEmpty,
             s"q82 unigram table must not broadcast:\n${termBroadcast.mkString("\n")}")
      assert(p.contains("ShuffledHashJoin"),
             s"q82 unigram join must be a shuffled hash join:\n$p")
      assert(p.contains("BroadcastNestedLoopJoin"),
             s"q82 corpus total must ride as a broadcast scalar:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
  }

  test("q110/q112: AQE computes the corpus statistics pass once and reuses it") {
    // the (source, term) / (a, b) count tables feed several aggregates
    // and the final join; without stage reuse each consumer re-tokenizes
    // the corpus. The branches are written so their subtrees canonicalize
    // identically (explicit isNotNull matching the join constraint,
    // derivations instead of fresh corpus passes) and AQE then runs the
    // heavy exchange once. This pins the ReusedExchange, which disappears
    // if a branch's filters/projections drift out of canonical equality.
    // q112/q125/q136/q149 serve the persisted source_stats artifact —
    // audit the DERIVATION plan, which is what the one build pass runs
    val df112 = graft.operators.Prep.sourceStatsPlan(spark, sf)
    df112.collect()
    val p112 = df112.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(p112).length >= 3,
           s"source-stats build stopped reusing the corpus statistics stage:\n$p112")
    // q110's registry query may serve the per-doc scores from the
    // persisted DerivedCache artifact — audit the derivation plan,
    // which is what the one build pass actually executes
    val df110 = graft.operators.Prep.bigramNllPlan(spark, sf)
    df110.collect()
    val p110 = df110.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(p110).nonEmpty,
           s"q110 stopped reusing the bigram-count stage:\n$p110")
    // q55: the df branch must keep the probe's partial_count shape (the
    // no-op tf > 0 pin) — a DISTINCT rewrite silently doubles the
    // corpus tokenize pass
    val df55 = SparkEntry.queries("q55_tfidf")(spark, sf)
    df55.collect()
    val p55 = df55.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(p55).nonEmpty,
           s"q55 stopped reusing the tokenize+count stage:\n$p55")
    // q117: the (doc, bucket) count table feeds both the bucket-stats
    // branch and the probe join, and the bucket stats feed both the
    // score table and the totals — TWO reused exchanges, so the corpus
    // tokenizes once and the bucket table aggregates once
    val df117 = SparkEntry.queries("q117_dsir_select")(spark, sf)
    df117.collect()
    val p117 = df117.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(p117).length >= 2,
           s"q117 stopped reusing the tokenize/bucket-stats stages:\n$p117")
    // q121: both sides of the dHash band self-join are the same
    // decode -> dhash -> band subtree forced onto the shuffle path, so
    // AQE must run the (expensive) codec pipeline ONCE and reuse its
    // exchange — a broadcast or canonicalization drift would decode the
    // image corpus twice
    val df121 = SparkEntry.queries("q121_image_neardup")(spark, sf)
    df121.collect()
    val p121 = df121.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(p121).nonEmpty,
           s"q121 stopped reusing the decode/band stage:\n$p121")
    // q119: the (doc, gram) events are per-doc distinct IN-ARRAY (no
    // distinct exchange — r20), and the one ngram exchange feeds both
    // the first-doc aggregate and the probe join — one tokenize pass;
    // the vocabulary-sized first-doc table must NEVER broadcast (q112's
    // OOM-at-scale hazard — the static planner picks it at toy scale)
    val df119 = SparkEntry.queries("q119_novelty_curve")(spark, sf)
    df119.collect()
    val p119 = df119.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(p119).nonEmpty,
           s"q119 stopped reusing the trigram-event exchange:\n$p119")
    val gramBroadcast = p119.linesIterator.filter(l =>
      l.contains("BroadcastHashJoin") && l.contains("first_doc"))
    assert(gramBroadcast.isEmpty,
           s"q119 first-doc table must not broadcast:\n${gramBroadcast.mkString("\n")}")
    // q83: the distinct (doc_id, ngram-hash) exchange feeds THREE
    // consumers (shared-gram agg, probe join, per-doc totals). The base
    // isNotNulls keep all three on one canonical subtree; without them
    // the final left join's inferred isnotnull(doc_id) forks the probe
    // branch and AQE silently re-tokenizes the corpus. Pin: exactly ONE
    // Generate (gram explode) and >= 2 ReusedExchange in the FINAL plan.
    val df83 = SparkEntry.queries("q83_boilerplate_share")(spark, sf)
    df83.collect()
    val p83 = df83.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Generate".r.findAllIn(p83).length === 1,
           s"q83 gram generation must run once:\n$p83")
    assert("ReusedExchange".r.findAllIn(p83).length >= 2,
           s"q83 stopped reusing the distinct-gram stage:\n$p83")
    // q154: the corpus-sized coordinate explode (n_docs x dims rows)
    // feeds the per-source centroid aggregate; the GLOBAL centroid is
    // DERIVED from the bounded per-source table (gx = sum over sources
    // of sx), so the final plan must hold exactly ONE Generate and the
    // bys exchange must be reused between the gl derivation and the
    // join — a second Generate means someone re-aggregated the corpus
    val df154 = SparkEntry.queries("q154_embedding_drift")(spark, sf)
    df154.collect()
    val p154 = df154.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Generate".r.findAllIn(p154).length === 1,
           s"q154 coordinate explode must run once:\n$p154")
    assert("ReusedExchange".r.findAllIn(p154).nonEmpty,
           s"q154 stopped reusing the per-source centroid stage:\n$p154")
  }

  test("q155/q156/q157: round-13 audit family keeps scale-safe shapes") {
    // q155: the (source, bin) count table feeds four consumers (totals,
    // corpus bins, grid, cum) — AQE must run its exchange ONCE so the
    // documents scan executes once; the windows run over the bounded
    // bin grid only
    val df155 = SparkEntry.queries("q155_length_ks_drift")(spark, sf)
    df155.collect()
    val p155 = df155.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(p155).length === 1,
           s"q155 must scan documents exactly once:\n$p155")
    assert("ReusedExchange".r.findAllIn(p155).nonEmpty,
           s"q155 stopped reusing the (source, bin) count stage:\n$p155")
    // q156: warm path serves the persisted cluster-label artifact — a
    // parquet scan joined to token counts; the pair graph must NOT be
    // rebuilt (its tokenize would show as array_distinct+xxhash64
    // projections in the plan)
    graft.operators.Curation.dedupClusters(spark, sf).count() // land artifact
    val p156 = plan("q156_dedup_yield")
    assert(!p156.contains("xxhash64"),
           s"q156 must serve the cluster artifact, not re-resolve:\n$p156")
    // q157: exactly ONE coordinate explode (the centroid pass);
    // scoring is a broadcast join + per-row fold — the corpus-sized
    // table never hits a join shuffle
    val df157 = SparkEntry.queries("q157_semantic_outliers")(spark, sf)
    df157.collect()
    val p157 = df157.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Generate".r.findAllIn(p157).length === 1,
           s"q157 coordinate explode must run once:\n$p157")
    assert(p157.contains("BroadcastHashJoin"),
           s"q157 centroid arrays must broadcast:\n$p157")
    // q159: the bounded held-out side broadcasts into the one train
    // scan — the audit must never plan a shuffled cartesian
    val p159 = plan("q159_embedding_leakage")
    assert(p159.contains("BroadcastNestedLoopJoin"),
           s"q159 held-out side must broadcast:\n$p159")
    assert(!p159.contains("CartesianProduct"),
           s"q159 planned a shuffled cartesian:\n$p159")
  }

  test("q161/q162: NB reports serve the landed nb_scores_v1; the build keeps its one-pass shape") {
    // Round 15: the per-doc NB score table persists (the funnel_stack
    // precedent). Warm reports are bounded rollups over one narrow
    // artifact scan; the BUILD keeps the round-14 pins — the
    // (doc, term, count) table cdc feeds both the class-count
    // derivation and the scoring probe via ONE reused exchange, the
    // vocabulary-bounded LLR table joins shuffle_hash (no-broadcast
    // vocabulary rule), only the 1-row totals/prior broadcast.
    graft.operators.Prep.nbScores(spark, sf).count() // land artifact
    for (q <- Seq("q161_nb_distill", "q162_nb_calibration",
                  "q169_nb_threshold_sweep")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert("Scan parquet".r.findAllIn(p).length === 1,
             s"$q must plan exactly one artifact scan:\n$p")
      assert(!p.contains("documents.parquet"),
             s"$q re-trained the NB model from the corpus:\n$p")
      assert(!p.contains("explode(split("),
             s"$q must not tokenize (artifact serves scores):\n$p")
      assert(!p.contains("Window"),
             s"$q must not plan a window (bounded aggregates only):\n$p")
    }
    val build = graft.operators.Prep.nbScoresPlan(spark, sf)
    build.collect()
    val pb = build.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(pb).length === 1,
           s"nbScoresPlan must scan documents exactly once:\n$pb")
    assert("ReusedExchange".r.findAllIn(pb).nonEmpty,
           s"nbScoresPlan stopped reusing the tokenize+count stage:\n$pb")
    assert(pb.contains("ShuffledHashJoin"),
           s"nbScoresPlan LLR probe must stay shuffle_hash:\n$pb")
    assert(!pb.contains("SortMergeJoin"),
           s"nbScoresPlan LLR probe regressed to sort-merge:\n$pb")
    assert(!pb.contains("Window"),
           s"nbScoresPlan must not plan a window:\n$pb")
  }

  test("q163-q167: funnel family serves the landed funnel_stack_v1 — zero corpus work") {
    // Round 15: the per-doc gate table is a persisted DerivedCache
    // artifact. The regressions this pins: (a) r14's q167 fork — the
    // pruned per-source weight rollup fell out of canonical equality
    // with the keep-filter probe and the corpus tokenized TWICE; (b)
    // any consumer silently re-deriving the funnel inline (a Generate
    // or a documents scan in a warm plan = a whole corpus pass per
    // query at 100 TB).
    graft.operators.Prep.funnelStack(spark, sf).count() // land artifact
    val derives = graft.operators.Prep.funnelDerives.get()
    val expectScans = Seq(
      "q163_filter_stack" -> 1, "q164_filter_funnel" -> 1,
      "q165_funnel_mixture_shift" -> 1, "q166_funnel_ablation" -> 1,
      // bounded rate rollup + keep-filtered membership probe, both
      // column-pruned scans of the narrow artifact (the rollup
      // broadcasts into the probe; a per-source window over per-doc
      // rows would single-partition the corpus instead)
      "q167_funnel_resample" -> 2,
      // the verification audit spells its pre/kept rollup EXACTLY as
      // resampleRates' (same aggregate, same casts), so the two
      // subtrees are canonically equal and the planner serves both
      // from ONE scan+exchange — the rollup scan plus q167's
      // keep-filtered probe
      "q168_resample_audit" -> 2,
      // one bounded aggregate + a 10-element literal unpivot
      "q170_funnel_overlap" -> 1)
    for ((q, n) <- expectScans) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert("Scan parquet".r.findAllIn(p).length === n,
             s"$q must plan exactly $n artifact scans:\n$p")
      assert(!p.contains("documents.parquet"),
             s"$q re-derived the funnel from the corpus:\n$p")
      // q166's bounded 4-element literal unpivot is a Generate too —
      // the tokenize signature is specifically an explode over split()
      assert(!p.contains("explode(split("),
             s"$q must not tokenize (artifact serves scores):\n$p")
    }
    assert(graft.operators.Prep.funnelDerives.get() === derives,
           "a warm funnel consumer re-derived funnel_stack_v1")
    val p167 = {
      val df = SparkEntry.queries("q167_funnel_resample")(spark, sf)
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    assert(p167.contains("BroadcastHashJoin"),
           s"q167's bounded rate rollup must broadcast:\n$p167")
  }

  test("funnel_stack build: one rescore pass over documents, layers from artifacts") {
    // the artifact BUILD must pay exactly ONE corpus pass (tokenize +
    // probe join against the combined vocabulary-bounded score table)
    // — the model layers come from the landed append-incremental
    // artifacts, never a second tokenize-for-counting pass — and the
    // one-pass audit plan (filterStack) keeps its shared-exchange
    // shape as the from-first-principles cross-check
    graft.operators.Prep.nbClassCounts(spark, sf).count()
    graft.operators.Prep.sourceTermCounts(spark, sf).count()
    val build = graft.operators.Prep.funnelStackFromLayers(spark, sf)
    build.collect()
    val pb = build.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("documents.parquet".r.findAllIn(pb).length === 1,
           s"build must scan documents exactly once:\n$pb")
    assert("Generate".r.findAllIn(pb).length === 1,
           s"build must tokenize exactly once:\n$pb")
    assert(pb.contains("ShuffledHashJoin"),
           s"build's vocabulary probe must stay shuffle_hash:\n$pb")
    assert(!pb.contains("SortMergeJoin"),
           s"build's vocabulary probe regressed to sort-merge:\n$pb")

    val audit = graft.operators.Prep.filterStack(spark, sf)
    audit.collect()
    val pa = audit.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(pa).length === 1,
           s"filterStack must scan documents exactly once:\n$pa")
    assert("ReusedExchange".r.findAllIn(pa).nonEmpty,
           s"filterStack stopped sharing the tokenize+count stage:\n$pa")
    assert(!pa.contains("SortMergeJoin"),
           s"filterStack vocabulary probe regressed to sort-merge:\n$pa")
  }

  test("r14 scan audit: q62/q126/q143/q158 keep their deduped scan counts") {
    // Round-14 final-plan sweep (Explain -exec over the registry) found
    // four queries whose consumers forked off their shared subtree —
    // pruned-aggregate collapse, inferred-isnotnull scan filters, and a
    // hand-rolled pruning harness. Pin the repaired counts: a regression
    // here is a whole extra corpus pass at 100 TB.
    val expect = Seq(
      // one text scan; map-side WindowGroupLimit bounds the stratum sort
      "q62_stratified_sample" -> 1,
      // corpus scan + broadcast query-batch scan, both sides of ONE pass
      "q126_contrastive_mining" -> 2,
      // documents + the persisted per-doc nll artifact, each once
      "q143_ccnet_buckets" -> 2,
      // one counting pass; grid/ref/probe/tot all reuse its exchange
      "q158_window_length_drift" -> 1)
    for ((q, n) <- expect) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert("Scan parquet".r.findAllIn(p).length === n,
             s"$q must plan exactly $n scans:\n$p")
    }
    for (q <- Seq("q62_stratified_sample", "q126_contrastive_mining")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p.contains("WindowGroupLimit"),
             s"$q lost its map-side per-group rank prune:\n$p")
    }
  }

  test("q130: one gram pass — no join, no broadcast, exactly two exchanges") {
    val p = plan("q130_substring_dedup")
    // the naive spelling runs tokenize+slice+md5 twice (count subtree +
    // occurrence subtree) and broadcasts an unbounded dup-digest set;
    // the window-over-digest shape must keep ONE Generate and ZERO joins
    assert("Generate".r.findAllIn(p).length === 1,
           s"q130 gram generation must run once:\n$p")
    assert(!p.contains("Join"), s"q130 must not join:\n$p")
    assert(!p.contains("BroadcastExchange"),
           s"q130 must not broadcast (dup-digest set is unbounded):\n$p")
  }

  test("q134: one gram pass, span join shuffled — never broadcast") {
    val p = plan("q134_substring_dedup_apply")
    assert("Generate".r.findAllIn(p).length === 1,
           s"q134 gram generation must run once:\n$p")
    assert(p.contains("ShuffledHashJoin"),
           s"q134 span join must be a shuffled hash join:\n$p")
    assert(!p.contains("BroadcastExchange"),
           s"q134 must not broadcast the corpus-row-sized span table:\n$p")
  }

  test("q137: vocab join shuffles (never broadcast), corpus tokenizes once") {
    // the word->ids table is vocabulary-sized — an open-web vocabulary
    // must never plan broadcast (the q112/q119 OOM-at-scale hazard); the
    // shuffle_hash hint forces it onto the shuffle path, and AQE must not
    // override it at toy scale
    val df = SparkEntry.queries("q137_packed_token_ids")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val wJoins = p.linesIterator.filter(l =>
      l.contains("HashJoin [w#")).toSeq
    assert(wJoins.nonEmpty, s"q137 lost its word->ids join:\n$p")
    assert(wJoins.forall(_.contains("ShuffledHashJoin")),
           s"q137 vocab join must never broadcast:\n${wJoins.mkString("\n")}")
    // single-tokenize-pass: the packing chain explodes tokens a bounded
    // number of times and scans the corpus a bounded number of times in
    // the FINAL adaptive plan (regression = a branch falling out of
    // canonical equality and re-tokenizing; the q122 38->20 lesson)
    assert("Generate ".r.findAllIn(p).length <= 4,
           s"q137 grew an extra tokenize/explode pass:\n$p")
    // 6 = the 5 corpus scans of the r8 rework + the (tiny, per-doc)
    // persisted cluster-label artifact the curate branch now reads from
    // DerivedCache instead of re-resolving in memory
    assert("FileScan parquet".r.findAllIn(p).length <= 6,
           s"q137 grew an extra corpus scan:\n$p")
  }

  test("q138: broadcasts only group-bounded per-window tables; term join shuffles") {
    // per-window weight totals are bounded by the (window, source) group
    // count — the RIGHT side to broadcast; the (window, term) vocabulary
    // table is NOT bounded and must stay on the shuffle path. The
    // registry query may serve its stats from the persisted DerivedCache
    // artifact, so audit the DERIVATION plan the one build pass runs
    val df = graft.operators.Prep.epochPlanCore(
      graft.operators.Prep.windowedPlanStatsPlan(spark, sf),
      groupCols = Seq("win_ms"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val termBroadcast = p.linesIterator.filter(l =>
      l.contains("BroadcastHashJoin") && l.contains("term#")).toSeq
    assert(termBroadcast.isEmpty,
           s"q138 term join must never broadcast:\n${termBroadcast.mkString("\n")}")
    assert(p.linesIterator.exists(l =>
             l.contains("ShuffledHashJoin") && l.contains("term#")),
           s"q138 lost its shuffled term join:\n$p")
    val broadcasts = p.linesIterator
      .filter(_.contains("BroadcastHashJoin")).toSeq
    assert(broadcasts.nonEmpty, s"q138 lost its weight-total broadcasts:\n$p")
    assert(broadcasts.forall(_.contains("win_ms#")),
           "q138 must broadcast only window-keyed (group-bounded) tables:\n" +
             broadcasts.mkString("\n"))
  }

  test("q139: only the source-bounded plan broadcasts; no corpus-sized build side") {
    // the plan table is sources-rows tiny — broadcasting it is correct;
    // nothing doc-keyed may ever build a broadcast side (the sampling
    // pass must stay scan-parallel at any corpus size). Audit the
    // sampling DERIVATION — the registry query may serve the sampled
    // stream from the persisted epoch_sample artifact
    val df = graft.operators.Prep.epochSampledDocsPlan(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val docBroadcast = p.linesIterator.filter(l =>
      l.contains("BroadcastHashJoin") && l.contains("doc_id#")).toSeq
    assert(docBroadcast.isEmpty,
           s"q139 must never broadcast a doc-keyed side:\n${docBroadcast.mkString("\n")}")
    assert(p.linesIterator.exists(l =>
             l.contains("BroadcastHashJoin") && l.contains("source#")),
           s"q139 lost its broadcast plan join:\n$p")
  }

  test("q140: vocab join shuffles (never broadcast)") {
    // same hazard class as q137: the word->ids table is vocabulary-sized
    val df = SparkEntry.queries("q140_tokenized_docs")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val wJoins = p.linesIterator.filter(l => l.contains("HashJoin [w#")).toSeq
    assert(wJoins.nonEmpty, s"q140 lost its word->ids join:\n$p")
    assert(wJoins.forall(_.contains("ShuffledHashJoin")),
           s"q140 vocab join must never broadcast:\n${wJoins.mkString("\n")}")
  }

  test("q141: broadcasts only window-keyed tables; term join shuffles") {
    // q138's pin extended to the executor: plan/weight tables are
    // (windows x sources)-bounded — broadcast is right; the windowed
    // term table is vocabulary-sized and must stay on the shuffle path
    val df = SparkEntry.queries("q141_windowed_plan_execute")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val termBroadcast = p.linesIterator.filter(l =>
      l.contains("BroadcastHashJoin") && l.contains("term#")).toSeq
    assert(termBroadcast.isEmpty,
           s"q141 term join must never broadcast:\n${termBroadcast.mkString("\n")}")
    val broadcasts = p.linesIterator
      .filter(_.contains("BroadcastHashJoin")).toSeq
    assert(broadcasts.nonEmpty, s"q141 lost its plan broadcasts:\n$p")
    assert(broadcasts.forall(_.contains("win_ms#")),
           "q141 must broadcast only window-keyed (group-bounded) tables:\n" +
             broadcasts.mkString("\n"))
  }

  test("q110/q143: bigram count tables join on the shuffle path, never broadcast") {
    // cab/ca are corpus-statistic-sized (vocabulary² on the open web) —
    // the same hazard class as the q82/q112 vocabulary tables. The
    // registry queries may serve the per-doc scores from the persisted
    // DerivedCache artifact (a plain parquet scan), so audit the
    // DERIVATION plan — what the one build pass actually runs
    val df = graft.operators.Prep.bigramNllPlan(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val bad = p.linesIterator.filter(l =>
      l.contains("BroadcastHashJoin") &&
        (l.contains("[a#") || l.contains(", b#"))).toSeq
    assert(bad.isEmpty,
           s"bigram count tables must never broadcast:\n${bad.mkString("\n")}")
    assert(p.contains("ShuffledHashJoin"),
           s"bigram scoring lost its shuffled count joins:\n$p")
  }

  test("q139/q141: manifest digest is constant-state (no collect_list)") {
    // the round-11 spelling digested each (source, epoch) group via
    // collect_list of EVERY doc_id — unbounded per-group state that
    // OOMs one task per source at corpus scale. The bit_xor digest
    // carries one long per group: the plan must show a plain hash
    // aggregate, no list-collecting ObjectHashAggregate anywhere
    for (q <- Seq("q139_epoch_plan_execute", "q141_windowed_plan_execute")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("collect_list"),
             s"$q manifest digest regressed to unbounded collect_list:\n$p")
      assert(!p.contains("ObjectHashAggregate"),
             s"$q manifest aggregate must be constant-state per group:\n$p")
    }
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

  test("q147/q150: split attachment never broadcasts a documents scan") {
    // the pair/label joins run on scalable doc-id keys; acceptable
    // build sides are pair-bounded tables only — a broadcast carrying
    // the text column means a corpus scan on the build side, which
    // OOMs the driver at 100 TB
    for (q <- Seq("q147_split_leakage", "q150_cluster_split")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val bad = p.linesIterator.filter(l =>
        l.contains("BroadcastExchange") && l.contains("text#")).toSeq
      assert(bad.isEmpty,
             s"$q broadcasts a documents scan:\n${bad.mkString("\n")}")
    }
  }

  test("q148: two-phase rank — row_number windows are sub-bucket-bounded, no global sort") {
    val df = SparkEntry.queries("q148_length_buckets")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // every row_number window must partition on the 8192-doc range
    // sub-bucket too — partitioning only on (split, bucket_max) means
    // one task sorts a whole corpus-sized bucket at 100 TB
    val rnWindows = p.linesIterator
      .filter(l => l.contains("Window") && l.contains("row_number")).toSeq
    assert(rnWindows.nonEmpty, s"q148 lost its rank window:\n$p")
    assert(rnWindows.forall(_.contains("sub#")),
           s"q148 rank window lost the sub-bucket key:\n${rnWindows.mkString("\n")}")
    assert(!p.linesIterator.exists(l =>
             l.trim.startsWith("+- Sort") && l.contains("global=true")),
           s"q148 batch numbering regressed to a global sort:\n$p")
  }

  test("q149: at most the 1-row totals broadcast; never a documents scan") {
    val df = SparkEntry.queries("q149_anneal_schedule")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val broadcasts = p.linesIterator
      .filter(_.contains("BroadcastExchange")).toSeq
    assert(broadcasts.size <= 1,
           s"q149 grew extra broadcasts:\n${broadcasts.mkString("\n")}")
    assert(!broadcasts.exists(_.contains("text#")),
           "q149 must not broadcast a documents scan")
  }

  test("q172/q174: URL canonicalize/filter are pure projections — zero exchanges") {
    for (q <- Seq("q172_url_normalize", "q174_url_filter")) {
      val p = plan(q)
      assert(!p.contains("Exchange"),
             s"$q grew a shuffle — canonicalization must stay a projection:\n$p")
      assert(!p.contains("DeserializeToObject"),
             s"$q fell out of columnar processing:\n$p")
    }
  }

  test("rank BUILD: iteration joins shuffle (host table never broadcast); only the 1-row n broadcasts") {
    // q177's read is now a host_rank_v1 artifact scan (pinned in the
    // warm-consumer test below); the shuffle discipline applies to the
    // BUILD plan hostRankTable runs on a refresh — pin it directly
    val df = graft.operators.WebGraph.pageRank(
      graft.operators.WebGraph.linkEdgesTable(spark, sf), 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("ShuffledHashJoin"),
           s"rank build joins lost the hinted shuffle path:\n$p")
    // at 100 TB the rank/out-degree tables are ~1e7 hosts — a
    // BroadcastHashJoin of either would ship them to every task
    assert(!p.linesIterator.exists(l => l.contains("BroadcastHashJoin")),
           s"rank build must not broadcast host-sized tables:\n$p")
  }

  test("q178: frontier anti-joins on the canonical key and caps below the exchange") {
    val df = SparkEntry.queries("q178_url_frontier")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("LeftAnti"), s"q178 lost the anti-join:\n$p")
    assert(p.contains("WindowGroupLimit"),
           s"q178 per-host cap lost its pre-exchange group limit:\n$p")
  }

  test("q180/q181: only 1-row scalars broadcast; chain joins stay hinted-shuffle") {
    for (q <- Seq("q180_crawl_budget", "q181_redirect_resolve")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // host/page-sized operator tables must never broadcast (1-row
      // scalar aggregates and the planted-fixture scaffolding joins
      // may). The operator joins key on host/url/cur — none of those
      // may appear as a BroadcastHashJoin key.
      val bhj = p.linesIterator.filter(l =>
        l.contains("BroadcastHashJoin") &&
          (l.contains("[host#") || l.contains("[url#") ||
           l.contains("[cur#"))).toSeq
      assert(bhj.isEmpty,
             s"$q broadcast an operator-keyed table:\n${bhj.mkString("\n")}")
      assert(p.contains("ShuffledHashJoin"),
             s"$q chain joins lost the hinted shuffle path:\n$p")
    }
  }

  test("q176/q177/q180/q182: graph reads serve the landed edge artifacts — zero corpus scans") {
    // Round 17: link extraction is a persisted append-incremental
    // DerivedCache artifact (link_edges_v1 / site_edges_v1). The
    // regression this pins: any graph consumer silently re-extracting
    // edges inline — a documents scan or a Generate in a warm plan is
    // a whole corpus pass per read at 100 TB.
    graft.operators.WebGraph.linkEdgesTable(spark, sf).count() // land
    graft.operators.WebGraph.siteEdgesTable(spark, sf).count()
    val derives = graft.operators.WebGraph.linkEdgeDerives.get()
    for (q <- Seq("q176_link_graph", "q177_host_rank",
                  "q182_host_components")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(!p.contains("documents.parquet"),
             s"$q re-extracted the link graph from the corpus:\n$p")
      assert(!p.contains("Generate"),
             s"$q must not re-run edge extraction (artifact serves edges):\n$p")
    }
    assert(graft.operators.WebGraph.linkEdgeDerives.get() === derives,
           "a warm graph consumer re-derived a landed edge artifact")
  }

  test("q185: change stats are one page-keyed aggregation — no broadcast, no generate") {
    val df = SparkEntry.queries("q185_recrawl_priority")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("BroadcastHashJoin"),
           s"q185 grew a join — it must stay a single aggregation:\n$p")
    assert(!p.contains("Generate"), s"q185 grew an explode:\n$p")
    // the distinct-version count plans the standard two-phase distinct
    // aggregation: one exchange on (page, fp), one on the page key —
    // both page-keyed, both partial-aggregated map-side. More than two
    // means a join or a re-shuffle crept in.
    assert(p.split("Exchange hashpartitioning").length - 1 === 2,
           s"q185 must shuffle exactly twice (distinct-agg two-phase):\n$p")
    assert(p.linesIterator.filter(_.contains("Exchange hashpartitioning"))
             .forall(_.contains("canon_url#")),
           s"q185 exchanges must key on the page:\n$p")
  }

  test("q177/q186/q188/q193: rank consumers serve the LANDED rank artifacts — zero rank-iteration exchanges warm") {
    // land both rank artifacts (which lands link_edges_v1 first), then
    // pin: warm reads never re-derive (counters frozen) and the
    // 3-iteration shuffle-join chain is GONE from every consumer plan
    graft.operators.WebGraph.hostRankTable(spark, sf).count()
    graft.operators.WebGraph.trustRankTable(spark, sf).count()
    val rankDerives = graft.operators.WebGraph.rankDerives.get()
    val edgeDerives = graft.operators.WebGraph.linkEdgeDerives.get()
    // q177/q186 warm: ONE parquet scan of the rank artifact — no
    // joins, no aggregation, no corpus access at all
    for ((q, art) <- Seq("q177_host_rank" -> "host_rank_v1",
                         "q186_trustrank" -> "trust_rank_v1")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p.contains(art), s"$q does not serve the $art artifact:\n$p")
      assert(!p.contains("ShuffledHashJoin") && !p.contains("HashAggregate"),
             s"$q warm read must be a plain artifact scan (the rank " +
               s"iteration belongs in the BUILD, not the read):\n$p")
      assert(!p.contains("documents.parquet"),
             s"$q warm read touched the corpus:\n$p")
    }
    // q188/q193: the capture-history side scans the corpus once; the
    // rank side serves the artifact through the hinted shuffle join,
    // and nothing host-keyed broadcasts
    for (q <- Seq("q188_recrawl_queue", "q193_declared_freshness")) {
      val df = SparkEntry.queries(q)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p.contains("host_rank_v1"),
             s"$q does not serve the rank artifact:\n$p")
      assert(p.contains("ShuffledHashJoin"),
             s"$q host join lost the hinted shuffle path:\n$p")
      assert(p.contains("TakeOrderedAndProject"),
             s"$q top-100 regressed to a global sort:\n$p")
      val bhj = p.linesIterator.filter(l =>
        l.contains("BroadcastHashJoin") && l.contains("[host#")).toSeq
      assert(bhj.isEmpty,
             s"$q broadcast a host-keyed table:\n${bhj.mkString("\n")}")
    }
    assert(graft.operators.WebGraph.rankDerives.get() === rankDerives,
           "a warm rank consumer re-derived a landed rank artifact")
    assert(graft.operators.WebGraph.linkEdgeDerives.get() === edgeDerives,
           "a warm rank consumer re-derived the landed edge artifact")
  }

  test("q187: the fingerprint self-join stays on the shuffle path") {
    val df = SparkEntry.queries("q187_mirror_hosts")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("ShuffledHashJoin"),
           s"q187 lost the hinted shuffle join:\n$p")
    // the incidence table is corpus-scale on a real frame — neither
    // side of the fp join may broadcast
    val bhj = p.linesIterator.filter(l =>
      l.contains("BroadcastHashJoin") &&
        (l.contains("[fp#") || l.contains("[host"))).toSeq
    assert(bhj.isEmpty,
           s"q187 broadcast a corpus-scale side:\n${bhj.mkString("\n")}")
  }

  test("q207: the pacing windows reuse the delay join's host partitioning — one exchange per side, one sort") {
    val p = plan("q207_paced_plan").split("== Initial Plan ==")(0)
    assert(p.contains("ShuffledHashJoin"),
           s"q207 lost the hinted shuffle join:\n$p")
    // both windows (row_number, then the prefix max) and the join
    // agree on hashpartitioning(host): every Exchange sits BELOW the
    // join (its inputs + the plant's distinct), none between the join
    // and the windows above it
    val joinIdx = p.indexOf("ShuffledHashJoin")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(joinIdx >= 0 && exchangeIdx > joinIdx,
           s"q207 re-shuffles the paced train above the join:\n$p")
    // the shared (host, due_ts_s, canon_url) order sorts once
    val sorts = p.linesIterator.count(_.trim.startsWith("Sort "))
    assert(sorts <= 1, s"q207 re-sorts between window passes:\n$p")
  }
}
