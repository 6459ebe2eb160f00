package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q163/q164 filter-funnel semantics beyond the SQL oracle: the gate
  * table must cover the whole corpus, its verdict logic must be
  * internally consistent (keep == all four stages, reject_stage == the
  * FIRST failing stage), its NB stage must agree with the q161 tuned
  * threshold it claims to reuse, and the q164 rollup must be exactly
  * the per-source aggregation of the per-doc rows. The oracle proves
  * cross-engine equality; these prove the composition cannot drift
  * from its single-model parents.
  */
class FilterStackSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private lazy val gate =
    graft.SparkEntry.queries("q163_filter_stack")(spark, sf)
      .collect()

  test("q163: one row per corpus doc, verdicts internally consistent") {
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(gate.length.toLong == nDocs,
           s"gate table has ${gate.length} rows for $nDocs docs")
    gate.foreach { r =>
      val pl = r.getAs[Boolean]("pass_len")
      val pq = r.getAs[Boolean]("pass_quality")
      val pm = r.getAs[Boolean]("pass_lm")
      val pn = r.getAs[Boolean]("pass_nb")
      val keep = r.getAs[Boolean]("keep")
      val stage = r.getAs[String]("reject_stage")
      assert(keep == (pl && pq && pm && pn), s"keep bit inconsistent: $r")
      val expected =
        if (!pl) "len" else if (!pq) "quality"
        else if (!pm) "lm" else if (!pn) "nb" else "keep"
      assert(stage == expected,
             s"reject_stage $stage != first failing stage $expected: $r")
    }
  }

  test("q163: every stage fires somewhere and the funnel keeps a majority") {
    val byStage = gate.groupBy(_.getAs[String]("reject_stage"))
      .view.mapValues(_.length).toMap
    // thresholds were set from the corpus distribution so each stage
    // rejects a real tail — a stage rejecting nothing (or everything)
    // means a drifted constant
    for (s <- Seq("quality", "lm", "nb"))
      assert(byStage.getOrElse(s, 0) > 0, s"stage '$s' rejects nothing")
    // an aggressive funnel is correct (FineWeb keeps ~10% of CC), but
    // a funnel keeping nearly nothing — or everything — means a
    // mis-set constant, not a selective gate
    val kept = byStage.getOrElse("keep", 0)
    assert(kept >= gate.length / 10 && kept <= gate.length * 9 / 10,
           s"funnel keeps $kept of ${gate.length} docs — outside [10%, 90%]")
  }

  test("q163: the NB stage threshold IS the q161 tuned theta") {
    val theta163 = gate.map(_.getAs[Long]("theta")).distinct
    assert(theta163.length == 1, "theta not constant across the gate table")
    val theta161 = graft.SparkEntry.queries("q161_nb_distill")(spark, sf)
      .select("theta").distinct().collect().map(_.getLong(0))
    assert(theta161.length == 1)
    assert(theta163.head == theta161.head,
           s"q163 theta ${theta163.head} != q161 tuned theta ${theta161.head}")
  }

  test("q164: rollup equals the per-doc table aggregated per source") {
    val fromGate = gate.groupBy(_.getAs[String]("source")).map {
      case (src, rows) =>
        val s2 = rows.filter(r => r.getAs[Boolean]("pass_len") &&
                                  r.getAs[Boolean]("pass_quality"))
        val s3 = s2.filter(_.getAs[Boolean]("pass_lm"))
        src -> (rows.length.toLong,
                rows.count(_.getAs[Boolean]("pass_len")).toLong,
                s2.length.toLong, s3.length.toLong,
                rows.count(_.getAs[Boolean]("keep")).toLong)
    }.toMap
    val funnel = graft.SparkEntry.queries("q164_filter_funnel")(spark, sf)
      .collect()
    assert(funnel.length == fromGate.size)
    funnel.foreach { r =>
      val src = r.getAs[String]("source")
      val got = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_len"),
                 r.getAs[Long]("n_quality"), r.getAs[Long]("n_lm"),
                 r.getAs[Long]("n_kept"))
      assert(got == fromGate(src), s"funnel row for $src: $got != ${fromGate(src)}")
      assert(got._1 >= got._2 && got._2 >= got._3 &&
               got._3 >= got._4 && got._4 >= got._5,
             s"funnel counts not monotone for $src: $got")
      assert(math.abs(r.getAs[Double]("keep_rate") -
               math.rint(got._5.toDouble / got._1 * 10000) / 10000.0) < 1e-9)
    }
  }

  test("the artifact build equals the one-pass audit plan row-for-row") {
    // funnel_stack_v2 is built from the persisted model layers
    // (funnelStackFromLayers); filterStack derives the same table from
    // first principles in one pass. The two must agree on EVERY column
    // of EVERY doc — the guard that composing from landed artifacts
    // cannot drift from the oracle-proven inline derivation. With the
    // scaled-integer lpsumi (round 16) the equality is STRUCTURAL:
    // per-term lpi values are identical doubles rounded once, and the
    // per-doc sum is exact BIGINT arithmetic, so summation order
    // cannot move lp4 even at a 4dp tie.
    val cols = Seq("doc_id", "source", "qi", "n_tokens", "lp4", "s_int",
                   "bin", "theta", "pass_len", "pass_quality", "pass_lm",
                   "pass_nb", "keep", "reject_stage")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.head, cols.tail: _*).collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    for (d <- Seq("/root/testdata/sf0.001", sf)) {
      val layered = rows(Prep.funnelStackFromLayers(spark, d))
      val inline = rows(Prep.filterStack(spark, d))
      assert(layered.keySet == inline.keySet, s"doc sets diverge at $d")
      layered.foreach { case (id, l) =>
        assert(l == inline(id),
               s"doc $id at $d: layered $l != inline ${inline(id)}")
      }
    }
  }

  test("warm consumers serve the landed artifact — zero funnel re-derives") {
    val d = "/root/testdata/sf0.001"
    Prep.funnelStack(spark, d).count() // land (or confirm) the artifact
    val before = Prep.funnelDerives.get()
    for (q <- Seq("q163_filter_stack", "q164_filter_funnel",
                  "q165_funnel_mixture_shift", "q166_funnel_ablation",
                  "q167_funnel_resample"))
      graft.SparkEntry.queries(q)(spark, d).collect()
    assert(Prep.funnelDerives.get() === before,
           "a warm funnel consumer re-ran the funnel derivation")
  }

  test("an appended corpus invalidates and rebuilds the artifact correctly") {
    // the nightly-crawl shape: new part files land under documents.
    // The stale artifact must not serve (corpus fingerprint moved);
    // the rebuild — model layers refreshed incrementally + one rescore
    // pass — must equal the from-scratch inline derivation over the
    // GROWN corpus, theta retune included.
    val base = java.nio.file.Files
      .createTempDirectory("graft-funnel-append").toString
    val srcDocs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    srcDocs.write.parquet(s"$base/documents.parquet")
    val v0 = Prep.funnelStack(spark, base)
    val n0 = v0.count()
    val derives0 = Prep.funnelDerives.get()
    // append: re-suffixed copies of 20 docs as a new part file
    val maxId = srcDocs.agg(max("doc_id")).head().getLong(0)
    srcDocs.limit(20)
      .withColumn("doc_id", col("doc_id") + lit(maxId + 1))
      .write.mode("append").parquet(s"$base/documents.parquet")
    val grown = Prep.funnelStack(spark, base)
    assert(Prep.funnelDerives.get() === derives0 + 1,
           "append did not trigger exactly one rebuild")
    assert(grown.count() === n0 + 20, "rebuilt artifact missed the append")
    val inline = Prep.filterStack(spark, base)
      .select("doc_id", "s_int", "bin", "theta", "keep", "reject_stage")
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    grown.select("doc_id", "s_int", "bin", "theta", "keep", "reject_stage")
      .collect().foreach { r =>
        assert(r.toSeq.tail == inline(r.getLong(0)),
               s"post-append artifact diverges from inline at doc ${r.getLong(0)}")
      }
  }
}
