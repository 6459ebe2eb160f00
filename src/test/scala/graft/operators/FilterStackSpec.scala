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

  test("q163: one corpus pass — the tokenize stage is shared, not forked") {
    // the composition's scale claim: the (doc, term, count) exchange is
    // built once and reused by the unigram/NB/score consumers (the
    // q110/q112 discipline). AQE surfaces the sharing as ReusedExchange
    // in the final adaptive plan.
    val df = graft.SparkEntry.queries("q163_filter_stack")(
      spark, "/root/testdata/sf0.001")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("ReusedExchange".r.findAllIn(p).length >= 3,
           s"q163 stopped reusing the corpus tokenize/cdc stage:\n$p")
    assert(p.contains("ShuffledHashJoin"),
           s"q163 vocabulary probe join must be shuffle_hash, never broadcast:\n$p")
  }
}
