package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The at-ingest NB quality gate, wired: [[Curation.startCorpusMaintenance]]
  * with an [[Curation.NbGate]] scores every arriving doc against the
  * PERSISTED q161 model and routes it — corpus or quarantine — by the
  * offline-tuned theta. Pins: (1) stream verdicts == the batch q161
  * bins doc-for-doc (keepers' bins >= theta, quarantined bins < theta,
  * quarantine rows carry the exact batch bin); (2) keepers ∪ quarantine
  * == the stateless ingest verdict's quality-passers (the gate reroutes,
  * never drops); (3) ZERO model derives in-stream across two epochs —
  * the fit-counter pin ([[Prep.nbDerives]], the ivfFits pattern).
  */
class NbGateSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("gated maintenance routes by the batch q161 bins with zero in-stream derives") {
    implicit val sctx = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-nb-gate").toString
    val corpus = s"$base/corpus"

    val theta = graft.SparkEntry.queries("q161_nb_distill")(spark, sf)
      .select("theta").head().getLong(0)
    // batch truth: per-doc s_int from the self-contained q161 derivation
    val binOf = Prep.nbDocScores(spark, sf)
      .collect().map { r =>
        val b = math.min(math.max(math.floor(r.getLong(3) / 5e7), -10), 9)
        r.getLong(0) -> b.toLong
      }.toMap

    val srcDocs = graft.Tables.documents(spark, sf)
      .select("doc_id", "source", "text", "lang")
      .collect()
      .map(r => (new java.sql.Timestamp(1767225600000L + r.getLong(0)),
                 r.getLong(0), r.getString(1), r.getString(2),
                 r.getString(3)))
      .toSeq
    // the stateless verdict decides which docs reach the gate at all
    val passers = Curation.ingestVerdict(
        graft.Tables.documents(spark, sf).select("doc_id", "text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val expectKeep = passers.filter(binOf(_) >= theta)
    val expectQuar = passers.filter(binOf(_) < theta)
    assert(expectKeep.nonEmpty && expectQuar.nonEmpty,
           s"theta=$theta does not split sf0.001 (keep=${expectKeep.size}, " +
           s"quar=${expectQuar.size}) — the routing pin would be vacuous")

    // land the model artifact BEFORE the stream so the pin below counts
    // only in-stream derives
    Prep.nbClassCounts(spark, sf).count()
    val derivesBefore = Prep.nbDerives.get()

    val mem = MemoryStream[(java.sql.Timestamp, Long, String, String, String)]
    def stream = mem.toDF().toDF("ts", "doc_id", "source", "text", "lang")
    def run(): Unit =
      Curation.startCorpusMaintenance(stream, corpus, s"$base/ckpt",
          refreshEvery = 0,
          nbGate = Some(Curation.NbGate(modelDir = sf, theta = theta)))
        .awaitTermination()
    val (half1, half2) = srcDocs.splitAt(srcDocs.size / 2)
    mem.addData(half1: _*)
    run() // epoch 0
    mem.addData(half2: _*)
    run() // epoch 1

    assert(Prep.nbDerives.get() === derivesBefore,
           "the gate re-derived the NB model in-stream")

    val landed = spark.read.parquet(s"$corpus/documents.parquet")
    assert(landed.select("epoch").distinct().count() === 2L,
           "expected one epoch partition per maintenance run")
    val gotKeep = landed.select("doc_id").collect().map(_.getLong(0)).toSet
    val gotQuar = spark.read.parquet(corpus + "_nb_quarantine")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nb_bin"))
      .toMap
    assert(gotKeep === expectKeep,
           s"kept set diverged: missing=${(expectKeep -- gotKeep).take(5)} " +
           s"extra=${(gotKeep -- expectKeep).take(5)}")
    assert(gotQuar.keySet === expectQuar,
           s"quarantine set diverged: missing=${(expectQuar -- gotQuar.keySet).take(5)} " +
           s"extra=${(gotQuar.keySet -- expectQuar).take(5)}")
    gotQuar.foreach { case (id, bin) =>
      assert(bin === binOf(id), s"doc $id quarantined with bin $bin != batch ${binOf(id)}")
    }
    Curation.invalidate(corpus)
  }
}
