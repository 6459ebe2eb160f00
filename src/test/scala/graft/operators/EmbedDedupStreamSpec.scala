package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Embedding-space dedup at ingest: a re-encoded/paraphrased arrival
  * (same direction, perturbed coordinates — cosine ~1 to its source)
  * must be flagged against the PERSISTED IVF index with ZERO KMeans
  * fits in the streaming session, while an unrelated arrival passes.
  */
class EmbedDedupStreamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("re-ingested near-identical embedding flagged stream-static, zero fits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-embdup")
      .toString + "/ivf_index"
    TrainingData.buildIvfIndex(spark, sf, dir, k = 16)

    // source vectors 3 and 7 -> "paraphrase" arrivals: every coordinate
    // scaled and nudged (cosine stays >> 0.9); plus one unrelated arrival
    // far from the corpus (a fresh direction in a 64-dim space is near-
    // orthogonal to everything)
    val src = Tables.embeddings(spark, sf)
      .filter($"vec_id".isin(3L, 7L))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).toArray).toMap
    val para = src.map { case (id, v) =>
      (id + 100000L, v.zipWithIndex.map { case (x, i) =>
        x * 1.02f + (if (i % 7 == 0) 0.003f else -0.002f) })
    }.toSeq
    val rnd = new scala.util.Random(7)
    val unrelated = (999999L, Array.fill(src(3L).length)(rnd.nextFloat() - 0.5f))

    val fitsBefore = TrainingData.ivfFits.get()
    implicit val sctx = spark.sqlContext
    val mem = MemoryStream[(Long, Array[Float])]
    mem.addData(para :+ unrelated: _*)
    val q = TrainingData.embeddingNearDupStream(
        mem.toDF().toDF("vec_id", "embedding"), spark, dir, threshold = 0.9)
      .writeStream.format("memory").queryName("emb_dups")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(TrainingData.ivfFits.get() === fitsBefore,
           "streaming probe must serve from the persisted index, not refit")

    val flagged = spark.table("emb_dups").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // each paraphrase is flagged against its own source vector
    for (id <- Seq(3L, 7L)) {
      val hits = flagged.filter(_._1 === id + 100000L)
      assert(hits.exists(_._2 === id),
             s"paraphrase of $id not flagged against its source: ${hits.mkString(",")}")
      assert(hits.filter(_._2 === id).forall(_._3 >= 0.99),
             s"paraphrase of $id should be near-identical")
    }
    // the unrelated arrival is not flagged
    assert(!flagged.exists(_._1 === unrelated._1),
           s"unrelated vector falsely flagged: ${flagged.filter(_._1 === unrelated._1).mkString(",")}")

    // batch parity: the same frame through the same operator in batch
    // mode yields the same flags (stream-static join is mode-agnostic)
    val batchIn = (para :+ unrelated).toDF("vec_id", "embedding")
    val batch = TrainingData.embeddingNearDupStream(batchIn, spark, dir, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch === flagged.toSet, "stream flags must equal batch flags")

    // --- coded (IVF-PQ) path: 12-byte/row static scan, ADC gate -----
    val pqDir = java.nio.file.Files.createTempDirectory("graft-embdup-pq")
      .toString + "/ivfpq_index"
    TrainingData.buildIvfPqIndex(spark, sf, pqDir)
    val fitsBeforeCoded =
      (TrainingData.ivfFits.get(), TrainingData.pqFits.get())
    val mem2 = MemoryStream[(Long, Array[Float])]
    mem2.addData(para :+ unrelated: _*)
    val q2 = TrainingData.embeddingNearDupStreamCoded(
        mem2.toDF().toDF("vec_id", "embedding"), spark, pqDir, threshold = 0.9)
      .writeStream.format("memory").queryName("emb_dups_coded")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      // micro-batch plan: static side scans the IVF-PQ table with the
      // vector column PRUNED (the 12-byte/row promise), and never
      // touches embeddings.parquet
      val lastPlan = q2 match {
        case w: org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper =>
          w.streamingQuery.lastExecution.executedPlan.toString
        case other => fail(s"unexpected StreamingQuery impl ${other.getClass}")
      }
      assert(!lastPlan.contains("embeddings.parquet"),
             s"coded probe rescans the raw embeddings:\n$lastPlan")
      assert(lastPlan.contains("ivfpq_index"),
             s"coded probe does not scan the IVF-PQ table:\n$lastPlan")
      val idxScan = lastPlan.linesIterator
        .filter(l => l.contains("FileScan") && l.contains("ivfpq_index"))
        .mkString("\n")
      assert(!idxScan.contains("v#") && !idxScan.contains(",v,"),
             s"coded probe's index scan must prune the vector column:\n$idxScan")
    } finally q2.stop()
    assert((TrainingData.ivfFits.get(), TrainingData.pqFits.get())
             === fitsBeforeCoded,
           "coded streaming probe must serve from the persisted index, not refit")
    val coded = spark.table("emb_dups_coded").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // no false negatives vs the exact path at default slack...
    val exactPairs = flagged.map(f => (f._1, f._2)).toSet
    assert(exactPairs.subsetOf(coded),
           s"coded gate dropped exact flags: ${(exactPairs -- coded).mkString(",")}")
    // ...and the unrelated arrival still passes the ADC gate untouched
    assert(!coded.exists(_._1 === unrelated._1),
           s"unrelated vector falsely flagged by ADC: ${coded.filter(_._1 === unrelated._1)}")
  }
}
