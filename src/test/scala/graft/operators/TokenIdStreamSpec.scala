package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming token-ID export must land exactly the shards the batch
  * spelling produces: startTokenIdIngest on a stream of the corpus docs
  * == q140 (tokenizedDocs over the batch ingest verdict) row-for-row —
  * same keepers, same splits, same ID digests — with the persisted BPE
  * merge cache as the only tokenizer state (no refit in-stream).
  */
class TokenIdStreamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed tokenized shards equal the batch spelling on the same corpus") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(minutes: Long) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text")
      .collect().map(r => (ts(r.getLong(0)), r.getLong(0), r.getString(1)))

    val base = java.nio.file.Files
      .createTempDirectory("graft-tokid").toString
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    mem.addData(docs.toSeq: _*)
    Curation.startTokenIdIngest(mem.toDF().toDF("ts", "doc_id", "text"),
                                spark, sf, s"$base/shards", s"$base/ckpt")
      .awaitTermination()

    val landed = spark.read.parquet(s"$base/shards")
      .select("split", "doc_id", "n_ids", "ids_md5")
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.SparkEntry.queries("q140_tokenized_docs")(spark, sf)
      .select("split", "doc_id", "n_ids", "ids_md5")
      .collect().map(_.toString).sorted.toSeq
    assert(landed.nonEmpty, "stream landed no tokenized shards")
    assert(landed === batch,
           "streamed tokenized shards diverge from the batch spelling")
  }
}
