package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The at-ingest boundary emitter must ship exactly the attention
  * metadata batch q145 derives: streaming the corpus through
  * startPackBoundaryIngest (in several micro-batches, so bins assemble
  * their boundary rows from MULTIPLE epochs) and regrouping the landed
  * rows by (split, bin) reproduces q145's boundary strings bit-for-bit,
  * with the persisted pack manifest as the only state.
  */
class PackBoundaryStreamSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed boundary rows regroup to batch q145 on the same corpus") {
    import spark.implicits._
    implicit val sctx = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(minutes: Long) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text")
      .collect().map(r => (ts(r.getLong(0)), r.getLong(0), r.getString(1)))

    val base = java.nio.file.Files
      .createTempDirectory("graft-packbound").toString
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    // two arrival waves -> two epochs: a bin whose docs straddle the
    // wave boundary must still assemble the full boundary set
    val (wave1, wave2) = docs.splitAt(docs.length / 2)
    mem.addData(wave1.toSeq: _*)
    Curation.startPackBoundaryIngest(
        mem.toDF().toDF("ts", "doc_id", "text"),
        spark, sf, s"$base/bounds", s"$base/ckpt")
      .awaitTermination()
    mem.addData(wave2.toSeq: _*)
    Curation.startPackBoundaryIngest(
        mem.toDF().toDF("ts", "doc_id", "text"),
        spark, sf, s"$base/bounds", s"$base/ckpt")
      .awaitTermination()

    val landed = spark.read.parquet(s"$base/bounds")
    assert(landed.count() > 0, "stream landed no boundary rows")
    val regrouped = landed
      .groupBy("split", "bin")
      .agg(org.apache.spark.sql.functions.count(
             org.apache.spark.sql.functions.lit(1))
             .cast("long").as("n_pieces"),
           org.apache.spark.sql.functions.array_join(
             org.apache.spark.sql.functions.transform(
               org.apache.spark.sql.functions.sort_array(
                 org.apache.spark.sql.functions.collect_list(
                   org.apache.spark.sql.functions.col("off"))),
               o => o.cast("string")),
             " ").as("boundaries"))
      .select("split", "bin", "n_pieces", "boundaries")
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.SparkEntry.queries("q145_pack_boundaries")(spark, sf)
      .select("split", "bin", "n_pieces", "boundaries")
      .collect().map(_.toString).sorted.toSeq
    assert(regrouped === batch,
           "streamed boundary rows diverge from batch q145")
    // the normalized rows additionally carry each piece's doc and token
    // count — their per-bin sums must re-derive the packing geometry
    // (every bin except each split's last holds exactly PackBudget)
    val sums = landed.groupBy("split", "bin")
      .agg(org.apache.spark.sql.functions.sum("n_piece_tokens")
             .cast("long").as("bin_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val lastBin = sums.keys.groupBy(_._1).view.mapValues(_.map(_._2).max)
    sums.foreach { case ((split, bin), tokens) =>
      if (bin < lastBin(split))
        assert(tokens == Prep.PackBudget, s"bin ($split, $bin) not full")
      else assert(tokens <= Prep.PackBudget)
    }
  }
}
