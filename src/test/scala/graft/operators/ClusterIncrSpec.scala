package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental cluster merge: after a nightly append, the contracted-
  * graph CC merge over the slice's edge delta equals a from-scratch
  * re-resolve of the grown corpus — including the hard cases: a new
  * doc that becomes the component's new min-id representative, a new
  * doc that promotes an old singleton, a new-new pair, and a new doc
  * BRIDGING two previously-separate old clusters. And the refresh
  * provably never re-reads pre-existing corpus bytes (the candidate
  * and verification sides both come from persisted indexes).
  */
class ClusterIncrSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  // 28 shared 3-char tokens; near-dup = 29-of-30 overlap (J=29/31≈.936),
  // two docs sharing only the 28 commons sit at 28/32=.875 < .9
  private val c28 = (1 to 28).map(i => f"w$i%02d").mkString(" ")
  private def doc(id: Long, text: String) =
    (id, "web", text, "en", text.length.toLong)

  private def writeDocs(dir: String, mode: String,
                        rows: Seq[(Long, String, String, String, Long)]): Unit =
    rows.toDF("doc_id", "source", "text", "lang", "n_chars")
      .repartition(1)
      .write.mode(mode).parquet(dir + "/documents.parquet")

  private val d20 = (1 to 30).map(i => f"s$i%02d").mkString(" ")
  private def freshCorpus(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-cluster-incr").toString
    writeDocs(dir, "overwrite", Seq(
      doc(10L, s"$c28 aa1 aa2"), // cluster A
      doc(11L, s"$c28 aa1 aa3"),
      doc(20L, d20),             // singleton
      doc(30L, s"$c28 bb1 bb2"), // cluster B
      doc(31L, s"$c28 bb1 bb3"),
      doc(40L, (1 to 30).map(i => f"f$i%02d").mkString(" ")),
      doc(41L, (1 to 30).map(i => f"g$i%02d").mkString(" "))))
    dir
  }

  private def labelRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("merged labels equal a from-scratch re-resolve, including a cluster bridge") {
    val dir = freshCorpus()
    val cold = labelRows(Curation.dedupClusters(spark, dir))
    assert(cold == Set((10L, 10L, 1L), (11L, 10L, 0L),
                       (30L, 30L, 1L), (31L, 30L, 0L)),
           s"unexpected cold clusters: $cold")
    // land the incremental index artifacts before the append (the
    // production nightly does this once; later appends are delta-only)
    TrainingData.dedupTokenIndex(spark, dir).count()
    TrainingData.dedupPrefixIndex(spark, dir).count()

    writeDocs(dir, "append", Seq(
      doc(5L, s"$c28 aa1 aa4"),          // joins A with a SMALLER id -> new rep
      doc(50L, d20.replace("s30", "s31")), // promotes singleton 20
      doc(60L, s"$c28 x".replace(c28, (1 to 30).map(i => f"e$i%02d").mkString(" "))),
      doc(61L, (1 to 30).map(i => f"e$i%02d").mkString(" ")
                 .replace("e30", "e31")), // new-new pair with 60
      doc(70L, s"$c28 aa1 bb1")))        // BRIDGES A and B
    Curation.appendRefresh(dir)

    val merged = labelRows(Curation.dedupClusters(spark, dir))
    // from-scratch truth: full pair generation + CC over the grown corpus
    val pairs = TrainingData.jaccardPairsPlan(spark, dir).select("id_a", "id_b")
    val edges = pairs.unionByName(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b"))).persist()
    val truth = labelRows(Curation.connectedComponents(edges)
      .select(col("doc_id"), col("label").as("cluster_id"),
              (col("doc_id") === col("label")).cast("long").as("keep")))
    edges.unpersist()
    assert(merged == truth,
           s"incremental merge diverged from re-resolve:\n" +
             s"merged: ${merged.toSeq.sortBy(_._1)}\n" +
             s"truth:  ${truth.toSeq.sortBy(_._1)}")
    // the bridge collapsed A, B, 5 and 70 under the new min rep 5
    assert(merged.filter(r => Set(5L, 10L, 11L, 30L, 31L, 70L)(r._1))
             .forall(_._2 == 5L), s"bridge failed: $merged")
    assert(merged.contains((20L, 20L, 1L)) && merged.contains((50L, 20L, 0L)),
           s"singleton promotion failed: $merged")
    assert(merged.contains((60L, 60L, 1L)) && merged.contains((61L, 60L, 0L)),
           s"new-new pair failed: $merged")
  }

  test("the cluster refresh never re-reads pre-existing corpus files") {
    val dir = freshCorpus()
    Curation.dedupClusters(spark, dir).count()
    TrainingData.dedupTokenIndex(spark, dir).count()
    TrainingData.dedupPrefixIndex(spark, dir).count()
    // corrupt originals in place (same name/len/mtime): candidates and
    // verification must come from the persisted indexes, never the
    // corpus bytes — a read of these files now throws
    val tableDir = new java.io.File(dir, "documents.parquet")
    tableDir.listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
                   !f.getName.startsWith("."))
      .foreach { f =>
        val mtime = f.lastModified
        java.nio.file.Files.write(
          f.toPath, Array.fill[Byte](f.length.toInt)('x'.toByte))
        assert(f.setLastModified(mtime))
      }
    writeDocs(dir, "append", Seq(doc(5L, s"$c28 aa1 aa4")))
    Curation.appendRefresh(dir)
    val merged = labelRows(Curation.dedupClusters(spark, dir))
    assert(merged.filter(r => Set(5L, 10L, 11L)(r._1)).forall(_._2 == 5L),
           s"appended near-dup not merged: $merged")
    assert(merged.contains((30L, 30L, 1L)), s"old cluster lost: $merged")
  }
}
