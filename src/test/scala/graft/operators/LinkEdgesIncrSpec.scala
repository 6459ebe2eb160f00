package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Append-aware link graph (round 17): the landed `link_edges_v1` /
  * `site_edges_v1` edge tables refresh from ONLY a nightly append's
  * files — distinct-union is the merge monoid — and the refreshed
  * table equals a from-scratch extraction of the grown corpus. The
  * corrupt-in-place test proves old corpus bytes are never re-read
  * (the SourceStatsIncrSpec pattern).
  */
class LinkEdgesIncrSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  private def writeDocs(dir: String, mode: String, ids: Seq[Long]): Unit =
    ids.map(id => (id, "web", s"text of $id", "en", 10L))
      .toDF("doc_id", "source", "text", "lang", "n_chars")
      .repartition(1)
      .write.mode(mode).parquet(dir + "/documents.parquet")

  /** The planted q176 extraction, computed independently in Scala. */
  private def expectedLinkEdges(ids: Seq[Long]): Set[(String, String)] =
    (for {
      id <- ids
      j <- 0L to (id % 3)
      src = s"host${id % 53}"
      dst = s"host${(id * 7 + j * 11 + 3) % 53}"
      if src != dst
    } yield (src, dst)).toSet

  /** The planted q182 extraction (ring + chords over k = id % 250). */
  private def expectedSiteEdges(ids: Seq[Long]): Set[(String, String)] = {
    val ks = ids.map(_ % 250).distinct
    val ring = ks.map(k => (s"h${k % 24}", s"h${(k % 24 + 4) % 24}"))
    val chords = ks.filter(_ % 2 == 0)
      .map(k => (s"h${k % 24}", s"h${(k % 24 + 8) % 24}"))
    (ring ++ chords).toSet
  }

  private def edges(df: org.apache.spark.sql.DataFrame): Set[(String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("append refreshes both edge tables delta-only and equals a full re-extraction") {
    val d = java.nio.file.Files
      .createTempDirectory("graft-linkedges-incr").toString
    val night0 = Seq(1L, 2L, 3L, 7L, 11L, 250L)
    writeDocs(d, "overwrite", night0)
    val d0 = WebGraph.linkEdgeDerives.get()
    assert(edges(WebGraph.linkEdgesTable(spark, d)) ===
           expectedLinkEdges(night0))
    assert(edges(WebGraph.siteEdgesTable(spark, d)) ===
           expectedSiteEdges(night0))
    assert(WebGraph.linkEdgeDerives.get() === d0 + 2, "two cold builds")
    // warm serves: no derivation
    WebGraph.linkEdgesTable(spark, d).count()
    WebGraph.siteEdgesTable(spark, d).count()
    assert(WebGraph.linkEdgeDerives.get() === d0 + 2,
           "a warm serve re-derived a landed edge table")
    // nightly append: new ids including an overlap-producing one
    // (id 54 shares host1 edges with id 1) — distinct-union must
    // not double edges
    val night1 = Seq(54L, 99L, 123L)
    writeDocs(d, "append", night1)
    assert(edges(WebGraph.linkEdgesTable(spark, d)) ===
           expectedLinkEdges(night0 ++ night1))
    assert(edges(WebGraph.siteEdgesTable(spark, d)) ===
           expectedSiteEdges(night0 ++ night1))
    assert(WebGraph.linkEdgeDerives.get() === d0 + 4,
           "each refresh is exactly one (delta) derivation")
  }

  test("the refresh never re-reads pre-existing corpus files") {
    val d = java.nio.file.Files
      .createTempDirectory("graft-linkedges-corrupt").toString
    val night0 = Seq(1L, 2L, 5L, 8L)
    writeDocs(d, "overwrite", night0)
    WebGraph.linkEdgesTable(spark, d).count()
    WebGraph.siteEdgesTable(spark, d).count()
    // corrupt every ORIGINAL data file in place, keeping (name, length,
    // mtime) identical so the manifest still reads "unchanged" —
    // if the refresh touched any pre-existing file it would throw
    val tableDir = new java.io.File(d, "documents.parquet")
    val originals = tableDir.listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
                   !f.getName.startsWith("."))
    assert(originals.nonEmpty)
    originals.foreach { f =>
      val mtime = f.lastModified
      val garbage = Array.fill[Byte](f.length.toInt)('x'.toByte)
      java.nio.file.Files.write(f.toPath, garbage)
      assert(f.setLastModified(mtime))
    }
    val night1 = Seq(13L, 17L)
    writeDocs(d, "append", night1)
    assert(edges(WebGraph.linkEdgesTable(spark, d)) ===
           expectedLinkEdges(night0 ++ night1),
           "edges from the (now unreadable) old files must survive " +
             "via the landed artifact")
    assert(edges(WebGraph.siteEdgesTable(spark, d)) ===
           expectedSiteEdges(night0 ++ night1))
  }
}
