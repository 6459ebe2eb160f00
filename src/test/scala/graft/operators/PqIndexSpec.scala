package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite

/** The PQ index must amortize like the IVF one: the m per-subspace KMeans
  * fits + corpus encode run once per (corpus, session), and a persisted
  * index serves fresh sessions with zero fits (IvfIndexSpec's contract,
  * applied to the compressed-domain structure).
  */
class PqIndexSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("fresh session serves q116 from the PERSISTED index with zero KMeans fits") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq").toString + "/pq_index"
    try {
      val baseline = SparkEntry.queries("q116_ann_pq")(spark, sf)
        .collect().map(_.toString).sorted.toSeq
      TrainingData.buildPqIndex(spark, sf, dir)
      val fitsAfterBuild = TrainingData.pqFits.get()
      // a brand-new session has no in-memory cache entry — it must load
      // the codebook sidecar + encoded corpus from parquet, never refit
      val s2 = spark.newSession()
      val served = SparkEntry.queries("q116_ann_pq")(s2, sf)
        .collect().map(_.toString).sorted.toSeq
      assert(TrainingData.pqFits.get() === fitsAfterBuild,
             "fresh session refit the PQ codebook instead of loading the persisted index")
      assert(served === baseline,
             "persisted-index results diverged from the in-session fit")
      // compaction hook refits: invalidate + rebuild bumps the fit count
      TrainingData.refreshPqIndex(spark, sf, dir)
      assert(TrainingData.pqFits.get() === fitsAfterBuild + 1,
             "refreshPqIndex must refit against the (changed) corpus")
      // the refreshed index still loads (sidecar + parquet agree)
      val (cb, coded) = TrainingData.loadPqIndex(spark, dir)
      assert(cb.length === TrainingData.PqM)
      assert(cb.forall(_.length === TrainingData.PqK * TrainingData.PqSub))
      assert(coded.columns.toSeq === Seq("vec_id", "v", "codes"))
    } finally {
      TrainingData.invalidate(sf)
    }
  }

  test("a corrupt sidecar is rejected, never silently served") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq2").toString + "/pq_index"
    try {
      TrainingData.buildPqIndex(spark, sf, dir)
      // rewrite through the Hadoop FS so the local-FS checksum follows
      val p = new org.apache.hadoop.fs.Path(dir, "_pq_codebook")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      // forged geometry: m=8 against compiled m=16
      val forged = txt.linesIterator.toSeq.updated(0, "8 16 4").mkString("\n")
      val out = fs.create(p, true)
      try out.write(forged.getBytes("UTF-8")) finally out.close()
      val e = intercept[IllegalArgumentException] {
        TrainingData.loadPqIndex(spark, dir)
      }
      assert(e.getMessage.contains("geometry"))
    } finally {
      TrainingData.invalidate(sf)
    }
  }
}
