package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup semantics on crafted cells: duplicate groups are connected
  * components of the within-cell over-threshold pair graph, and each
  * group keeps exactly its most centroid-distant member (the paper's
  * diversity rule).
  */
class SemDedupSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // axis-ish unit vectors in 4 dims keep the cosines legible
  private def v(x: Double, y: Double, z: Double, w: Double) = Array(x, y, z, w)

  test("planted duplicate groups collapse to one centroid-distant keeper each") {
    import spark.implicits._
    // cell 0: a tight pair (1,2) plus an unrelated far vector 3
    // cell 1: a CHAIN 10-11-12 (10~11, 11~12 above tau, 10~12 below) —
    //         components must still merge it into one group
    // cell 2: singleton 20 — no pairs, must not appear in the output
    val e = Seq(
      (1L,  v(1, 0, 0, 0),          0),
      (2L,  v(0.999, 0.0447, 0, 0), 0),
      (3L,  v(0, 0, 1, 0),          0),
      (10L, v(0, 1, 0, 0),          1),
      (11L, v(0.30, 0.954, 0, 0),   1),
      (12L, v(0.573, 0.819, 0, 0),  1),
      (20L, v(0, 0, 0, 1),          2)
    ).toDF("vec_id", "v", "cell")
    val centers = Seq(
      0 -> v(1, 0, 0, 0),
      1 -> v(0, 1, 0, 0),
      2 -> v(0, 0, 0, 1))
    val out = TrainingData.semDedupCells(spark, e, centers, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byId = out.map(t => t._1 -> t).toMap
    // exactly the two groups, nothing else
    assert(out.map(_._1).sorted.toSeq === Seq(1L, 2L, 10L, 11L, 12L),
           s"wrong membership: ${out.mkString(", ")}")
    assert(byId(1L)._2 === 1L && byId(2L)._2 === 1L)
    assert(Seq(10L, 11L, 12L).forall(byId(_)._2 === 10L),
           "chain 10-11-12 must merge into one component")
    // keepers: min cosine-to-centroid. cell 0: vec 2 (0.999 < 1.0).
    // cell 1 chain: vec 12 (cos 0.819 < 0.954 < 1.0).
    assert(out.filter(_._4 === 1L).map(_._1).sorted.toSeq === Seq(2L, 12L),
           s"wrong keepers: ${out.filter(_._4 === 1L).mkString(", ")}")
    // exactly one keeper per cluster
    out.groupBy(_._2).foreach { case (cl, rows) =>
      assert(rows.count(_._4 === 1L) === 1, s"cluster $cl keeper count != 1")
    }
  }

  test("q118 on the corpus: deterministic, clustered rows only, one keeper per cluster") {
    val r1 = SparkEntry.queries("q118_semdedup")(spark, sf)
      .collect().map(_.toString).toSeq
    val r2 = SparkEntry.queries("q118_semdedup")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(r1 === r2, "q118 unstable across runs")
    assert(r1.nonEmpty, "threshold too high for the synthetic corpus — operator unobservable")
    val rows = SparkEntry.queries("q118_semdedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    rows.groupBy(_._2).foreach { case (cl, rs) =>
      assert(rs.count(_._3 === 1L) === 1, s"cluster $cl keeper count != 1")
      assert(rs.length >= 2, s"cluster $cl has fewer than 2 members")
    }
  }
}
