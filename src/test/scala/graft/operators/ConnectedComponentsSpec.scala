package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The min-label/pointer-jumping engine (q64, q65, q118's duplicate
  * groups) against a reference union-find on deterministic random
  * graphs — including long chains, whose diameter is what the pointer
  * jumping exists to collapse in O(log d) rounds.
  */
class ConnectedComponentsSpec extends AnyFunSuite with SparkSpec {

  private def refComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonical label = min node id of the component
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => val m = ns.min; ns.map(_ -> m) }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toDF("id_a", "id_b")
    val bidir = e.unionByName(
      e.select(org.apache.spark.sql.functions.col("id_b").as("id_a"),
               org.apache.spark.sql.functions.col("id_a").as("id_b"))).persist()
    val labels = Curation.connectedComponents(bidir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    bidir.unpersist()
    labels
  }

  test("random graphs: labels match a reference union-find") {
    val rnd = new scala.util.Random(20260813L)
    (0 until 3).foreach { trial =>
      val n = 60
      val edges = Seq.fill(50)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      assert(run(edges) === refComponents(edges), s"trial $trial diverged")
    }
  }

  test("a 64-node chain collapses to one component within the round bound") {
    // worst-case diameter for the 20-round cap: pointer jumping halves
    // remaining path length, so 2^20 >> 64 — but a plain (non-jumping)
    // propagation would need 63 rounds and FAIL this
    val chain = (0L until 63L).map(i => (i, i + 1))
    val labels = run(chain)
    assert(labels.values.toSet === Set(0L), "chain did not converge to one label")
    assert(labels.keySet === (0L to 63L).toSet)
  }
}
