package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** q150 cluster-respecting split: leakage-free by construction. */
class ClusterSplitSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  private lazy val assign = q("q150_cluster_split")
    .select("doc_id", "cluster_id", "split").collect()
    .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("every doc is assigned exactly once") {
    val ids = graft.Tables.documents(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(assign.keySet == ids)
  }

  test("ZERO leakage: every q38 near-dup pair lands in one split (and one cluster)") {
    val pairs = q("q38_ngram_jaccard")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(assign(a)._1 == assign(b)._1, s"pair ($a,$b) split clusters")
      assert(assign(a)._2 == assign(b)._2, s"pair ($a,$b) leaks")
    }
  }

  test("clustered docs inherit the representative's q59 split; singletons keep their own") {
    val q59 = q("q59_train_split").select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assign.foreach { case (doc, (cid, split)) =>
      assert(split == q59(cid), s"doc $doc: split != representative's")
    }
    val clustered = q("q64_dedup_clusters").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assign.foreach { case (doc, (cid, _)) =>
      if (!clustered(doc)) assert(cid == doc, s"singleton $doc not own rep")
    }
  }
}
