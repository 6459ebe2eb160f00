package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q147 split-leakage, q148 length-bucketed batching, q149 annealed
  * mixture schedule: invariants the DuckDB oracle's hash-compare can't
  * state directly — subset/consistency against their ingredient
  * queries, the packing-shape bounds, and exact apportionment algebra.
  */
class ScheduleSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  // ---- q147 ---------------------------------------------------------

  test("q147: leaked pairs are exactly the q38 pairs whose q59 splits differ") {
    val splits = q("q59_train_split")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = q("q38_ngram_jaccard")
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expected = pairs.filter { case ((a, b), _) => splits(a) != splits(b) }
    val leaked = q("q147_split_leakage")
      .select("id_a", "id_b", "split_a", "split_b", "jaccard").collect()
    assert(leaked.map(r => (r.getLong(0), r.getLong(1))).toSet ==
             expected.keySet)
    leaked.foreach { r =>
      assert(r.getString(2) == splits(r.getLong(0)) &&
               r.getString(3) == splits(r.getLong(1)))
      assert(r.getString(2) != r.getString(3))
      assert(r.getDouble(4) == pairs((r.getLong(0), r.getLong(1))))
    }
  }

  // ---- q148 ---------------------------------------------------------

  test("q148: bucket ceilings, batch capacity, and dense deterministic numbering") {
    val rows = q("q148_length_buckets")
      .select("split", "bucket_max", "batch_id", "doc_id", "n_tok").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
                 r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    def pow2ceil(n: Long): Long = {
      var p = 1L; while (p < n) p <<= 1; math.max(16L, p)
    }
    rows.foreach { case (_, bmax, _, _, nTok) =>
      assert(bmax == pow2ceil(nTok), s"bucket for len $nTok")
      assert(bmax >= nTok && bmax >= 16)
    }
    // every batch holds <= capacity docs, and a full batch pads to
    // <= 4096 tokens unless the bucket itself exceeds the budget
    // (capacity 1: long docs ride alone)
    rows.groupBy { case (sp, bmax, batch, _, _) => (sp, bmax, batch) }
      .foreach { case ((_, bmax, _), members) =>
        val cap = math.max(1L, 4096L / bmax)
        assert(members.length <= cap)
        if (cap > 1) assert(bmax * members.length <= 4096)
      }
    // batch ids are dense 0..k per (split, bucket), filled in doc_id
    // order: doc i's batch is (rank within bucket) / capacity
    rows.groupBy { case (sp, bmax, _, _, _) => (sp, bmax) }
      .foreach { case ((_, bmax), members) =>
        val cap = math.max(1L, 4096L / bmax)
        members.sortBy(_._4).zipWithIndex.foreach {
          case ((_, _, batch, _, _), i) => assert(batch == i / cap)
        }
      }
  }

  // ---- q149 ---------------------------------------------------------

  private lazy val anneal = q("q149_anneal_schedule")
    .select("source", "epoch", "alloc_tok").collect()
    .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("q149: every epoch apportions the budget EXACTLY") {
    val epochs = anneal.keys.map(_._2).toSet
    assert(epochs == (1L to Prep.MaxEpochs).toSet)
    epochs.foreach { e =>
      val total = anneal.collect { case ((_, ep), a) if ep == e => a }.sum
      assert(total == Prep.EpochBudget, s"epoch $e sums to $total")
    }
  }

  test("q149: epoch 1 is the natural share, the last epoch uniform (each within the +-1 apportionment bound)") {
    val natural = graft.Tables.documents(spark, dir)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = natural.values.sum
    val s = natural.size
    natural.foreach { case (src, nS) =>
      val nat = Prep.EpochBudget.toDouble * nS / t
      assert(math.abs(anneal((src, 1L)) - nat) <= 1.0,
             s"epoch-1 share for $src")
      val uni = Prep.EpochBudget.toDouble / s
      assert(math.abs(anneal((src, Prep.MaxEpochs)) - uni) <= 1.0,
             s"final-epoch share for $src")
    }
  }

  test("q149: intermediate epochs interpolate linearly (midpoint of the anchors, within rounding)") {
    val srcs = anneal.keys.map(_._1).toSet
    // MaxEpochs = 4: epochs 2 and 3 sit at 1/3 and 2/3 between the
    // epoch-1 and epoch-4 anchors
    srcs.foreach { src =>
      val a1 = anneal((src, 1L)).toDouble
      val a4 = anneal((src, Prep.MaxEpochs)).toDouble
      val e2 = a1 + (a4 - a1) / 3
      val e3 = a1 + 2 * (a4 - a1) / 3
      assert(math.abs(anneal((src, 2L)) - e2) <= 2.0, s"epoch-2 for $src")
      assert(math.abs(anneal((src, 3L)) - e3) <= 2.0, s"epoch-3 for $src")
    }
  }

  // ---- q151 ---------------------------------------------------------

  test("q151: fertility >= 1 everywhere and word totals match the corpus") {
    val rows = q("q151_bpe_fertility")
      .select("source", "n_words", "n_subids", "fertility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"subids < words for ${r.getString(0)}")
      assert(r.getDouble(3) >= 1.0)
    }
    val totalWords = graft.Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(rows.map(_.getLong(1)).sum == totalWords)
  }

  // ---- q152 ---------------------------------------------------------

  test("q152: agrees with q145 and proves exact-fill (only the final bin per split is partial)") {
    val rep = q("q152_pack_efficiency")
      .select("split", "n_bins", "n_tokens", "n_docs", "n_bin_crossings",
              "fill_share").collect()
      .map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
             r.getDouble(5))).toMap
    assert(rep.keySet == Set("train", "val", "test"))
    val bounds = q("q145_pack_boundaries")
      .select("split", "bin", "n_pieces").collect()
      .groupBy(_.getString(0))
    rep.foreach { case (sp, (bins, toks, docs, crossings, fill)) =>
      val b = bounds(sp)
      assert(b.length.toLong == bins, s"$sp bin count vs q145")
      assert(b.map(_.getLong(2)).sum == docs + crossings,
             s"$sp piece count vs q145")
      assert(fill > 0.0 && fill <= 1.0)
      // exact-fill: all bins but the last are full, so
      // tokens > (bins - 1) * budget
      assert(toks > (bins - 1) * Prep.PackBudget, s"$sp leaks pad slots")
    }
  }

  // ---- q153 ---------------------------------------------------------

  test("q153: every realized epoch cell stays inside its q149 grant's decomposition bounds") {
    val natural = graft.Tables.documents(spark, dir)
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("n_s"),
           count(lit(1)).as("n_d"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exec = q("q153_anneal_execute")
      .select("source", "epoch", "n_instances", "n_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    anneal.foreach { case ((src, ep), alloc) =>
      val (avail, nDocs) = natural(src)
      val full = alloc / avail
      val (inst, toks) = exec.getOrElse((src, ep), (0L, 0L))
      assert(toks >= full * avail && toks <= (full + 1) * avail,
             s"($src, $ep): tokens $toks outside [${full * avail}, ${(full + 1) * avail}] for grant $alloc")
      assert(inst >= full * nDocs && inst <= (full + 1) * nDocs,
             s"($src, $ep): instances $inst outside the full-pass bounds")
      if (alloc == 0) assert(!exec.contains((src, ep)))
    }
    // the realized totals track the grants: summed over the schedule,
    // the fractional-pass noise stays well under one corpus pass
    val grantTotal = anneal.values.sum
    val realized = exec.values.map(_._2).sum
    val maxAvail = natural.values.map(_._1).max
    assert(math.abs(realized - grantTotal) <=
             natural.size * Prep.MaxEpochs * maxAvail / 4,
           s"realized $realized vs granted $grantTotal")
  }

  // ---- q154 ---------------------------------------------------------

  test("q154: drift cosines are valid and match a naive double-centroid recompute") {
    val drift = q("q154_embedding_drift")
      .select("source", "drift_cos").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(drift.nonEmpty)
    drift.values.foreach(c => assert(c >= -1.0 && c <= 1.0))
    // naive recompute: plain double centroids per source vs corpus
    val rows = graft.Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .join(graft.Tables.documents(spark, dir).select("doc_id", "source"),
            "doc_id")
      .select("source", "embedding").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1).map(_.toDouble))
    val dims = rows.head._2.length
    def centroid(vs: Seq[Seq[Double]]) =
      (0 until dims).map(i => vs.map(_(i)).sum / vs.length)
    val global = centroid(rows.map(_._2).toSeq)
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    rows.groupBy(_._1).foreach { case (src, vs) =>
      val naive = cos(centroid(vs.map(_._2).toSeq), global)
      assert(math.abs(drift(src) - naive) < 1e-3,
             s"$src: scaled-int $src=${drift(src)} vs naive $naive")
    }
  }
}
