package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** q146 in-band document separators: the packing must be q137's exactly
  * — stripping every separator restores q137's ids bit-for-bit;
  * separator counts match an INDEPENDENT derivation (the q122 verdict's
  * first_bin, which never touches the piece stream); and splitting the
  * per-split concatenated stream at separators losslessly reassembles
  * every budget-selected document's own ID sequence in stream order.
  */
class PackEosSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val eos = Curation.packedTokenIdsSep(spark, dir)
    .select("split", "bin", "ids", "n_docs").collect()
    .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getSeq[Long](2), r.getLong(3)))
    .toMap

  test("stripping separators restores q137's ids bit-for-bit") {
    val plain = Curation.packedTokenIds(spark, dir)
      .select("split", "bin", "ids").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    assert(eos.keySet == plain.keySet, "same (split, bin) universe")
    eos.foreach { case (key, (ids, _)) =>
      assert(ids.filterNot(_ == Curation.EosId) == plain(key),
             s"strip != q137 at $key")
    }
  }

  test("separator count per bin == docs beginning in the bin (independent derivation)") {
    val firstBins = Curation.trainingSetVerdict(spark, dir)
      .filter(org.apache.spark.sql.functions.col("keep") === 1L)
      .select("split", "first_bin").collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .view.mapValues(_.length.toLong).toMap
    eos.foreach { case (key, (ids, nDocs)) =>
      assert(nDocs == firstBins.getOrElse(key, 0L), s"n_docs at $key")
      assert(ids.count(_ == Curation.EosId) == nDocs,
             s"in-band separator count at $key")
    }
  }

  test("splitting the stream at separators reassembles every selected doc's ids") {
    import org.apache.spark.sql.functions.col
    // per split, bins concatenate in bin order into the full stream.
    // q137's per-bin assembly strips each bin's LEADING word-boundary
    // id-0 (a bin is self-contained), so restoring the original stream
    // means rejoining bins with that id-0 put back at every junction
    val streams = eos.toSeq.groupBy(_._1._1)
      .view.mapValues(_.sortBy(_._1._2).map(_._2._1.toVector)
        .reduce((a, b) => a ++ Vector(0L) ++ b)).toMap
    // expected: each selected doc's OWN id sequence (words joined by the
    // id-0 boundary — tokenizedDocs' per-doc assembly over the same
    // vocabulary), in stream order = doc_id order within the split
    val selected = Curation.trainingSetVerdict(spark, dir)
      .filter(col("keep") === 1L).select("doc_id", "split")
      .join(graft.Tables.documents(spark, dir).select("doc_id", "text"),
            "doc_id")
    val docIds = Curation.tokenizedDocs(selected, spark, dir)
      .select("split", "doc_id", "ids").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    val orderByStream = docIds.keys.toSeq.groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    streams.foreach { case (split, stream) =>
      // the split's first doc is a doc start, so the stream begins with
      // a separator and the first segment is empty
      val segments = {
        val out = scala.collection.mutable.ArrayBuffer.empty[Vector[Long]]
        var cur = Vector.empty[Long]
        stream.foreach { i =>
          if (i == Curation.EosId) { out += cur; cur = Vector.empty }
          else cur :+= i
        }
        out += cur
        out.toSeq
      }
      assert(segments.head.isEmpty, s"$split stream must open with a separator")
      val docsInOrder = orderByStream(split)
      assert(segments.tail.size == docsInOrder.size, s"doc count in $split")
      segments.tail.zip(docsInOrder).zipWithIndex.foreach {
        case ((seg, docId), i) =>
          // every non-final segment closes with the ordinary
          // word-boundary id-0 that sat between the two documents in
          // the restored stream (the separator is INSERTED after it,
          // never replaces it — that's what makes strip-equality
          // exact); it belongs to the encoding, not to either document
          val own =
            if (i < docsInOrder.size - 1) {
              assert(seg.lastOption.contains(0L),
                     s"doc boundary must close with id 0 " +
                     s"($split, after doc $docId)")
              seg.dropRight(1)
            } else seg
          assert(own == docIds((split, docId)).toVector,
                 s"doc $docId reassembly in $split")
      }
    }
  }
}
