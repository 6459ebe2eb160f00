package graft.operators

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** q137 packed token IDs: the ID stream must be an exact, reversible
  * re-encoding of q129's packed text — decode (vocabulary inverted,
  * id-0 separators restored to spaces) and the text must equal q129's
  * reassembled sequences byte-for-byte. Also pins the vocabulary
  * numbering convention the oracle mirrors (0 = separator, chars 1..C
  * in UTF-8 order, merge step i = C+i).
  */
class PackedIdsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def splitOnSep(ids: Seq[Long]): Seq[Seq[Long]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Long]]
    var cur = Vector.empty[Long]
    ids.foreach { i =>
      if (i == 0L) { out += cur; cur = Vector.empty }
      else cur :+= i
    }
    out += cur
    out.toSeq
  }

  test("vocabulary numbering: injective, chars 1..C in UTF-8 order, merges C+step") {
    val vocab = Prep.tokenVocab(spark, dir)
    val merges = Prep.bpeMergesCached(spark, dir)
    assert(!vocab.valuesIterator.contains(0L), "id 0 is reserved for the separator")
    assert(vocab.values.toSeq.distinct.size == vocab.size, "sym -> id is injective")
    val chars = vocab.filter(_._1.length == 1)
    val c = chars.size.toLong
    assert(chars.values.toSeq.sorted == (1L to c).toSeq)
    // merge ids follow the char block unless the merged string duplicates
    // an earlier merge (then the smaller id wins)
    merges.foreach { case (step, l, r, _) =>
      val id = vocab(l + r)
      assert(id <= c + step && id > c)
    }
  }

  test("packed token IDs decode back to q129's reassembled text") {
    val packed = Curation.packedSequences(spark, dir)
      .select("split", "bin", "tokens").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getSeq[String](2)).toMap
    val idsByBin = Curation.packedTokenIds(spark, dir)
      .select("split", "bin", "ids", "n_ids").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getSeq[Long](2), r.getLong(3)))
      .toMap
    assert(idsByBin.keySet == packed.keySet, "same (split, bin) universe")
    val inv: Map[Long, String] = Prep.tokenVocab(spark, dir).map(_.swap)
    packed.foreach { case (key, toks) =>
      val (ids, nIds) = idsByBin(key)
      assert(nIds == ids.size)
      val decoded = splitOnSep(ids).map(_.map(inv).mkString)
      assert(decoded.size == toks.size, s"word count at $key")
      assert(decoded.mkString(" ") == toks.mkString(" "), s"text at $key")
    }
  }
}
