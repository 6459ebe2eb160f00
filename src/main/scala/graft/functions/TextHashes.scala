package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit string hashing + the custom Catalyst expressions for
  * document fingerprinting (SimHash) and MinHash signatures.
  *
  * Why custom expressions instead of built-in higher-order functions: a
  * built-in formulation (`transform(sequence(1,k), i -> array_min(transform(
  * tokens, t -> hash(t, i))))`) evaluates k passes over the token array per
  * row and allocates k intermediate arrays; these expressions do one pass
  * and no allocation beyond the output, which is what survives a 100 TB
  * corpus. Hash family is Kirsch-Mitzenmacher double hashing
  * (h_i = h1 + i*h2) over a FNV-1a/avalanche base — standard public
  * constructions.
  */
object TextHashes {

  /** FNV-1a 64-bit over UTF-8 bytes, finalized with the splitmix64
    * avalanche so low bits are well-mixed (FNV alone has weak low bits).
    */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** splitmix64 finalizer. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** SimHash over a token array: per 64-bit position, tokens vote +1/-1 by
    * their hash bit; the fingerprint sets bits with positive tallies.
    * Near-duplicate texts differ in few bit positions (small Hamming
    * distance).
    */
  def simhash(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val tally = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** MinHash signature of length k over a token/shingle array, single pass:
    * h_i(t) = h1(t) + i*h2(t) (double hashing), sig[i] = min over tokens.
    * Empty/null-only arrays yield Long.MaxValue slots (no tokens observed).
    */
  def minhashSig(tokens: ArrayData, k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h1 = hash64(tokens.getUTF8String(i))
        val h2 = mix64(h1) | 1L // odd => full-period step
        var j = 0
        var h = h1
        while (j < k) {
          if (h < sig(j)) sig(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    sig
  }

  def popcount64(x: Long): Int = java.lang.Long.bitCount(x)

  /** Signed-random-projection signature body (see [[SrpSig]]). Static so the
    * generated code can call it directly and the expression stays inside
    * whole-stage codegen.
    */
  def srpSig(v: ArrayData, bits: Int, table: Int, isFloat: Boolean): Long = {
    val dims = v.numElements()
    val acc = new Array[Double](bits)
    var j = 0
    while (j < dims) {
      if (!v.isNullAt(j)) {
        val x = if (isFloat) v.getFloat(j).toDouble else v.getDouble(j)
        var i = 0
        while (i < bits) {
          val sign = if ((mix64(
            table.toLong * 0x9e3779b9L + i.toLong * 65537L + j) & 1L) == 0L) 1.0 else -1.0
          acc(i) += x * sign
          i += 1
        }
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < bits) {
      out = (out << 1) | (if (acc(i) >= 0) 1L else 0L)
      i += 1
    }
    out
  }

  /** Distinct word n-gram shingle body (see [[WordShingles]]). Static for
    * codegen, same reason as [[srpSig]].
    */
  def wordShingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val sep = UTF8String.fromString(" ")
    def join(from: Int, len: Int): UTF8String = {
      val parts = new Array[UTF8String](len)
      var j = 0
      while (j < len) {
        parts(j) = if (toks.isNullAt(from + j)) UTF8String.EMPTY_UTF8
                   else toks.getUTF8String(from + j)
        j += 1
      }
      UTF8String.concatWs(sep, parts: _*)
    }
    if (m < n) return new GenericArrayData(Array[Any](join(0, m)))
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i + n <= m) {
      seen.add(join(i, n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** All g-gram hashes of a token array in ONE O(n) pass (r20): each
    * token hashes once ([[hash64]]), a degree-(g-1) polynomial in an odd
    * 64-bit base slides over the hashes (mod 2^64 — subtract the
    * outgoing term times B^(g-1), shift, add the incoming term), and
    * every window value is finalized with [[mix64]]. Output length is
    * n-g+1 (empty below g tokens). Replaces the O(n*g) per-position
    * slice+join+digest spelling wherever the gram identity stays
    * ENGINE-LOCAL (dedup/contamination classes whose oracles recompute
    * their own identities): equal windows collide by construction,
    * unequal windows collide with ~2^-64 probability — the q38
    * token-hash convention, verified collision-free on the
    * deterministic oracle corpora by the correctness gate.
    */
  def rollingGramHashes(toks: ArrayData, g: Int): ArrayData = {
    val n = toks.numElements()
    if (n < g) return new GenericArrayData(Array.empty[Long])
    val B = 0x100000001b3L // FNV prime, odd
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = hash64(toks.getUTF8String(i)); i += 1 }
    var bg = 1L // B^(g-1): weight of the outgoing term
    i = 1
    while (i < g) { bg *= B; i += 1 }
    val out = new Array[Long](n - g + 1)
    var h = 0L
    i = 0
    while (i < g) { h = h * B + th(i); i += 1 }
    out(0) = mix64(h)
    i = g
    while (i < n) {
      h = (h - th(i - g) * bg) * B + th(i)
      out(i - g + 1) = mix64(h)
      i += 1
    }
    new GenericArrayData(out)
  }

  // ---- Column API ----------------------------------------------------

  private def e(c: Column): Expression = Bridge.expression(c)

  def simhash64(tokens: Column): Column = Bridge.column(SimHash64(e(tokens)))

  def minhash_sig(tokens: Column, k: Int): Column =
    Bridge.column(MinHashSig(e(tokens), k))

  def hamming64(a: Column, b: Column): Column =
    Bridge.column(Hamming64(e(a), e(b)))

  def word_shingles(tokens: Column, n: Int): Column =
    Bridge.column(WordShingles(e(tokens), n))

  def srp_sig(vec: Column, bits: Int, table: Int): Column =
    Bridge.column(SrpSig(e(vec), bits, table))

  def rolling_gram_hash(tokens: Column, g: Int): Column =
    Bridge.column(RollingGramHash(e(tokens), g))
}

/** `rolling_gram_hash(tokens, g)` — all g-gram hashes of a token array in
  * one O(n) pass ([[TextHashes.rollingGramHashes]]); array<long>, length
  * n-g+1, empty below g tokens. Codegen'd static call, non-null on
  * non-null input.
  */
case class RollingGramHash(child: Expression, g: Int)
    extends UnaryExpression {
  require(g >= 1, s"gram width out of range: $g")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.rollingGramHashes(input.asInstanceOf[ArrayData], g)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashes.rollingGramHashes($c, $g)")
  override protected def withNewChildInternal(c: Expression): RollingGramHash =
    copy(child = c)
  override def prettyName: String = "rolling_gram_hash"
}

/** Signed-random-projection LSH signature of an array<double> vector:
  * bit_i = sign(Σ_j v_j · s_ij) with s_ij = ±1 derived from splitmix64 of
  * (table, i, j) — deterministic, no stored hyperplanes. One pass over the
  * vector per row vs the higher-order-function spelling's bits×dims
  * interpreted lambda evaluations.
  */
case class SrpSig(child: Expression, bits: Int, table: Int)
    extends UnaryExpression with VecArg {
  require(bits > 0 && bits <= 63, s"srp bits out of range: $bits")
  override def dataType: DataType = LongType
  private lazy val cF = isFloatArray(child.dataType)
  override def nullSafeEval(input: Any): Any =
    TextHashes.srpSig(input.asInstanceOf[ArrayData], bits, table, cF)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.srpSig($c, $bits, $table, $cF)")
  override protected def withNewChildInternal(c: Expression): SrpSig = copy(child = c)
  override def prettyName: String = "srp_sig"
}

/** Distinct word n-gram shingles of an array<string>, one pass.
  *
  * The built-in spelling (`array_distinct(transform(sequence(...), i =>
  * concat_ws(' ', slice(words, i+1, n))))`) materializes a slice array per
  * shingle and re-walks the token array n times per position; this builds
  * each shingle string directly and dedups with one hash set. Shorter-
  * than-n inputs yield the single joined shingle (the built-in helper's
  * behavior, kept for parity).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {
  require(n > 0 && n <= 32, s"shingle width out of range: $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHashes.wordShingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.wordShingles($c, $n)")
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  override def prettyName: String = "word_shingles"
}

/** 64-bit SimHash fingerprint of an array<string> of tokens.
  * Generates a direct static call so the expression stays inside
  * whole-stage codegen (a CodegenFallback would split the stage).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHashes.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** MinHash signature (array<bigint>, length k) of an array<string>. */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {
  require(k > 0 && k <= 1024, s"minhash k out of range: $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(TextHashes.minhashSig(input.asInstanceOf[ArrayData], k))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHashes.minhashSig($c, $k))")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

/** Hamming distance between two 64-bit fingerprints. */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  // tolerate int inputs: no declared input types means no implicit Cast
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHashes.popcount64(
      a.asInstanceOf[Number].longValue ^ b.asInstanceOf[Number].longValue)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "hamming64"
}
