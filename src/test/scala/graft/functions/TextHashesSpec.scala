package graft.functions

import graft.SparkSpec
import graft.functions.TextHashes.{hamming64, minhash_sig, simhash64, word_shingles}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextHashesSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("simhash: identical token arrays hash identically; near texts are near") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox leaps over the lazy dog again and again"),
      (4L, "completely different words about spark catalyst execution plans")
    ).toDF("id", "text").withColumn("h", simhash64(split($"text", " ")))
    val h = df.select("id", "h").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) === h(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L), h(3L)) < ham(h(1L), h(4L)),
           "one-word edit must be closer than unrelated text")
  }

  test("minhash: signature estimates jaccard within tolerance") {
    val a = (1 to 60).map(i => s"tok$i")
    val b = (21 to 80).map(i => s"tok$i") // |∩|=40, |∪|=80 -> J=0.5
    val df = Seq((1L, a), (2L, b)).toDF("id", "tok")
      .withColumn("sig", minhash_sig($"tok", 256))
    val sigs = df.orderBy("id").select("sig").as[Seq[Long]].collect()
    val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 256.0
    assert(math.abs(est - 0.5) < 0.15, s"estimate $est too far from 0.5")
  }

  test("hamming64 expression counts differing bits") {
    val got = Seq((0L, -1L), (5L, 4L), (7L, 7L)).toDF("a", "b")
      .select(hamming64($"a", $"b")).as[Int].collect()
    assert(got.sameElements(Array(64, 1, 0)))
  }

  test("word_shingles matches the built-in HOF spelling (distinct, ordered)") {
    val df = Seq(
      "a b c d e",
      "a b",            // shorter than n -> single joined shingle
      "x x x x",        // duplicate shingles collapse
      "one"
    ).toDF("text").withColumn("w", split($"text", " "))
    val builtin = df.select(
      array_distinct(
        when(size($"w") >= 3,
          transform(sequence(lit(0), size($"w") - 3),
            i => concat_ws(" ", slice($"w", i + 1, lit(3)))))
          .otherwise(array(concat_ws(" ", $"w")))).as("s"))
    val custom = df.select(word_shingles($"w", 3).as("s"))
    assert(custom.collect().map(_.getSeq[String](0)).toSeq ===
           builtin.collect().map(_.getSeq[String](0)).toSeq)
  }

  test("hash64 avalanche: single-char difference flips ~half the bits") {
    import org.apache.spark.unsafe.types.UTF8String
    val h1 = TextHashes.hash64(UTF8String.fromString("shingle a"))
    val h2 = TextHashes.hash64(UTF8String.fromString("shingle b"))
    val d = java.lang.Long.bitCount(h1 ^ h2)
    assert(d > 16 && d < 48)
  }

  test("rolling_gram_hash: window identity matches a naive per-window recompute") {
    import graft.functions.TextHashes.rolling_gram_hash
    // naive reference: same polynomial + finalizer, recomputed per window
    def naive(toks: Seq[String], g: Int): Seq[Long] = {
      val th: Seq[Long] = toks.map(t => TextHashes.hash64(
        org.apache.spark.unsafe.types.UTF8String.fromString(t)))
      (0 to toks.length - g).map { i =>
        var h = 0L
        for (j <- i until i + g) h = h * 0x100000001b3L + th(j)
        TextHashes.mix64(h)
      }
    }
    val toks = Seq("a", "b", "c", "a", "b", "c", "d", "xx", "b", "c")
    for (g <- Seq(1, 3, 4, 10)) {
      val got = Seq(Tuple1(toks)).toDF("tok")
        .select(rolling_gram_hash($"tok", g)).as[Seq[Long]].collect()(0)
      assert(got === naive(toks, g), s"g=$g rolling != naive")
    }
    // length contract: n-g+1, empty below g
    val short = Seq(Tuple1(Seq("a", "b"))).toDF("tok")
      .select(rolling_gram_hash($"tok", 3)).as[Seq[Long]].collect()(0)
    assert(short.isEmpty)
  }

  test("rolling_gram_hash: equal windows collide, shifted/unequal windows separate") {
    import graft.functions.TextHashes.rolling_gram_hash
    // the repeated run a b c yields equal 3-gram hashes at both sites
    val toks = Seq("a", "b", "c", "z", "a", "b", "c")
    val hs = Seq(Tuple1(toks)).toDF("tok")
      .select(rolling_gram_hash($"tok", 3)).as[Seq[Long]].collect()(0)
    assert(hs.length === 5)
    assert(hs(0) === hs(4), "identical 3-token runs must hash equal")
    // all other windows are pairwise distinct (and token-order-sensitive:
    // a run and its rotation must not collide)
    assert(hs.distinct.length === 4)
    val rot = Seq(Tuple1(Seq("b", "c", "a"))).toDF("tok")
      .select(rolling_gram_hash($"tok", 3)).as[Seq[Long]].collect()(0)
    assert(rot(0) !== hs(0), "rotation must hash differently")
  }
}
