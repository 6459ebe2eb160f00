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
}
