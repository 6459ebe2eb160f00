package graft.functions

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("custom functions are callable from pure SQL after register()") {
    Functions.register(spark)
    Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
        (3L, "spark catalyst plans"))
      .toDF("id", "text").createOrReplaceTempView("fn_docs")
    val rows = spark.sql(
      """SELECT id, simhash64(split(text, ' ')) AS sh,
        |  size(minhash_sig(split(text, ' '), 32)) AS siglen
        |FROM fn_docs""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.find(_._1 == 1L).map(_._2) === rows.find(_._1 == 2L).map(_._2))
    assert(rows.forall(_._3 === 32))

    val ham = spark.sql("SELECT hamming64(7, 4)").head().getInt(0)
    assert(ham === 2)

    val top = spark.sql(
      """SELECT top_k_by(text, id, 2) FROM fn_docs""").head().getSeq[String](0)
    assert(top === Seq("spark catalyst plans", "the quick brown fox"))

    val vec = spark.sql(
      """SELECT round(cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS c,
        |  sq_dist(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS d,
        |  norm_sq(array(3.0D, 4.0D)) AS n,
        |  srp_sig(array(1.0D, -1.0D), 8, 0) AS sig""".stripMargin).head()
    assert(vec.getDouble(0) === 1.0)
    assert(vec.getDouble(1) === 25.0)
    assert(vec.getDouble(2) === 25.0)
    assert(vec.getLong(3) >= 0L)

    // bloom build + probe end to end in SQL: the filter rides as an
    // uncorrelated scalar subquery (the shape might_contain requires)
    val bloomHits = spark.sql(
      """SELECT id FROM fn_docs
        |WHERE might_contain(
        |  (SELECT bloom_agg(xxhash64(text), 100L, 8192L)
        |   FROM fn_docs WHERE id = 3),
        |  xxhash64(text))""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(bloomHits === Set(3L), s"bloom SQL probe returned $bloomHits")
  }
}
