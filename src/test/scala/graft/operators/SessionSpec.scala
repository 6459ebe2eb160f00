package graft.operators

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The hand-rolled sessionization (q24: lag + running break sum, DuckDB-
  * oracle-checked) and Spark's built-in `session_window` must agree on
  * session structure — two independent spellings of the same semantics.
  */
class SessionSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("session_window and gap-break sessionization produce identical sessions") {
    val builtin = Tables.events(spark, sf)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap

    val handRolled = SparkEntry.queries("q24_sessionize")(spark, sf)
      .select(col("user_id"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap

    assert(builtin === handRolled)
  }
}
