package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) an equivalent DuckDB oracle run by the driver
  * over the same parquet tables. Column names/types must match between the
  * two — the driver sorts columns by name and hash-compares values.
  */
final case class Q(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, doc: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, doc, fn, Some(oracle))
  def noOracle(name: String, doc: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, doc, fn, None)
}
