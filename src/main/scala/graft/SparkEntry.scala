package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory itself lives in `graft.operators.*` (one `Q` per
  * implemented operator from SURVEY.md §2, each with a DuckDB oracle when
  * the semantics are SQL-expressible).
  */
object SparkEntry {

  private def registry: Seq[Q] =
    operators.Relational.all ++ operators.Relational2.all ++
      operators.TrainingData.all ++ operators.Curation.all ++
      operators.Prep.all ++ operators.WebGraph.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's dashboard "recent checks" (main.py:139-151) shape.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q23_dashboard_recent")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
