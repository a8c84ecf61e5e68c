package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every module's declared queries; `oracleSql`
  * holds the DuckDB-runnable twin for each SQL-expressible one.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q10_hash_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ OperatorQueries.queries ++
      ExtensionQueries.queries ++ CoverageQueries.queries ++
      SketchQueries.queries ++ ApiQueries.queries ++
      RetrievalQueries.queries ++ AnalyticsQueries.queries ++
      WarcQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracleSql ++ OperatorQueries.oracleSql ++
      ExtensionQueries.oracleSql ++ CoverageQueries.oracleSql ++
      SketchQueries.oracleSql ++ ApiQueries.oracleSql ++
      RetrievalQueries.oracleSql ++ AnalyticsQueries.oracleSql ++
      WarcQueries.oracleSql
}
