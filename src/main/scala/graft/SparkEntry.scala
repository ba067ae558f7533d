package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.OmeOps
import graft.schema.Fixtures
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query: describe the mixed synthetic OME corpus (all four
    * classification branches); driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    OmeOps.describe(Fixtures.mixedCorpus(spark))
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.QueryDefs.queries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.QueryDefs.oracleSql
}
