package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All declared queries live in `graft.queries.*` as `Q` values (Spark
  * implementation + DuckDB oracle SQL); this object just aggregates them.
  */
object SparkEntry {

  private def groups: Seq[Q] =
    RelationalQueries.all ++ ScalarQueries.all ++ DeltaQueries.all ++
      CommandQueries.all ++ TextQueries.all ++ SimilarityQueries.all ++
      MultimodalQueries.all ++ StreamingQueries.all ++ OperatorQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    groups.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
