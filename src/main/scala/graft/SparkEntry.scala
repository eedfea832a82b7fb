package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears as a `queries` entry
  * (run by Verify/Bench) with a DuckDB oracle in `oracleSql` where the
  * semantics are ANSI-SQL-expressible. Column aliases match between the two
  * on purpose: the driver's compare hashes columns by name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exercises scan → filter → grouped aggregate → sort through the verb
    * layer (the reference's canonical pipeline, SURVEY.md §7.3). */
  def entry(spark: SparkSession): DataFrame =
    Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_quantity") < 45)
      .groupBy("l_returnflag", "l_linestatus")
      .summarize(
        "sum_qty" -> sum(col("l_quantity")),
        "n" -> count(lit(1)))
      .df

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
