package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.api.DataTable

/** Loader for the driver's parquet tables (TESTDATA.md). Parquet scans give
  * Catalyst pushdown/pruning for free; at cluster scale the same call reads
  * a partitioned directory tree unchanged. */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def df(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events` with its nano-long `ts` (see `spark.sql.legacy.parquet.
    * nanosAsLong` in Verify/Bench) plus a proper microsecond timestamp
    * column `ts_utc`. Integer division — ns since epoch exceeds 2^53, so
    * double math would corrupt it. */
  def events(spark: SparkSession, dir: String): DataFrame =
    df(spark, dir, "events")
      .withColumn("ts_utc", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))

  def apply(spark: SparkSession, dir: String, name: String): DataTable =
    DataTable(df(spark, dir, name))
}
