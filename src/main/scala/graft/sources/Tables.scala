package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType
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

  /** Epoch-microsecond LONG for the events `ts` column, portable across
    * both testdata vintages: timestamp[ns] parquet surfaces as a nano
    * LONG under `spark.sql.legacy.parquet.nanosAsLong` (integer `div` —
    * ns since epoch exceeds 2^53, double math would corrupt it);
    * timestamp[us] surfaces as TIMESTAMP_NTZ, where the cast to
    * TIMESTAMP is the identity on the stored micros because the session
    * timezone is pinned UTC everywhere (Verify/Bench/SparkSpec). Either
    * way the value equals DuckDB's `epoch_us(ts)`, the oracle mapping. */
  def tsMicros(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000")
    case _        => expr("unix_micros(cast(ts as timestamp))")
  }

  /** TIMESTAMP twin of [[tsMicros]] for event-time operators (window /
    * session_window / watermark need a timestamp column, not micros). */
  def tsStamp(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("timestamp_micros(ts div 1000)")
    case _        => expr("cast(ts as timestamp)")
  }

  /** `events` plus a proper microsecond timestamp column `ts_utc`
    * (schema-adaptive — see [[tsStamp]]). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val e = df(spark, dir, "events")
    e.withColumn("ts_utc", tsStamp(e))
  }

  /** `events` plus the epoch-micro LONG column `ts_us` (schema-adaptive
    * — see [[tsMicros]]); the integer-arithmetic twin of [[events]]. */
  def eventsUs(spark: SparkSession, dir: String): DataFrame = {
    val e = df(spark, dir, "events")
    e.withColumn("ts_us", tsMicros(e))
  }

  def apply(spark: SparkSession, dir: String, name: String): DataTable =
    DataTable(df(spark, dir, name))
}
