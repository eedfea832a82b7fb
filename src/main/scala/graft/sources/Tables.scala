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

  def apply(spark: SparkSession, dir: String, name: String): DataTable =
    DataTable(df(spark, dir, name))
}
