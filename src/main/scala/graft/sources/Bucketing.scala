package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: co-locate fact tables on their join key so
  * repeated large-large joins and aggregations run WITHOUT a shuffle —
  * the storage-layout lever for 100 TB pipelines (SURVEY §7.2 step 7;
  * AQE can fix a skewed shuffle, only bucketing can delete it).
  *
  * Buckets are hash(key) mod n at WRITE time; a join of two tables
  * bucketed on the same key with the same bucket count reads
  * bucket-aligned splits and Catalyst drops both Exchanges (verified by
  * plan assertion in BucketingSuite). Requires a persistent catalog
  * (`enableHiveSupport` not needed — the in-session catalog works; use
  * a real metastore in production). */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwrites). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortByKey: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortByKey) w.sortBy(key) else w).saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
