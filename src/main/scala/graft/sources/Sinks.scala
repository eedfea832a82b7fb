package graft.sources

import org.apache.spark.sql.DataFrame

/** Output side of the pipeline: partitioned parquet — the layout a
  * 100 TB curation job writes so downstream readers get PARTITION
  * PRUNING (a `lang='en'` filter skips whole directories, verified by
  * plan assertion in SinksSuite) and per-partition file sizing.
  * Beyond-reference (the reference's only sink is CSV/HDF5). */
object Sinks {

  /** Write `df` as parquet partitioned by `partitionCols` (directory per
    * value combination). `maxRecordsPerFile` bounds file size so a skewed
    * partition value cannot produce one giant file; zstd (bundled with
    * Spark 4) over default snappy — at 100 TB the storage/scan-IO saving
    * outweighs the extra encode CPU. */
  def writeParquet(df: DataFrame, path: String,
                   partitionCols: Seq[String] = Nil,
                   maxRecordsPerFile: Long = 5000000L,
                   compression: String = "zstd"): Unit = {
    val w = df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .option("compression", compression)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}
