package graft

import org.apache.spark.sql.SparkSession

/** Bench a subset of queries by name (iteration tool):
  * `runMain graft.BenchOne q_minhash_pairs q_lang_id`. Same session
  * config and noop sink as [[Bench]]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // same lifecycle as Bench: the noop write fully consumed the
        // result, so per-shot rank/shift snapshots are safe to drop —
        // without this, repeated shots of a global-window query pin one
        // cached copy of the keyed table each
        graft.operators.GlobalOps.releaseSnapshots()
      }
    }
    spark.stop()
  }
}
