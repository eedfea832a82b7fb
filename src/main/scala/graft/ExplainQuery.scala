package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the FORMATTED physical plan of named ledger queries —
  * the `.explain`-and-iterate loop the plan audit (PLANS.md) runs on,
  * against the same session settings as [[Verify]] (so the plan you read
  * is the plan the correctness gate executes).
  *
  * Usage: `sbt "runMain graft.ExplainQuery /root/testdata/sf0.01 q_winnow_pairs [more...]"`
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainQuery <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name' — see SparkEntry.queries"))
      println(s"=== $name ===")
      fn(spark, sfDir).explain("formatted")
      graft.operators.GlobalOps.releaseSnapshots()
    }
    spark.stop()
  }
}
