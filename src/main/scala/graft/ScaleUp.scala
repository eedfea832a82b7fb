package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a 10x scale point from sf0.1 for the slope
  * rehearsal (the tri-scale audit tops out at ~600k lineitem rows; the
  * design claims are 100 TB, so PLANS.md wants a fourth point). Driver
  * testdata is read-only — this writes `<outDir>/<table>.parquet` with
  * ten referentially-intact copies of each scaled table:
  *
  *  - every synthetic key (order/cust/part/supp/event/user/doc/vec)
  *    shifts by `copy * Stride`, so joins stay referentially exact and
  *    key spaces never collide across copies;
  *  - dimension tables (region, nation) are fixed points of scale, as
  *    in TPC-H;
  *  - document text gets a per-copy suffix token for copies >= 1: exact
  *    dups do NOT inflate 10x (which would 100x the dedup pair space),
  *    while each original near-dup pair replicates once per copy and
  *    copy-groups add a bounded C(10,2) per doc — linear growth, the
  *    realistic "crawl got bigger" shape;
  *  - timestamps and value distributions are untouched (10x rows per
  *    window/group, the density growth a bigger corpus actually has).
  *
  * Usage: `sbt "runMain graft.ScaleUp /root/testdata/sf0.1 target/sf1"`.
  * Determinism: pure column arithmetic over deterministic input — no
  * RNG, no sampling — so reruns are bit-identical. */
object ScaleUp {

  private val Copies = 10
  private val Stride = 10000000L // > any sf0.1 key; keeps copies disjoint

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ScaleUp <srcSfDir> <outDir>")
    val (src, out) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")

    /** Union of `Copies` key-shifted images of `df`. `keys` columns get
      * `+ copy*Stride`; `textCol` (if set) gets the per-copy suffix,
      * with the stored `n_chars` bumped to keep the fixture invariant
      * `n_chars == length(text)` true in the scale image too. */
    def scaled(df: DataFrame, keys: Seq[String],
               textCol: Option[String] = None): DataFrame =
      (0 until Copies).map { k =>
        val shifted = keys.foldLeft(df) { (d, c) =>
          d.withColumn(c, col(c) + lit(k * Stride)) }
        textCol match {
          case Some(tc) if k > 0 =>
            val suffix = s" rep$k"
            shifted.withColumn(tc, concat(col(tc), lit(suffix)))
              .withColumn("n_chars", col("n_chars") + lit(suffix.length.toLong))
          case _ => shifted
        }
      }.reduce(_ unionAll _)

    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> read("region"),
      "nation" -> read("nation"),
      "customer" -> scaled(read("customer"), Seq("c_custkey")),
      "supplier" -> scaled(read("supplier"), Seq("s_suppkey")),
      "part" -> scaled(read("part"), Seq("p_partkey")),
      "orders" -> scaled(read("orders"), Seq("o_orderkey", "o_custkey")),
      "lineitem" -> scaled(read("lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "events" -> scaled(read("events"), Seq("event_id", "user_id")),
      "documents" -> scaled(read("documents"), Seq("doc_id"),
        textCol = Some("text")),
      "embeddings" -> scaled(read("embeddings"), Seq("vec_id")))

    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
