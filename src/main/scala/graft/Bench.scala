package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/shuffle machinery so the first timed query doesn't
    // absorb one-time session cost.
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune projections and
      // drop final sorts, so expression-heavy queries would be timed as a
      // bare parquet scan. The noop write executes the full plan.
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
      // a failed query must not masquerade as a fast one
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }

    // Each query is timed twice in the same JVM. The first (cold) run pays
    // JIT + codegen-cache + OS page-cache cost and swings 4-6x with machine
    // load; the second (warm) run is the steady-state signal used to judge
    // plan regressions. NOTE: rounds r1-r4 reported single-shot cold numbers
    // only, so per-query comparisons against those rounds must use the
    // "queries_cold" series, not "queries".
    val results = SparkEntry.queries.map { case (name, fn) =>
      val cold = timeOnce(name, fn)
      val warm = if (cold < 0) -1.0 else timeOnce(name, fn)
      name -> (cold, warm)
    }
    // The driver captures only the LAST ~2000 chars of output and parses
    // the JSON from there, so this line must stay comfortably under that
    // budget: per-query warm times at centisecond precision (the map is
    // ~1.6 KB for 73 queries), totals at millisecond precision, and the
    // full-precision warm+cold detail goes to a local file instead of
    // stdout. "total" stays the r1-r4-comparable single-shot (cold) sum.
    def fmt(v: Double, dec: Int): String =
      if (v < 0) "-1" else s"%.${dec}f".formatLocal(java.util.Locale.ROOT, v)
    def series(pick: ((Double, Double)) => Double, dec: Int): String =
      results.map { case (k, v) => "\"" + k + "\":" + fmt(pick(v), dec) }
        .mkString("{", ",", "}")
    val warmTotal = results.values.map(_._2).filter(_ >= 0).sum
    val coldTotal = results.values.map(_._1).filter(_ >= 0).sum
    def mkLine(dec: Int) =
      s"""{"metric":"total_warm","value":${fmt(warmTotal, 3)},"unit":"sec","queries":${series(_._2, dec)},"total":${fmt(coldTotal, 3)},"sf":"$sfDir","note":"warm run2; total=cold run1 (r1-r4 series)"}"""
    // the driver parses the LAST ~2000 stdout chars: if the query map has
    // grown past the budget at centisecond precision, degrade to
    // deciseconds, then whole seconds, and as a last resort truncate the
    // map to the slowest queries that fit — the line must NEVER overflow
    // the parse window (full precision is in bench_detail.json either way)
    def mkTrunc(k: Int): String = {
      val top = results.toSeq.sortBy(-_._2._2).take(k)
      val qs = top.map { case (n, v) => "\"" + n + "\":" + fmt(v._2, 1) }
        .mkString("{", ",", "}")
      s"""{"metric":"total_warm","value":${fmt(warmTotal, 3)},"unit":"sec","queries":$qs,"total":${fmt(coldTotal, 3)},"sf":"$sfDir","note":"slowest $k of ${results.size} (truncated)"}"""
    }
    val line = Iterator(mkLine(2), mkLine(1), mkLine(0))
      .find(_.length <= 1950)
      .getOrElse((results.size to 0 by -1).iterator.map(mkTrunc)
        .find(_.length <= 1950).get)
    // full precision for local analysis (not part of the driver contract)
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_detail.json"),
      s"""{"queries_warm":${series(_._2, 6)},"queries_cold":${series(_._1, 6)},"total_warm":$warmTotal,"total_cold":$coldTotal,"sf":"$sfDir"}\n""")
    catch { case _: Throwable => () }
    println(line)
    spark.stop()
  }
}
