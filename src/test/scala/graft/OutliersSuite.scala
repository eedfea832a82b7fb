package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Outliers

/** Per-group z-score screen: exact-integer stats derivation, the
  * degenerate-group (singleton / zero-variance) z=0 guard, null-safe group
  * keys, and the broadcast-stats plan shape. */
class OutliersSuite extends SparkSpec {

  private def df(rows: Seq[(String, Long)]) = {
    val schema = StructType(Seq(
      StructField("g", StringType), StructField("v", LongType)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (g, v) => Row(g, v) }: _*),
      schema)
  }

  test("z matches the driver-side exact derivation") {
    val vals = Seq(10L, 12L, 14L, 40L)
    val out = Outliers.withZscore(df(vals.map(("a", _))), col("v"), Seq("g"))
      .orderBy("v").collect().map(_.getAs[Double]("z")).toSeq
    val n = vals.size.toDouble
    val s = vals.sum.toDouble
    val q = vals.map(x => x * x).sum.toDouble
    val mean = s / n
    val varr = (q - s * s / n) / (n - 1.0)
    val want = vals.map(v => (v.toDouble - mean) / math.sqrt(varr))
    assert(out == want, s"got $out want $want")
  }

  test("zero-variance group: z = 0.0 everywhere, nothing flagged") {
    val rows = Seq(("c", 7L), ("c", 7L), ("c", 7L), ("b", 1L), ("b", 9L))
    val z = Outliers.withZscore(df(rows), col("v"), Seq("g"))
      .filter(col("g") === "c").collect().map(_.getAs[Double]("z"))
    assert(z.toSeq == Seq(0.0, 0.0, 0.0))
    assert(Outliers.zscoreOutliers(df(rows), col("v"), Seq("g"), 0.5)
      .filter(col("g") === "c").isEmpty)
  }

  test("singleton group: z = 0.0, not NaN, not flagged") {
    val rows = Seq(("solo", 99L), ("b", 1L), ("b", 9L))
    val out = Outliers.withZscore(df(rows), col("v"), Seq("g"))
      .filter(col("g") === "solo").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("z") == 0.0)
    assert(Outliers.zscoreOutliers(df(rows), col("v"), Seq("g"), 1e-9)
      .filter(col("g") === "solo").isEmpty)
  }

  test("NULL group key rows are kept and scored within the NULL group") {
    val rows = Seq((null: String, 10L), (null: String, 20L), ("a", 5L), ("a", 6L))
    val out = Outliers.withZscore(df(rows), col("v"), Seq("g"))
    assert(out.count() == 4L, "null-keyed rows must not vanish")
    val z = out.filter(col("g").isNull).orderBy("v")
      .collect().map(_.getAs[Double]("z")).toSeq
    // two-point group: z = ±(x-mean)/sd with sd = |x1-x2|/sqrt(2)
    val sd = math.sqrt(50.0)
    assert(z == Seq(-5.0 / sd, 5.0 / sd))
  }

  test("output schema: helper stat columns are dropped, z appended once") {
    val out = Outliers.withZscore(df(Seq(("a", 1L), ("a", 2L))), col("v"), Seq("g"))
    assert(out.columns.toSeq == Seq("g", "v", "z"))
  }

  test("plan: stats broadcast back onto the scan — value column never shuffles") {
    val plan = Outliers.withZscore(df(Seq(("a", 1L), ("a", 2L))), col("v"), Seq("g"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"plan:\n$plan")
  }

  test("robust z resists the masking that breaks the plain z-score") {
    // group: nine ordinary values + one colossal outlier. The outlier
    // drags mean and std so hard its PLAIN z stays modest (~3 is
    // unreachable: max z in a 10-point sample is (n-1)/sqrt(n) ~ 2.85),
    // while median/MAD ignore it: robust z flags it at the 3.5 cut.
    val rows = ((1 to 9).map(i => ("a", 100L + i)) :+ ("a", 1000000L))
    val plain = Outliers.withZscore(df(rows), col("v"), Seq("g"))
      .filter(col("v") === 1000000L).head().getAs[Double]("z")
    assert(math.abs(plain) < 3.5, s"plain z is masked by design: $plain")
    val robust = Outliers.withRobustZ(df(rows), "v", Seq("g"))
      .filter(col("v") === 1000000L).head().getAs[Double]("rz")
    assert(math.abs(robust) > 1000.0, s"robust z must flag it: $robust")
    // ordinary members stay un-flagged
    val others = Outliers.robustOutliers(df(rows), "v", Seq("g"), 3.5)
      .collect().map(_.getLong(1)).toSeq
    assert(others == Seq(1000000L))
  }

  test("robust z: degenerate (constant) groups score 0, not NaN") {
    val out = Outliers.withRobustZ(df(Seq(("c", 7L), ("c", 7L), ("c", 7L))),
      "v", Seq("g")).collect().map(_.getAs[Double]("rz")).toSeq
    assert(out == Seq(0.0, 0.0, 0.0))
  }

  test("robust z rejects non-integral measures") {
    val dbl = graft.api.toDf(spark)("g" -> Seq("a"), "v" -> Seq(0.5)).df
    val e = intercept[IllegalArgumentException] {
      Outliers.withRobustZ(dbl, "v", Seq("g"))
    }
    assert(e.getMessage.contains("integral"))
  }
}
