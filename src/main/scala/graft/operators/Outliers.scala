package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group z-score outlier detection — the numeric-column anomaly screen
  * of a data-curation pipeline (flag documents/events whose metric is
  * implausibly far from their group's mean before they skew training).
  * Beyond-reference extension.
  *
  * Exactness contract (the reason this is oracle-checkable bit-for-bit):
  * the caller supplies the value PRE-SCALED TO AN INTEGER (cents, micros …),
  * so the group sums are exact integer arithmetic in any partition order
  * (accumulated in decimal(38,0) — a 600M-row group of 1e14 squares still
  * fits with >10^4 headroom, where a raw long sum would silently wrap).
  * Mean/variance/z are then derived from those exact integers with a fixed
  * IEEE op sequence, so every engine computes identical doubles — no
  * epsilon needed downstream.
  *
  * Scale shape: one partial-aggregated shuffle to the per-group stats
  * table (rows = #groups, tiny), broadcast back onto the scan — the value
  * column never shuffles. */
object Outliers {

  /** Append `mean`/`std`/`z` for `scaledValue` (an integral-typed column)
    * within each `groups` partition; sample (n-1) variance. */
  def withZscore(df: DataFrame, scaledValue: Column, groups: Seq[String],
                 zName: String = "z"): DataFrame = {
    require(groups.nonEmpty, "withZscore: need at least one group column")
    val v = scaledValue.cast("decimal(38,0)")
    val stats = df.groupBy(groups.map(col): _*).agg(
      count(lit(1)).cast("double").as("__n_d"),
      sum(v).cast("double").as("__s_d"),
      sum(v * v).cast("double").as("__q_d"))
    val joined = df.join(broadcast(stats), groups)
    val mean = col("__s_d") / col("__n_d")
    val varr = (col("__q_d") - col("__s_d") * col("__s_d") / col("__n_d")) /
      (col("__n_d") - lit(1.0))
    joined
      .withColumn(zName, (scaledValue.cast("double") - mean) / sqrt(varr))
      .drop("__n_d", "__s_d", "__q_d")
  }

  /** Rows whose |z| exceeds `threshold` within their group. */
  def zscoreOutliers(df: DataFrame, scaledValue: Column, groups: Seq[String],
                     threshold: Double, zName: String = "z"): DataFrame =
    withZscore(df, scaledValue, groups, zName)
      .filter(abs(col(zName)) > lit(threshold))
}
