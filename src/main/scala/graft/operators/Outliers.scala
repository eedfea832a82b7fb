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
  * epsilon needed downstream. Proven by the `q_outliers` oracle row.
  *
  * Degenerate groups: a singleton group (n = 1) or a zero-variance group
  * (every value equal) has no dispersion to score against, so z is defined
  * as 0.0 there — NOT the NaN that raw 0/0 would produce, which Spark's
  * NaN-greater-than-everything ordering would otherwise flag as an outlier
  * on every row of a constant group, the opposite of the right answer.
  *
  * NULL group keys are first-class: stats aggregation keeps the NULL
  * group, and the stats join is null-safe (`<=>`), so null-keyed rows are
  * scored within their own group instead of silently vanishing (an inner
  * equi-join would drop them — cf. Blocklist's NULL rationale).
  *
  * Scale shape: one partial-aggregated shuffle to the per-group stats
  * table (rows = #groups, tiny), broadcast back onto the scan — the value
  * column never shuffles (plan-asserted in OutliersSuite). */
object Outliers {

  /** Append `zName` — the z-score of `scaledValue` (an integral-typed
    * column) within its `groups` partition; sample (n-1) variance;
    * 0.0 for degenerate (singleton / zero-variance) groups. */
  def withZscore(df: DataFrame, scaledValue: Column, groups: Seq[String],
                 zName: String = "z"): DataFrame = {
    require(groups.nonEmpty, "withZscore: need at least one group column")
    val v = scaledValue.cast("decimal(38,0)")
    val statKey = (g: String) => s"__g_$g"
    val stats = df.groupBy(groups.map(col): _*).agg(
      count(lit(1)).cast("double").as("__n_d"),
      sum(v).cast("double").as("__s_d"),
      sum(v * v).cast("double").as("__q_d"))
    // rename the stats-side keys so the self-derived join resolves
    // unambiguously, then match null-safely (NULL keys form a real group)
    val statsKeyed = groups.foldLeft(stats)((d, g) => d.withColumnRenamed(g, statKey(g)))
    val joined = df.join(broadcast(statsKeyed),
      groups.map(g => col(g) <=> col(statKey(g))).reduce(_ && _))
    val mean = col("__s_d") / col("__n_d")
    // (q - s*s/n) is the exact-integer-derived sum of squared deviations;
    // guard it BEFORE dividing so constant groups never reach 0/0
    val ssd = col("__q_d") - col("__s_d") * col("__s_d") / col("__n_d")
    val varr = ssd / (col("__n_d") - lit(1.0))
    val z = when(col("__n_d") > lit(1.0) && ssd > lit(0.0),
      (scaledValue.cast("double") - mean) / sqrt(varr)).otherwise(lit(0.0))
    joined
      .withColumn(zName, z)
      .drop(groups.map(statKey) :+ "__n_d" :+ "__s_d" :+ "__q_d": _*)
  }

  /** Rows whose |z| exceeds `threshold` within their group (degenerate
    * groups score 0.0, so they never flag). */
  def zscoreOutliers(df: DataFrame, scaledValue: Column, groups: Seq[String],
                     threshold: Double, zName: String = "z"): DataFrame =
    withZscore(df, scaledValue, groups, zName)
      .filter(abs(col(zName)) > lit(threshold))

  /** ROBUST (median/MAD) modified z-score (Iglewicz & Hoaglin 1993) —
    * [[withZscore]]'s heavy-tail-immune twin: a single extreme value
    * drags a mean/std z toward itself (masking), while the median and
    * the median absolute deviation ignore it. `rz = 0.6745·(v − med) /
    * MAD`, 0.0 for degenerate groups (MAD = 0), NULL keys first-class
    * (null-safe joins, the zscore contract).
    *
    * Exactness: `scaledValue` must be integral; the group median
    * interpolates only at the exact binary fraction 0.5 over integral
    * inputs (quantileGate parity), so med and every |v − med| are exact
    * .0/.5-valued doubles — the SECOND percentile (MAD over those
    * half-integers) stays exactly representable and both engines'
    * interpolation forms agree bit-for-bit.
    *
    * Scale shape: two grouped exact-percentile aggregates (the
    * documented exact-percentile state bound — at 100 TB switch to
    * approx_percentile and lose the hash check, not the shape), each
    * stats table broadcast back; the value column itself never
    * shuffles. */
  def withRobustZ(df: DataFrame, valueCol: String, groups: Seq[String],
                  rzName: String = "rz"): DataFrame = {
    require(groups.nonEmpty, "withRobustZ: need at least one group column")
    import org.apache.spark.sql.types._
    df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case dt => throw new IllegalArgumentException(
        s"withRobustZ: '$valueCol' must be integral (micro-quantize doubles " +
          s"first — the exact-percentile parity contract), got ${dt.simpleString}")
    }
    val statKey = (g: String) => s"__g_$g"
    def keyed(stats: DataFrame): DataFrame =
      groups.foldLeft(stats)((d, g) => d.withColumnRenamed(g, statKey(g)))
    def joinKeys: Column =
      groups.map(g => col(g) <=> col(statKey(g))).reduce(_ && _)
    val med = df.groupBy(groups.map(col): _*)
      .agg(expr(s"percentile(`$valueCol`, CAST(0.5 AS DOUBLE))").as("__med"))
    val withMed = df.join(broadcast(keyed(med)), joinKeys)
      .drop(groups.map(statKey): _*)
      .withColumn("__ad", abs(col(valueCol).cast("double") - col("__med")))
    val mad = withMed.groupBy(groups.map(col): _*)
      .agg(expr("percentile(__ad, CAST(0.5 AS DOUBLE))").as("__mad"))
    withMed.join(broadcast(keyed(mad)), joinKeys)
      .withColumn(rzName,
        when(col("__mad") > lit(0.0),
          lit(0.6745) * (col(valueCol).cast("double") - col("__med")) / col("__mad"))
          .otherwise(lit(0.0)))
      .drop(groups.map(statKey) :+ "__med" :+ "__ad" :+ "__mad": _*)
  }

  /** Rows whose |rz| exceeds `threshold` within their group. The
    * conventional cut for the modified z-score is 3.5. */
  def robustOutliers(df: DataFrame, valueCol: String, groups: Seq[String],
                     threshold: Double = 3.5,
                     rzName: String = "rz"): DataFrame =
    withRobustZ(df, valueCol, groups, rzName)
      .filter(abs(col(rzName)) > lit(threshold))
}
