package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pre-flight diagnostics for join/aggregation planning at scale —
  * beyond-reference (the reference is single-process and never needs
  * them; a 100 TB Spark job lives or dies by them).
  */
object Diagnostics {

  /** Key-skew report: the `topK` heaviest values of `keyCols` with exact
    * counts, corpus share, and a dense heaviness rank — the number you
    * look at BEFORE deciding whether a join needs salting, a broadcast,
    * or plain AQE skew-split (a key with share ≈ 1/partitions is fine;
    * share ≫ that pins one reducer).
    *
    * Plan: one partial-agged count per key [the only full shuffle], the
    * grand total as ONE scalar aggregate broadcast back (BM25-stats
    * pattern), top-K via TakeOrderedAndProject (bounded, deterministic
    * tie-break on the key columns), and the rank window runs AFTER the
    * top-K cut — a single-partition window over `topK` rows, bounded by
    * construction, never by data. `share` is one division of exact
    * integer counts, so it replays bit-identically cross-engine. */
  def keySkew(df: DataFrame, keyCols: Seq[String], topK: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "keySkew: need at least one key column")
    require(topK > 0, "keySkew: topK must be positive")
    // the report's own columns share the frame with the keys — collision
    // would make every later col("n") ambiguous; fail with the reason
    val clash = keyCols.toSet intersect Set("n", "share", "rnk")
    require(clash.isEmpty,
      s"keySkew: key column(s) ${clash.mkString(", ")} collide with the " +
        "report columns (n, share, rnk) — rename the key first")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__tot"))
    val top = counts.crossJoin(broadcast(total))
      .withColumn("share", col("n").cast("double") / col("__tot").cast("double"))
      .drop("__tot")
      .orderBy(col("n").desc +: keyCols.map(col(_).asc): _*)
      .limit(topK)
    // bounded single-partition window: input is the topK rows just cut
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc +: keyCols.map(col(_).asc): _*)
    top.withColumn("rnk", row_number().over(w).cast("long"))
  }

  /** Exact fixed-width histogram of an integral measure over [lo, hi):
    * `bin = (x - lo) * bins DIV (hi - lo)` — all-integer arithmetic, so
    * the edges replay bit-identically in any engine (`width_bucket`
    * variants differ on edge inclusion across engines; the explicit
    * formula doesn't). Rows outside [lo, hi) are dropped and reported is
    * per NON-EMPTY bin only (a groupBy, not a dense bin spine — callers
    * wanting zero rows join a `sequence`). One partial-agged shuffle on
    * the bin id; bin count bounded by `bins` regardless of data. */
  def histogram(df: DataFrame, measureCol: String,
                lo: Long, hi: Long, bins: Int): DataFrame = {
    require(hi > lo, s"histogram: empty domain [$lo, $hi)")
    require(bins > 0, "histogram: bins must be positive")
    // the bin formula multiplies (x - lo) < width by bins before the
    // div — both the width itself and width * bins must fit a Long, or
    // bins go silently wrong with no error
    val width =
      try Math.subtractExact(hi, lo)
      catch { case _: ArithmeticException => throw new IllegalArgumentException(
        s"histogram: domain [$lo, $hi) is wider than Long.MaxValue") }
    require(width <= Long.MaxValue / bins,
      s"histogram: domain width $width times $bins bins overflows Long — " +
        "use fewer bins or a narrower domain")
    // integral measures only (the quantileGate rule): the bigint cast in
    // the bin formula would silently truncate a double toward zero
    val field = Resolve.uniqueField(df, measureCol, "histogram")
    field.dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"histogram: measure '$measureCol' must be integral (exact all-integer " +
          s"bin edges are the operator's contract); got ${dt.simpleString} — " +
          "quantize the measure to a long first")
    }
    // backtick-escaped identifier (the quantileGate rule) used for BOTH
    // the filter and the expr bin formula — a dotted name must not be
    // read as struct-field access anywhere; integer `div` has no Column
    // operator, so the bin formula goes through expr
    val q = "`" + field.name.replace("`", "``") + "`"
    val x = col(q).cast("long")
    df.filter(x >= lo && x < hi)
      .withColumn("bin", expr(s"((cast($q as bigint) - ${lo}L) * ${bins}L) div ${width}L"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("lo_edge", lit(lo) + col("bin") * lit(width) / lit(bins.toLong))
      .withColumn("hi_edge", lit(lo) + (col("bin") + 1) * lit(width) / lit(bins.toLong))
  }
}
