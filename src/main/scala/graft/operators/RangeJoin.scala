package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scale-safe interval (range) join: match left rows whose point
  * `t` falls in a right interval `[start, end)` — with NO equi-key.
  * Beyond-reference (the reference has no interval join; the closest
  * sibling here is [[AsOf]], which matches each left row to ONE
  * nearest-past right row, where this matches ALL covering intervals).
  *
  * Spark's planner turns a bare `t >= s AND t < e` join condition into
  * BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, a scale killer the
  * moment the interval side outgrows a broadcast. The banded rewrite
  * manufactures an equi-key: quantize the domain into fixed-width bins,
  * explode each interval onto the bins it covers (`len/binWidth + 1`
  * rows), hash-join on the bin, then verify the exact range predicate.
  * A point lies in exactly ONE bin and an interval covers that bin at
  * most once, so the output needs no dedup — every match appears exactly
  * once. Cost is one hash shuffle of each side on the bin (or a
  * broadcast when the exploded interval side is small), linear in
  * |L| + |R|·spans — the standard distributed range-join strategy
  * (cf. interval/temporal joins in Flink and the bin-bucketed range
  * joins of warehouse engines).
  *
  * `binWidth` tuning: pick ≈ the median interval length. Too small
  * multiplies the interval replication (`len/binWidth`); too large
  * degrades the bin join toward all-pairs within a bin. Both sides stay
  * correct for any positive value — it is purely a performance knob.
  *
  * Domain values must be non-negative (`div` truncates toward zero, so
  * negative values would land in the wrong bin) — epoch timestamps,
  * offsets, and sequence numbers all qualify.
  */
object RangeJoin {

  /** Inner interval join: rows of `left` × covering intervals of
    * `right`, matched on `left.tCol ∈ [right.startCol, right.endCol)`.
    * Column sets of the two sides must be disjoint. Empty intervals
    * (`end <= start`) match nothing and are dropped before the explode. */
  def intervalJoin(left: DataFrame, tCol: String,
                   right: DataFrame, startCol: String, endCol: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, "intervalJoin: binWidth must be positive")
    require(left.columns.toSet.intersect(right.columns.toSet).isEmpty,
      "intervalJoin: left and right column names must be disjoint")
    val lb = left.withColumn("__lbin", expr(s"`$tCol` div ${binWidth}L"))
    val rb = right
      .filter(col(endCol) > col(startCol))
      .withColumn("__rbin", explode(sequence(
        expr(s"`$startCol` div ${binWidth}L"),
        expr(s"(`$endCol` - 1) div ${binWidth}L"))))
    lb.join(rb, col("__lbin") === col("__rbin") &&
        col(tCol) >= col(startCol) && col(tCol) < col(endCol))
      .drop("__lbin", "__rbin")
  }
}
