package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the single right row closest in
  * time among the same join keys — the point-in-time lookup of
  * time-series engines (kdb `aj`, pandas `merge_asof`, DuckDB
  * `ASOF JOIN`), which Spark has no operator for. Backward (greatest
  * `rightTs <= leftTs`, the default), forward (smallest
  * `rightTs >= leftTs`), and an optional staleness `tolerance` — the
  * pandas `merge_asof` surface.
  *
  * Implementation is a UNION + ONE WINDOW, not an inequality join: left
  * and right rows are interleaved per key in time order, and a running
  * `last(payload, ignoreNulls)` (resp. `first` for forward) carries the
  * nearest right payload onto each left row. Cost is one shuffle on the
  * keys plus a per-partition sort — the same plan as a sort-merge join —
  * where a range-condition join (`l.ts >= r.ts` + row_number) explodes
  * to the full cross product per key before pruning. At 100 TB the
  * window shape is the only one that survives.
  *
  * Ties: right rows sharing (keys, ts) resolve to the greatest
  * `rightTieBreak` in either direction; a right row exactly at the left
  * timestamp DOES match (inclusive, like DuckDB's `ON l.ts >= r.ts`).
  * Left rows with no match (none prior/following, or outside tolerance)
  * keep NULL payload (left-join semantics). Timestamps must be non-null;
  * `tolerance` requires a numeric (ticks) time column.
  */
object AsOf {

  /** @param payload   right columns to carry (renamed `<prefix><name>` in
    *                  the output, plus `<prefix>ts` for the matched time)
    * @param direction "backward" (default) or "forward"
    * @param tolerance max |leftTs - matchedTs| in ticks; farther matches
    *                  null out (pandas merge_asof `tolerance`) */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               rightTieBreak: Column = lit(0L),
               prefix: String = "asof_",
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"joinAsOf: direction must be backward|forward, got $direction")
    // the matched timestamp rides inside the payload struct under a
    // collision-proof internal name: a payload column literally named
    // "ts" would otherwise create duplicate struct fields and make
    // getField ambiguous
    val TsField = "__asof_ts"
    require(!payload.contains(TsField),
      s"joinAsOf: payload column name $TsField is reserved")
    // a payload column named "ts" would collide with the carried
    // match-timestamp OUTPUT column (both become s"${prefix}ts");
    // rename it on the right side before joining
    require(!payload.contains("ts"),
      "joinAsOf: payload column 'ts' collides with the carried " +
        s"match-timestamp column '${prefix}ts' — rename it first")
    val keyCols = keys.map(col)
    val r = right.select(
      keyCols :+ col(rightTs).as("__ts") :+
        struct((col(rightTs).as(TsField) +: payload.map(col)): _*).as("__payload") :+
        rightTieBreak.as("__tie"): _*)
      .withColumn("__is_left", lit(0))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__is_left", lit(1))
    val merged = l.unionByName(r, allowMissingColumns = true)
    // Both directions are the SAME running `last` over the preceding
    // frame — forward just traverses time descending. (A
    // (currentRow, unboundedFollowing) frame with first() would be
    // semantically equivalent but Spark evaluates unbounded-following
    // frames by rescanning to the partition end for EVERY row — O(n²)
    // per key group, a quadratic cliff on hot keys. The preceding-frame
    // running aggregate is O(n).) In either traversal, right rows sort
    // before left at equal ts (inclusive match) and the greatest
    // tiebreak lands immediately before the left row, winning `last`.
    val timeOrd =
      if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(timeOrd, col("__is_left"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withMatch = merged.withColumn("__match",
      last(col("__payload"), ignoreNulls = true).over(w))
    val gated = tolerance match {
      case None => withMatch
      case Some(tol) =>
        val delta =
          if (direction == "backward")
            col("__ts") - col("__match").getField(TsField)
          else col("__match").getField(TsField) - col("__ts")
        withMatch.withColumn("__match",
          when(delta <= lit(tol), col("__match")))
    }
    val carried = col("__match").getField(TsField).as(s"${prefix}ts") +:
      payload.map(p => col("__match").getField(p).as(s"$prefix$p"))
    gated.filter(col("__is_left") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++ carried: _*)
  }
}
