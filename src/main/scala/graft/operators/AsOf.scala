package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the single right row
  * with the greatest `rightTs <= leftTs` among the same join keys — the
  * point-in-time lookup of time-series engines (kdb `aj`, pandas
  * `merge_asof`, DuckDB `ASOF JOIN`), which Spark has no operator for.
  *
  * Implementation is a UNION + ONE WINDOW, not an inequality join: left
  * and right rows are interleaved per key in time order, and a running
  * `last(payload, ignoreNulls)` carries the most recent right payload
  * forward onto each left row. Cost is one shuffle on the keys plus a
  * per-partition sort — the same plan as a sort-merge join — where a
  * range-condition join (`l.ts >= r.ts` + row_number) explodes to the
  * full cross product per key before pruning. At 100 TB the window
  * shape is the only one that survives.
  *
  * Ties: right rows sharing (keys, ts) resolve to the greatest
  * `rightTieBreak`; a right row exactly at the left timestamp DOES match
  * (inclusive, like DuckDB's `ON l.ts >= r.ts`). Left rows with no prior
  * right row keep NULL payload (left-join semantics).
  */
object AsOf {

  /** @param payload right columns to carry (renamed `<prefix><name>` in
    *                the output, plus `<prefix>ts` for the matched time) */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, payload: Seq[String],
               rightTieBreak: Column = lit(0L),
               prefix: String = "asof_"): DataFrame = {
    val keyCols = keys.map(col)
    val r = right.select(
      keyCols :+ col(rightTs).as("__ts") :+
        struct((col(rightTs).as("ts") +: payload.map(col)): _*).as("__payload") :+
        rightTieBreak.as("__tie"): _*)
      .withColumn("__is_left", lit(0))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tie", lit(null).cast("long"))
      .withColumn("__is_left", lit(1))
    // right rows sort BEFORE left rows at equal ts (inclusive match);
    // among right rows at equal ts the greatest tiebreak lands last,
    // i.e. wins the running `last`
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__is_left"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
    val carried = col("__match").getField("ts").as(s"${prefix}ts") +:
      payload.map(p => col("__match").getField(p).as(s"$prefix$p"))
    merged.filter(col("__is_left") === 1)
      .select(left.columns.map(col) ++ carried: _*)
  }
}
