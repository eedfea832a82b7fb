package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

/** Data-layout keys for multi-dimensional scan pruning — the missing
  * piece between "filters push down" and "filters prune file I/O" at
  * 100 TB. Sorting a table by ONE column gives parquet row-group min/max
  * stats that prune filters on that column only; interleaving the bits
  * of several columns (a Z-order / Morton key) gives a single sort key
  * whose locality serves box filters on ALL of them — the same layout
  * trick warehouse engines ship as `ZORDER BY` / `CLUSTER BY`.
  * Beyond-reference.
  *
  * Everything is integer arithmetic (quantize = subtract-min, scale by
  * integer division; interleave = shift/or), so keys are engine-exact
  * and oracle-checkable. The expressions are plain Catalyst arithmetic —
  * codegen'd, scan-local, no shuffle until the final range-partitioned
  * sort that `repartitionByRange`/`sortWithinPartitions` on the key
  * performs when writing.
  */
object Layout {

  /** Quantize a non-negative offset `c - lo` into `2^bits` buckets over
    * the inclusive domain [lo, hi]. Pure integer arithmetic:
    * `((c - lo) * 2^bits) div (hi - lo + 1)` — exact for domains up to
    * ~2^(62-bits). Bounds come from the caller (domain knowledge or a
    * one-row stats aggregate broadcast back). */
  def quantize(c: Column, lo: Long, hi: Long, bits: Int): Column = {
    require(hi >= lo, s"quantize: empty domain [$lo, $hi]")
    require(bits >= 1 && bits <= 31, s"quantize: bits=$bits out of [1,31]")
    require(hi - lo < (1L << (62 - bits)),
      s"quantize: domain width ${hi - lo} overflows the scale multiply")
    // SQL `div` (IntegralDivide): exact long division — `divide` would go
    // through double and lose exactness past 2^53.
    Shim.toColumn(new IntegralDivide(
      Shim.toExpression((c.cast("long") - lit(lo)) * lit(1L << bits)),
      Shim.toExpression(lit(hi - lo + 1L))))
  }

  /** Morton (Z-order) key: interleave the low `bits` bits of each
    * (already-quantized, in `[0, 2^bits)`) column — column 0 gets the
    * least-significant lane. `cols.length * bits` must be ≤ 62. */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey: no columns")
    require(cols.length * bits <= 62,
      s"zorderKey: ${cols.length} cols × $bits bits overflows a long")
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), j).bitwiseAND(lit(1L)),
      j * cols.length + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Re-layout `df` for multi-dimensional pruning: range-partition and
    * sort by the Z-order key of the given (column, lo, hi) dimensions.
    * Write the result with a parquet sink to get row-group min/max stats
    * aligned with the curve. */
  def clusterByZorder(df: DataFrame, dims: Seq[(String, Long, Long)],
                      bits: Int = 16,
                      numPartitions: Option[Int] = None): DataFrame = {
    val key = zorderKey(
      dims.map { case (c, lo, hi) => quantize(col(c), lo, hi, bits) }, bits)
    val keyed = df.withColumn("__zkey", key)
    val parted = numPartitions match {
      case Some(n) => keyed.repartitionByRange(n, col("__zkey"))
      case None => keyed.repartitionByRange(col("__zkey"))
    }
    parted.sortWithinPartitions("__zkey").drop("__zkey")
  }
}
