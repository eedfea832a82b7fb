package graft.functions

import org.apache.spark.sql.{graftshim, Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom reductions: the Spark analog of the reference's full `formula:`
  * blocks with accumulator prefaces (`var res = 0; res += x` —
  * `formulaExp.nim:790-860`, pinned by `testsFormula.nim:451-496`).
  *
  * A fold with an initial value and an associative-commutative op maps
  * directly onto `Aggregator[IN, BUF, OUT]` + `udaf`: `reduce` is the
  * reference's loop body, `merge` combines per-partition partial states —
  * which is exactly what makes the same accumulator DISTRIBUTED (partial
  * aggregation map-side, one shuffle of buffers, final merge), where the
  * reference runs a sequential loop.
  *
  * Ops must be associative and commutative (`+`, `*`, `min`, `max`,
  * bitwise ops...): Spark applies them in partition order, not row order.
  */
object Accumulators {

  private case class FoldLong(z: Long, op: (Long, Long) => Long)
      extends Aggregator[Long, Long, Long] {
    def zero: Long = z
    def reduce(b: Long, a: Long): Long = op(b, a)
    def merge(b1: Long, b2: Long): Long = op(b1, b2)
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  private case class FoldDouble(z: Double, op: (Double, Double) => Double)
      extends Aggregator[Double, Double, Double] {
    def zero: Double = z
    def reduce(b: Double, a: Double): Double = op(b, a)
    def merge(b1: Double, b2: Double): Double = op(b1, b2)
    def finish(b: Double): Double = b
    def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** `var res = zero; for x: res = op(res, x)` over a long column. */
  def foldLong(zero: Long)(op: (Long, Long) => Long): Column => Column = {
    val f = udaf(FoldLong(zero, op))
    c => f(c)
  }

  /** Same over a double column. */
  def foldDouble(zero: Double)(op: (Double, Double) => Double): Column => Column = {
    val f = udaf(FoldDouble(zero, op))
    c => f(c)
  }

  /** Product reduction (`res *= x`, `testsFormula.nim:466-476`) — the
    * scale path: a declarative aggregate whose buffer is one unboxed long
    * updated by codegen'd `Multiply` inside HashAggregate, vs the
    * `Aggregator` fold's ObjectHashAggregate with per-row encoder round
    * trips. [[productLongFold]] keeps the general mechanism; the two are
    * pinned bit-identical on NON-NULL input in AccumulatorSuite. Null
    * handling diverges by construction: this skips nulls (SQL aggregate /
    * DuckDB `product()` semantics); the primitive fold reads null as 0L
    * (collapsing the product) — pinned too. */
  def productLong: Column => Column = c =>
    graftshim.Shim.toColumn(
      graftshim.ProductLong(graftshim.Shim.toExpression(c)).toAggregateExpression())

  /** The same product via the general custom-fold mechanism (any
    * associative-commutative op, arbitrary buffer). */
  def productLongFold: Column => Column = foldLong(1L)(_ * _)

  private case class WeightedMeanAgg()
      extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), a: (Double, Double)): (Double, Double) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    def merge(b1: (Double, Double), b2: (Double, Double)): (Double, Double) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Non-trivial buffer example: weighted mean of (value, weight). */
  def weightedMean(value: Column, weight: Column): Column =
    udaf(WeightedMeanAgg()).apply(value, weight)
}
