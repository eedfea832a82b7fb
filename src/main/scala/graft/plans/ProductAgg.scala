// Subpackage of org.apache.spark.sql like the other graft kernels:
// ImplicitCastInputTypes uses private[sql] AbstractDataType. Logically
// graft's plans/ extension layer.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, EvalMode, Expression, If, ImplicitCastInputTypes, IsNull, Literal, Multiply, Not, Or
}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType}

/** Product of a long column as a declarative aggregate: the buffer is one
  * unboxed long slot updated by codegen'd `Multiply` inside
  * HashAggregate — no per-row encoder round trip, map-side partial
  * aggregation for free. This is the scale path for the reference's
  * `res *= x` accumulator (`formulaExp.nim:790-860`,
  * `testsFormula.nim:466-476`); the general mechanism for arbitrary
  * custom folds stays [[graft.functions.Accumulators.foldLong]], pinned
  * bit-identical to this in AccumulatorSuite.
  *
  * Semantics match DuckDB `product()`: null inputs SKIPPED and a group
  * with NO non-null input (incl. an empty ungrouped frame) evaluates to
  * NULL like every SQL aggregate — a `seen` flag in the buffer carries
  * that distinction (the primitive `Aggregator` fold instead reads null
  * as 0L — a documented divergence pinned in AccumulatorSuite).
  * Non-ANSI wrap-around `*` (the same overflow behavior as the Scala
  * `_ * _` fold).
  */
case class ProductLong(child: Expression)
    extends DeclarativeAggregate with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_product_long"

  private lazy val prod =
    AttributeReference("prod", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", org.apache.spark.sql.types.BooleanType,
      nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    prod :: seen :: Nil
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(1L), Literal(false))
  // LEGACY (wrap-around) multiply regardless of ANSI conf: the Aggregator
  // fold this is pinned against uses Scala `_ * _`, which wraps.
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), prod, Multiply(prod, child, EvalMode.LEGACY)),
    Or(seen, Not(IsNull(child))))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Multiply(prod.left, prod.right, EvalMode.LEGACY),
    Or(seen.left, seen.right))
  override lazy val evaluateExpression: Expression =
    If(seen, prod, Literal(null, LongType))

  override protected def withNewChildInternal(newChild: Expression): ProductLong =
    copy(child = newChild)
}
