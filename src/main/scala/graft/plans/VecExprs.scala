// Subpackage of org.apache.spark.sql for the same reason as MinHashSig:
// ExpectsInputTypes uses private[sql] AbstractDataType. Logically graft's
// plans/ extension layer.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd 48-bit SimHash over an `array<long>` of token hashes: one
  * compiled loop maintaining 48 bit counters, versus the interpreted
  * nested-HOF fold (lambda dispatch + fresh 48-element array per token).
  * Bit b of the result is set iff more token hashes have bit b set than
  * not — identical to `Dedup.simhash48Sql` (pinned by a suite) and to
  * the DuckDB oracle. */
case class SimHash48(child: Expression) extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash48"

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val n = th.numElements()
    val cnt = new Array[Int](48)
    var i = 0
    while (i < n) {
      val h = th.getLong(i)
      var b = 0
      while (b < 48) {
        if (((h >> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 48) { if (cnt(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, th => {
      val cnt = ctx.freshName("cnt")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $th.numElements();
         |final int[] $cnt = new int[48];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $th.getLong($i);
         |  for (int $b = 0; $b < 48; $b++) {
         |    if ((($h >> $b) & 1L) == 1L) $cnt[$b]++; else $cnt[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 48; $b++) {
         |  if ($cnt[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
}

/** Codegen'd dot product over two `array<double|float>` columns as ONE
  * compiled left-to-right fold — the exact summation order of the
  * interpreted `aggregate(zip_with(...))` it replaces and of DuckDB's
  * `list_dot_product`, so cosine results stay bit-comparable across
  * engines. Float elements widen to double per element, like the
  * element-wise cast the HOF form applied. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)),
    TypeCollection(ArrayType(DoubleType), ArrayType(FloatType)))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (fx, fy) = (isFloat(left), isFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (fx) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (fy) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val getX = if (isFloat(left)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val getY = if (isFloat(right)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $getX * $getY;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
}
