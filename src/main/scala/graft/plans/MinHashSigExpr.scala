// Lives in a subpackage of org.apache.spark.sql (like graftshim.Shim)
// because ExpectsInputTypes.inputTypes returns the private[sql]
// AbstractDataType. Logically this is graft's plans/ extension layer.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Native Catalyst expression computing a k-permutation MinHash signature
  * from an `array<long>` of token hashes, in one compiled loop.
  *
  * Semantics (bit-identical to the interpreted HOF formulation in
  * `graft.operators.Dedup` and to the DuckDB oracle):
  *   - shingle hash at position i = left fold `(acc*c + h) mod p` over
  *     the `shingleSize`-window of token hashes; inputs shorter than the
  *     window hash all their tokens as one shingle;
  *   - signature j = min over shingles of `(h*a_j + b_j) mod p`.
  *
  * Why a custom expression: higher-order `aggregate`/`zip_with` run
  * interpreted — one lambda dispatch plus a fresh accumulator array per
  * element. The generated code below is two nested primitive loops over
  * a `long[]`, inside whole-stage codegen; ~10x on the signature stage.
  * This is the preferred extension order (compose builtins -> custom
  * Expression -> custom physical plan) at step two: scalar-level
  * semantics need no new plan nodes.
  */
case class MinHashSig(child: Expression, k: Int, shingleSize: Int,
                      permA: Array[Long], permB: Array[Long],
                      p: Long, c: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  /** Shared by eval and the generated code (kept in sync by the oracle
    * gate: any divergence fails q_minhash_pairs' hash compare). */
  private def signatureOf(th: ArrayData): GenericArrayData = {
    val n = th.numElements()
    val acc = Array.fill(k)(p)
    def update(h: Long): Unit = {
      var j = 0
      while (j < k) {
        val v = (h * permA(j) + permB(j)) % p
        if (v < acc(j)) acc(j) = v
        j += 1
      }
    }
    if (n < shingleSize) {
      var poly = 0L
      var i = 0
      while (i < n) { poly = (poly * c + th.getLong(i)) % p; i += 1 }
      update(poly)
    } else {
      var pos = 0
      while (pos <= n - shingleSize) {
        var poly = 0L
        var i = 0
        while (i < shingleSize) { poly = (poly * c + th.getLong(pos + i)) % p; i += 1 }
        update(poly)
        pos += 1
      }
    }
    new GenericArrayData(acc)
  }

  override protected def nullSafeEval(input: Any): Any =
    signatureOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("permA", permA, "long[]")
    val bRef = ctx.addReferenceObj("permB", permB, "long[]")
    nullSafeCodeGen(ctx, ev, th => {
      val acc = ctx.freshName("acc")
      val n = ctx.freshName("n")
      val poly = ctx.freshName("poly")
      val pos = ctx.freshName("pos")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      s"""
         |final int $n = $th.numElements();
         |final long[] $acc = new long[$k];
         |java.util.Arrays.fill($acc, ${p}L);
         |if ($n < $shingleSize) {
         |  long $poly = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $poly = ($poly * ${c}L + $th.getLong($i)) % ${p}L;
         |  }
         |  for (int $j = 0; $j < $k; $j++) {
         |    final long $v = ($poly * $aRef[$j] + $bRef[$j]) % ${p}L;
         |    if ($v < $acc[$j]) $acc[$j] = $v;
         |  }
         |} else {
         |  for (int $pos = 0; $pos <= $n - $shingleSize; $pos++) {
         |    long $poly = 0L;
         |    for (int $i = 0; $i < $shingleSize; $i++) {
         |      $poly = ($poly * ${c}L + $th.getLong($pos + $i)) % ${p}L;
         |    }
         |    for (int $j = 0; $j < $k; $j++) {
         |      final long $v = ($poly * $aRef[$j] + $bRef[$j]) % ${p}L;
         |      if ($v < $acc[$j]) $acc[$j] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($acc);
       """.stripMargin
    })
  }
}
