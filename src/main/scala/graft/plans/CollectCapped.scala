// Subpackage of org.apache.spark.sql like the other graft kernels:
// extends the catalyst-internal Collect base. Logically graft's plans/
// extension layer.
package org.apache.spark.sql.graftshim

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.Collect
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType

/** `collect_list` with a hard element cap enforced INSIDE the
  * aggregation buffer — the scale-safe bucket builder for every
  * LSH-family candidate stage ([[graft.operators.Dedup]]).
  *
  * `collect_list(...)` followed by `filter(size(...) <= cap)` is
  * correct but builds the FULL list before the filter sees it: one
  * boilerplate-hot key (an empty-text fingerprint, a common template's
  * band hash — guaranteed in a real crawl) with 10^8 members is a
  * multi-GB single-key aggregation buffer and an executor OOM at
  * 100 TB. This aggregate retains at most `cap + 1` elements at every
  * point in the plan — per-row update, map-side partials, shuffled
  * partial rows, and the final merge alike — so the hot key costs
  * O(cap) per partial, never O(members).
  *
  * `cap + 1` (not `cap`) is the retention bound so over-cap buckets
  * stay distinguishable downstream: a result of size `cap + 1` means
  * "more than cap members existed" and the caller's `[2, cap]` size
  * filter drops it — the exact survivor set and member lists the
  * uncapped collect_list + filter formulation produces (equality
  * property-pinned in DedupSuite, including torn-across-partials hot
  * keys).
  *
  * Same TypedImperativeAggregate machinery as the built-in
  * `collect_list` (ObjectHashAggregate with map-side partial
  * aggregation), so the plan shape is unchanged — only the buffer
  * bound differs. Nulls are skipped like collect_list; element order
  * within a bucket is nondeterministic like collect_list (callers are
  * order-insensitive: pair expansion + de-dup).
  */
case class CollectListCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[mutable.ArrayBuffer[Any]] with UnaryLike[Expression] {

  require(cap >= 1, s"graft_collect_capped: cap must be >= 1, got $cap")

  override lazy val bufferElementType: DataType = child.dataType
  override def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)
  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty
  override def prettyName: String = "graft_collect_capped"

  /** Retention bound: cap + 1 elements distinguish over-cap from at-cap.
    * Saturates at Int.MaxValue — a JVM array can't exceed it anyway, so
    * cap = Int.MaxValue ("uncapped") keeps collecting instead of the
    * overflowed cap+1 = MinValue silently emptying every bucket. */
  private def limit: Int = if (cap == Int.MaxValue) cap else cap + 1

  override def update(buffer: mutable.ArrayBuffer[Any],
                      input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buffer.length < limit) {
      val value = child.eval(input)
      if (value != null) buffer += convertToBufferElement(value)
    }
    buffer
  }

  override def merge(buffer: mutable.ArrayBuffer[Any],
                     other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    val room = limit - buffer.length
    if (room >= other.length) buffer ++= other
    else if (room > 0) buffer ++= other.take(room)
    buffer
  }

  override def eval(buffer: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectListCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CollectListCapped =
    copy(child = newChild)
}
