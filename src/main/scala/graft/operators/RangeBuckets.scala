package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic split-point range bucketing, shared by [[GlobalRank]]
  * and [[GlobalShift]] (the two-pass global operators).
  *
  * The problem it solves: Spark's `repartitionByRange` samples its
  * boundaries PER MATERIALIZATION, so two jobs planning the same range
  * exchange can disagree on which side of a cut a tie group falls —
  * cross-job alignment then requires persisting the partitioned frame,
  * which at 100 TB means materializing a full-width copy of the table.
  *
  * The fix: when the first order key is orderable into long/double,
  * compute ~numParts quantile split points ONCE (one approxQuantile job
  * over a scan pruned to that key), snap them into the key's own type,
  * and stamp the bucket id as a PURE PROJECTION against the literal
  * boundaries. Every job then derives the identical bucket for every
  * row by construction — nothing persists, nothing can misalign. The
  * split values themselves need not be exact or reproducible (they are
  * captured once as literals; balance is the only thing at stake).
  *
  * Contiguity and ties: bucket b holds exactly the rows with
  * splits(b-1) <= key < splits(b), so buckets are contiguous in the
  * global order and EQUAL FIRST KEYS NEVER STRADDLE a bucket boundary —
  * the invariant both global rank (tie groups stay together) and global
  * shift (boundary hand-off) build on. Only balance degrades under
  * heavy first-key ties; a key too coarse to fill ~numParts buckets is
  * rejected (None) and callers fall back to the sampled full-tuple
  * range partitioner + persisted snapshot, which can use the remaining
  * order keys to split ties. */
private[operators] object RangeBuckets {

  /** The full tier selection both global operators run: the split-point
    * tier when [[tryBucket]] accepts, else the sampled full-tuple range
    * partitioner with a persisted MEMORY_AND_DISK snapshot (the frame
    * the caller must keep cached while its plan is executable). Returns
    * (pid-stamped frame, Some(snapshot) on the legacy tier). */
  def bucketOrSnapshot(keyed: DataFrame,
                       firstOrderType: org.apache.spark.sql.types.DataType,
                       firstOkName: String, okCols: Seq[Column],
                       numParts: Int): (DataFrame, Option[DataFrame]) =
    tryBucket(keyed, firstOrderType, firstOkName, numParts) match {
      case Some(p) => (p, None)
      case None =>
        val p = keyed.repartitionByRange(numParts, okCols: _*)
          .withColumn("__pid", spark_partition_id())
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        (p, Some(p))
    }

  /** Stamp `keyed` with a deterministic contiguous-range bucket id
    * `__pid` (int, 0-based in bucket order) derived from literal split
    * points of the first order key, or None when the key type is not
    * orderable to long/double or too coarse for ~numParts buckets. */
  def tryBucket(keyed: DataFrame,
                firstOrderType: org.apache.spark.sql.types.DataType,
                firstOkName: String, numParts: Int): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val bk: Option[(Column, Boolean)] = firstOrderType match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some((col(firstOkName).cast("long"), true))
      case TimestampType => // epoch seconds: truncation is monotone, and
        Some((col(firstOkName).cast("long"), true)) // ties → one bucket
      case FloatType | DoubleType =>
        Some((col(firstOkName).cast("double"), false))
      case _ => None
    }
    bk.flatMap { case (bkCol, integral) =>
      val probs = (1 until numParts).map(_.toDouble / numParts).toArray
      val q = keyed.select(bkCol.cast("double").as("__bk"))
        .stat.approxQuantile("__bk", probs, 0.001).toSeq
      val splits = (if (integral) q.map(Math.floor) else q).distinct.sorted
      if (splits.size < math.max(1, numParts / 2)) None
      else {
        val pid = splits.map { s =>
          val boundary = if (integral) lit(Math.floor(s).toLong) else lit(s)
          when(bkCol >= boundary, 1).otherwise(0)
        }.reduce(_ + _)
        Some(keyed.withColumn("__pid", pid))
      }
    }
  }
}
