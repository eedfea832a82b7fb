package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whole-table (global) rank family WITHOUT the single-partition window a
  * naive `rank() OVER (ORDER BY …)` plans — the classic two-pass pattern:
  * range-partition on the order keys, rank locally per partition, then add
  * broadcast per-partition offsets. Beyond-reference extension (the
  * reference ranks by sorting the whole frame in one process,
  * `dataframe.nim:2298-2341`-adjacent; a distributed engine must not).
  *
  * Pass 1 aggregates per-range-partition row/distinct-key counts (one
  * tiny row per partition, collected to the driver and prefix-summed —
  * bounded by the shuffle-partition count, never by data). Pass 2 ranks
  * inside each range partition with an ordinary parallel window and adds
  * the offsets as a scan-local map lookup. Equal keys land in the same
  * range partition by construction, so ties never straddle partitions and
  *   global rank       = partition row offset + local rank
  *   global dense_rank = partition key offset + local dense_rank
  *   percent_rank      = (rank − 1) / (N − 1)
  *   cume_dist         = (rank + tie_size − 1) / N
  * — every derivation a single division of exact integers, so the doubles
  * are bit-identical cross-engine (oracle-proven by `q_global_rank`).
  *
  * Scale shape: max task size is ~N / shuffle-partitions rows (plus tie
  * skew), asserted in GlobalRankSuite — parallelism grows with the
  * cluster instead of being capped at 1 (or at the cardinality of some
  * low-card partition key). The order keys are exchanged twice (the
  * stats pass and the rank pass are separate jobs); both exchanges are
  * full-width, and at 100 TB the alternative — one partition sorting
  * everything — is not an alternative.
  *
  * Cross-job alignment: pass 1's offsets are only valid if pass 2 lands
  * every row in the same range partition. That holds because Spark's
  * range boundaries come from reservoir sampling seeded per input
  * partition index (deterministic) over a deterministic source, so the
  * two jobs derive identical boundaries; callers feeding a
  * NON-deterministic source (e.g. a fresh `rand()` column) must
  * checkpoint/persist it first — same contract as every deterministic
  * sampler in this library. */
object GlobalRank {

  /** Append global `rnk`/`drnk`/`prnk`/`cdist` over `order`. Tie-stable:
    * a non-unique order still yields deterministic values (ntile is
    * excluded here for exactly that reason — see DataTable.withNtile). */
  def withGlobalRanks(df: DataFrame, order: Seq[Column],
                      rankName: String = "rnk", denseName: String = "drnk",
                      pctName: String = "prnk", cumeName: String = "cdist"): DataFrame = {
    require(order.nonEmpty, "withGlobalRanks: need at least one order column")
    val okNames = order.indices.map(i => s"__ok$i")
    val keyed = order.zip(okNames).foldLeft(df) { case (d, (c, n)) => d.withColumn(n, c) }
    val okCols = okNames.map(col)
    val parted = keyed.repartitionByRange(okCols: _*)
      .withColumn("__pid", spark_partition_id())

    // pass 1: per-partition row + distinct-key counts (one row/partition)
    val stats = parted.groupBy("__pid").agg(
      count(lit(1)).as("__rows"),
      count_distinct(struct(okCols: _*)).as("__keys"))
      .collect().map(r => (r.getAs[Int]("__pid"),
        r.getAs[Long]("__rows"), r.getAs[Long]("__keys")))
      .sortBy(_._1)
    val total = stats.map(_._2).sum
    // empty input: no stats rows → typedLit of an empty map has no value
    // type to infer; short-circuit with the same (empty) schema
    if (total == 0L)
      return df
        .withColumn(rankName, lit(null).cast("long"))
        .withColumn(denseName, lit(null).cast("long"))
        .withColumn(pctName, lit(null).cast("double"))
        .withColumn(cumeName, lit(null).cast("double"))
        .filter(lit(false))
    val rowOff = stats.map(_._1).zip(stats.scanLeft(0L)(_ + _._2).init).toMap
    val keyOff = stats.map(_._1).zip(stats.scanLeft(0L)(_ + _._3).init).toMap

    // pass 2: ordinary parallel windows inside each range partition
    val w = Window.partitionBy("__pid").orderBy(okCols: _*)
    val tieW = Window.partitionBy((col("__pid") +: okCols): _*)
    val rnk = element_at(typedLit(rowOff), col("__pid")) + rank().over(w)
    val drnk = element_at(typedLit(keyOff), col("__pid")) + dense_rank().over(w)
    // SQL defines percent_rank of a 1-row table as 0.0 — avoid 0/0
    val prnk =
      if (total > 1L)
        (col(rankName) - lit(1L)).cast("double") / lit((total - 1L).toDouble)
      else lit(0.0)
    parted
      .withColumn(rankName, rnk)
      .withColumn(denseName, drnk)
      .withColumn("__tie", count(lit(1)).over(tieW))
      .withColumn(pctName, prnk)
      .withColumn(cumeName,
        (col(rankName) + col("__tie") - lit(1L)).cast("double") / lit(total.toDouble))
      .drop(okNames :+ "__pid" :+ "__tie": _*)
  }
}
