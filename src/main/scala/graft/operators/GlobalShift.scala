package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, IntegerType, StructField, StructType}

/** Whole-table (global, empty-`partitionBy`) lag/lead WITHOUT the
  * single-partition window a naive `lag() OVER (ORDER BY …)` plans — the
  * [[GlobalRank]] two-pass pattern applied to shifts. The reference's
  * shift is a physical whole-column move (`column.nim:1177-1213`), which
  * a distributed engine must not replicate by funneling the table
  * through one task (the documented small-data-only fallback
  * `DataTable.withLag` used to be the only option).
  *
  * Pass 1 range-partitions on the order keys (persisted snapshot — the
  * boundaries are job-specific, see the alignment scaladoc on
  * [[GlobalRank.build]]; same discipline here) and collects each
  * partition's BOUNDARY STRIP: the last `n` rows' shift values (for
  * lag; first `n` for lead) — at most n × numPartitions tiny rows,
  * bounded by the shuffle-partition count, never by data. Pass 2 runs
  * an ordinary parallel per-partition window shift — exact for every
  * row beyond the first/last `n` of its partition, because range
  * partitions are contiguous in the global order — and fills those
  * boundary rows from the strips via a broadcast (pid, rn) join:
  * the first row of each partition takes the previous partition's
  * tail, which is exactly the hand-off GlobalShiftSuite pins.
  *
  * CONTRACT: `order` must be a UNIQUE total order (the
  * [[graft.api.DataTable.withNtile]] rule): a shift is positional, so
  * under ties both the result and the cross-engine replay would be
  * nondeterministic. Plain ascending value columns only (the
  * [[GlobalRank]] key contract); non-null keys for cross-engine
  * bit-exactness (Spark ASC NULLS FIRST vs DuckDB NULLS LAST).
  *
  * Snapshot lifecycle mirrors [[GlobalRank]]: the returned plan reads
  * through a MEMORY_AND_DISK snapshot that must stay cached while the
  * plan can still be executed. Plain calls register in a process-wide
  * registry released by the harness ([[releaseSnapshots]]); library
  * callers use the releasable variant. */
object GlobalShift {

  /** Append global `lag(c, n)` over `order` as column `name` (`default`
    * when fewer than `n` rows precede globally). Registers its snapshot
    * in the harness registry — see [[releaseSnapshots]]. */
  def withGlobalLag(df: DataFrame, name: String, c: Column, n: Int,
                    order: Seq[Column], default: Any = null): DataFrame =
    registered(build(df, name, c, n, order, default, isLead = false))

  /** Append global `lead(c, n)` over `order` as column `name`. */
  def withGlobalLead(df: DataFrame, name: String, c: Column, n: Int,
                     order: Seq[Column], default: Any = null): DataFrame =
    registered(build(df, name, c, n, order, default, isLead = true))

  /** Per-call-release twin (the [[GlobalRank.withGlobalRanksReleasable]]
    * contract: never execute the returned plan after releasing). */
  def withGlobalLagReleasable(df: DataFrame, name: String, c: Column, n: Int,
                              order: Seq[Column], default: Any = null)
      : (DataFrame, () => Boolean) = {
    val (out, snap) = build(df, name, c, n, order, default, isLead = false)
    (out, mkRelease(Some(snap)))
  }

  def withGlobalLeadReleasable(df: DataFrame, name: String, c: Column, n: Int,
                               order: Seq[Column], default: Any = null)
      : (DataFrame, () => Boolean) = {
    val (out, snap) = build(df, name, c, n, order, default, isLead = true)
    (out, mkRelease(Some(snap)))
  }

  private def registered(r: (DataFrame, DataFrame)): DataFrame = {
    liveSnapshots.synchronized { liveSnapshots += mkRelease(Some(r._2)) }
    r._1
  }

  private def mkRelease(snap: Option[DataFrame]): () => Boolean = {
    val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    () => {
      val first = released.compareAndSet(false, true)
      if (first) snap.foreach(_.unpersist(blocking = false))
      first && snap.nonEmpty
    }
  }

  private val liveSnapshots =
    scala.collection.mutable.ArrayBuffer.empty[() => Boolean]

  def liveSnapshotCount: Int = liveSnapshots.synchronized(liveSnapshots.size)

  /** Unpersist every snapshot pinned by plain calls — HARNESS-ONLY, the
    * [[GlobalRank.releaseSnapshots]] rule: safe only when no returned
    * plan will be executed again. Returns the number released. */
  def releaseSnapshots(): Int = liveSnapshots.synchronized {
    val n = liveSnapshots.count(_())
    liveSnapshots.clear()
    n
  }

  /** Core. Returns (shifted plan, the persisted snapshot it reads
    * through). */
  /** Hard bound on strip/fill rows (n × partitions). Beyond it the
    * "boundary hand-off" framing is false — pass 1's collect and the
    * broadcast fill would scale with the shift distance, the exact
    * driver funnel this operator exists to avoid. ~4M (pid, rn, value)
    * rows ≈ 128 MB of transient driver heap at 32-byte values. */
  private val MaxBoundaryRows: Long = 1L << 22

  /** `tamperCountsForTest` is a TEST SEAM (identity in production): it
    * distorts only the GUARD's view of the pass-1 counts, so the suite
    * can simulate a pass-2/pass-1 partition mismatch — the snapshot
    * recompute case — without having to force real block loss. */
  private[graft] def build(df: DataFrame, name: String, c: Column, n: Int,
                    order: Seq[Column], default: Any,
                    isLead: Boolean,
                    tamperCountsForTest: Map[Int, Long] => Map[Int, Long] =
                      identity): (DataFrame, DataFrame) = {
    require(order.nonEmpty, "GlobalShift: need at least one order column")
    require(n >= 1, s"GlobalShift: n must be >= 1, got $n")
    val okNames = order.indices.map(i => s"__ok$i")
    // reserved internal names: withColumn would silently OVERWRITE an
    // input column of the same name and the final drop would erase it —
    // fail loudly instead (the operator's guard discipline)
    val reserved = okNames.toSet ++
      Set("__sv", "__pid", "__bi", "__fill", "__have", "__has", "__j")
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty,
      s"GlobalShift: input columns ${clash.mkString(", ")} collide with " +
        "reserved internal names (__sv, __pid, __bi, __fill, __have, " +
        "__has, __j, __ok<i>) — rename them first")
    // the OUTPUT name hits the same machinery: the result would be
    // written into an internal slot and erased by the closing drop —
    // the caller would get a frame with no output column at all
    require(!reserved(name),
      s"GlobalShift: output name '$name' collides with a reserved " +
        "internal name — pick another")
    val keyed = order.zip(okNames)
      .foldLeft(df) { case (d, (oc, nm)) => d.withColumn(nm, oc) }
      .withColumn("__sv", c) // shift source materialized pre-shuffle
    val okCols = okNames.map(col)
    // explicit partition count — exempt from per-job AQE coalescing,
    // so the strip job and the shift job run the identical exchange
    // (the GlobalRank alignment discipline)
    val numParts = df.sparkSession.sessionState.conf.numShufflePartitions
    require(n.toLong * numParts <= MaxBoundaryRows,
      s"GlobalShift: shift distance $n × $numParts partitions = " +
        s"${n.toLong * numParts} boundary rows exceeds $MaxBoundaryRows — " +
        "a shift this deep is not a boundary hand-off any more (pass 1 " +
        "would collect and re-broadcast O(n × partitions) rows); " +
        "reformulate as a join on global rank, or reduce n")
    val parted = keyed.repartitionByRange(numParts, okCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // pass 1 (materializes the snapshot): boundary strips — per
    // partition, the n rows nearest the boundary the shift reaches
    // across (__j = 1 is the row AT the boundary), ≤ n × numParts rows
    val stripOrder = if (isLead) okCols else okCols.map(_.desc)
    val stripW = Window.partitionBy(col("__pid")).orderBy(stripOrder: _*)
    val strip = parted
      .withColumn("__j", row_number().over(stripW))
      .filter(col("__j") <= n)
      .select(col("__pid"), col("__j"), col("__sv"))
      .collect()
    val byPid: Map[Int, Seq[(Int, Any)]] = strip
      .map(r => (r.getInt(0), (r.getInt(1), r.get(2))))
      .groupBy(_._1).map { case (p, a) => (p, a.map(_._2).toSeq.sortBy(_._1)) }
    val pids = byPid.keys.toSeq.sorted
    // per-partition row counts (tiny second pass-1 job over the cached
    // snapshot), load-bearing on BOTH paths: (1) they translate "i-th
    // row from the reached boundary" into the ASCENDING row_number pass
    // 2 already computes, so the lead path shares ONE per-partition
    // sort with the shift window instead of adding an opposite-order
    // sort of the whole table; (2) they bound every partition at
    // Int.MaxValue rows — row_number's IntegerType wraps past that and
    // a wrapped interior row could silently collide with a boundary
    // fill key — and (3) their key set is the misalignment-guard domain
    // below (the GlobalRank rule)
    val counts: Map[Int, Long] = parted.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    counts.foreach { case (p, cnt) =>
      require(cnt <= Int.MaxValue,
        s"GlobalShift: range partition $p holds $cnt rows — row_number " +
          "wraps past Int.MaxValue and boundary fills would be silently " +
          "wrong; raise spark.sql.shuffle.partitions")
    }

    // driver-side hand-off: for target partition p, the cross-boundary
    // sequence b[1], b[2], … (b[1] = nearest row beyond p's boundary in
    // shift direction) is the in-order concat of neighbor strips —
    // partitions contribute at most their strip (n rows) each, so the
    // first n of the concat are exactly the rows any boundary row of p
    // can need. Row with boundary index i (i-th from the reached
    // boundary, 1-based) needs b[n - i + 1]; a fill row is emitted for
    // EVERY boundary position (with `__have` = false when no global
    // predecessor/successor exists) so the join match itself marks
    // "boundary row" and the miss side is always the local shift.
    val fillRows = pids.flatMap { p =>
      val sources = if (isLead) pids.filter(_ > p) else pids.filter(_ < p).reverse
      val b = sources.flatMap(q => byPid(q).map(_._2)).take(n)
      val cnt = counts(p)
      (1 to n).flatMap { i =>
        // ascending row_number of the row i-from-the-boundary: the
        // reached boundary is the partition START for lag, END for lead
        val rn = if (isLead) cnt - i + 1 else i.toLong
        if (rn < 1) None
        else {
          val j = n - i + 1
          val have = b.length >= j
          Some(Row(p, rn.toInt, if (have) b(j - 1) else null, have))
        }
      }
    }
    val svType = parted.schema("__sv").dataType
    val spark = df.sparkSession
    val fillDf = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(fillRows).asJava),
      StructType(Seq(StructField("__pid", IntegerType, nullable = false),
        StructField("__bi", IntegerType, nullable = false),
        StructField("__fill", svType, nullable = true),
        StructField("__have", BooleanType, nullable = false))))
      .withColumn("__has", lit(true))

    // pass 2: ordinary parallel per-partition shift; boundary rows
    // (join-matched) take the broadcast fill instead — a conditional,
    // NOT coalesce, so a genuine null shift value in the interior
    // survives. row_number and the shift share the SAME window spec,
    // so the final plan carries one per-partition sort total.
    val w = Window.partitionBy(col("__pid")).orderBy(okCols: _*)
    val localShift =
      if (isLead) lead(col("__sv"), n).over(w) else lag(col("__sv"), n).over(w)
    val biCol = row_number().over(w)
    // misalignment guard (the GlobalRank rule): if pass 2 recomputes
    // lost snapshot blocks, range boundaries are resampled per job and
    // pass 2's partitions no longer match pass 1's count map — boundary
    // rows would then silently miss (or misattach) their fills. Two
    // checks, both in-plan: (1) the pass-2 pid must exist in the pass-1
    // map; (2) PASS-PARITY: the pass-2 partition's recount (an
    // unbounded count over the same __pid partitioning — it reuses the
    // pass-2 sort, no extra exchange) must EQUAL pass 1's count. (2)
    // catches the resampled-boundaries-same-pid-set recompute (1)
    // cannot: any row that moved across a boundary changes some
    // partition's count. Still best-effort — a pathological resample
    // that permutes rows while preserving every per-pid count would
    // pass both — so the snapshot persist + managed/releasable
    // lifecycle remains the actual correctness mechanism; the guard
    // converts the likely failure modes into loud errors. Skipped only
    // on empty input (no rows can reach the guard anyway).
    val guardCounts = tamperCountsForTest(counts)
    val guardedBi =
      if (guardCounts.isEmpty) biCol
      else {
        val known = element_at(typedLit(guardCounts), col("__pid"))
        val recount = count(lit(1)).over(Window.partitionBy(col("__pid")))
        when(known.isNull || known =!= recount, raise_error(concat(
          lit("GlobalShift: range-partition misalignment between strip " +
            "and shift passes (snapshot recomputed with different " +
            "boundaries?), pid="),
          col("__pid").cast("string"),
          lit(" pass1="), coalesce(known.cast("string"), lit("absent")),
          lit(" pass2="), recount.cast("string")))).otherwise(biCol)
      }
    val defLit =
      if (default == null) lit(null).cast(svType) else lit(default).cast(svType)
    val out = parted
      .withColumn("__bi", guardedBi)
      .join(broadcast(fillDf), Seq("__pid", "__bi"), "left")
      .withColumn(name,
        when(col("__has"), when(col("__have"), col("__fill")).otherwise(defLit))
          .otherwise(localShift))
      .drop(okNames ++ Seq("__pid", "__bi", "__sv", "__fill", "__have", "__has"): _*)
    (out, parted)
  }
}
