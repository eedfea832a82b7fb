package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared snapshot-lifecycle scaffold for the two-pass global operators
  * ([[GlobalRank]], [[GlobalShift]], [[GlobalCumSum]]): the legacy
  * sampled-range tier pins one MEMORY_AND_DISK snapshot per plain call,
  * tracked here so the harness-level wipe can release them between
  * queries. Previously triplicated verbatim in all three operators
  * (round-16 review finding) — one trait, one semantics.
  *
  * The release rules are [[GlobalRank]]'s, stated once: never execute a
  * returned plan after releasing its snapshot (range boundaries are
  * job-specific — a re-derivation can misalign silently), and
  * [[releaseSnapshots]] is HARNESS-ONLY (safe only for a caller that
  * owns every in-flight plain call). */
private[graft] trait SnapshotRegistry {

  /** Idempotent single-snapshot release closure (true iff this
    * invocation released a real snapshot). */
  protected def mkRelease(snap: Option[DataFrame]): () => Boolean = {
    val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    () => {
      val first = released.compareAndSet(false, true)
      if (first) snap.foreach(_.unpersist(blocking = false))
      first && snap.nonEmpty
    }
  }

  private val liveSnapshots =
    scala.collection.mutable.ArrayBuffer.empty[() => Boolean]

  /** Track a plain call's snapshot (no-op for split-tier None). */
  protected def register(snap: Option[DataFrame]): Unit =
    snap.foreach { s =>
      liveSnapshots.synchronized { liveSnapshots += mkRelease(Some(s)) }
    }

  /** Snapshots currently pinned by plain calls (monitoring / tests). */
  def liveSnapshotCount: Int = liveSnapshots.synchronized(liveSnapshots.size)

  /** Unpersist every snapshot pinned by plain calls — HARNESS-ONLY (see
    * trait scaladoc). Returns the number released. */
  def releaseSnapshots(): Int = liveSnapshots.synchronized {
    val n = liveSnapshots.count(_())
    liveSnapshots.clear()
    n
  }
}

/** The one harness entry point: releases every two-pass operator's
  * pinned snapshots. Bench/BenchOne/Verify/ExplainQuery call this
  * between queries instead of remembering one call per operator (the
  * forgettable-call-site hazard the round-16 review flagged). */
object GlobalOps {
  def releaseSnapshots(): Int =
    GlobalRank.releaseSnapshots() + GlobalShift.releaseSnapshots() +
      GlobalCumSum.releaseSnapshots() + PlanCache.releaseSnapshots()
}
