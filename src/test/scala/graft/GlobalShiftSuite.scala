package graft

import org.apache.spark.sql.functions._
import graft.operators.GlobalShift

/** Pins the two-pass global lag/lead (VERDICT r13 #4): exact equality
  * with the single-partition reference shift, the boundary hand-off
  * (first rows of each range partition take the previous partition's
  * tail), and the no-SinglePartition plan shape that is the operator's
  * whole reason to exist. */
class GlobalShiftSuite extends SparkSpec {
  import spark.implicits._

  /** 100 unique keys scattered so repartitionByRange(4) actually splits
    * them (asserted below — a one-partition accident would make the
    * hand-off vacuous). */
  private def frame = (1 to 100).map(i => (i.toLong, i * 10L)).reverse
    .toDF("k", "v").repartition(8)

  private def expectedLag(n: Int): Seq[Option[Long]] =
    (1 to 100).map(i => if (i - n >= 1) Some((i - n) * 10L) else None)

  private def expectedLead(n: Int): Seq[Option[Long]] =
    (1 to 100).map(i => if (i + n <= 100) Some((i + n) * 10L) else None)

  private def got(df: org.apache.spark.sql.DataFrame, c: String): Seq[Option[Long]] =
    df.orderBy("k").select(c).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq

  test("global lag matches the single-partition reference for n = 1, 3, 7") {
    for (n <- Seq(1, 3, 7)) {
      val (out, release) = GlobalShift.withGlobalLagReleasable(
        frame, "prev", col("v"), n, Seq(col("k")))
      assert(got(out, "prev") == expectedLag(n), s"lag n=$n")
      release()
    }
  }

  test("global lead matches the single-partition reference for n = 1, 3, 7") {
    for (n <- Seq(1, 3, 7)) {
      val (out, release) = GlobalShift.withGlobalLeadReleasable(
        frame, "next", col("v"), n, Seq(col("k")))
      assert(got(out, "next") == expectedLead(n), s"lead n=$n")
      release()
    }
  }

  test("the data really spans several range partitions (hand-off not vacuous)") {
    val parts = frame.repartitionByRange(4, col("k"))
      .select(spark_partition_id()).distinct().count()
    assert(parts > 1, s"expected multiple range partitions, got $parts")
  }

  test("boundary hand-off: first row of a partition takes the previous tail") {
    // with 100 rows over 4 range partitions, every partition holds ~25
    // rows, so n=1 fills exactly the 3 interior partition-start rows
    // from across the boundary — if the hand-off were broken those rows
    // would be null/default, not the true predecessor
    val (out, release) = GlobalShift.withGlobalLagReleasable(
      frame, "prev", col("v"), 1, Seq(col("k")), default = -1L)
    val vals = got(out, "prev")
    assert(vals.head == Some(-1L), "global first row takes the default")
    assert(vals.tail == expectedLag(1).tail.map(_.orElse(Some(-1L))),
      "every non-first row must see its true global predecessor")
    release()
  }

  test("default fills only positions with no global predecessor/successor") {
    val (out, release) = GlobalShift.withGlobalLagReleasable(
      frame, "prev", col("v"), 5, Seq(col("k")), default = 0L)
    assert(got(out, "prev") == expectedLag(5).map(_.orElse(Some(0L))))
    release()
  }

  test("a genuine null shift value in the interior survives (no coalesce bug)") {
    val df = (1 to 40).map(i =>
      (i.toLong, if (i == 20) None else Some(i * 10L))).toDF("k", "v")
      .repartition(4)
    val (out, release) = GlobalShift.withGlobalLagReleasable(
      df, "prev", col("v"), 1, Seq(col("k")), default = -1L)
    val vals = got(out, "prev")
    assert(vals(20) == None, "row 21 sees row 20's genuine null, not the default")
    assert(vals(0) == Some(-1L))
    release()
  }

  test("n larger than any partition still hands off across several boundaries") {
    // 4 range partitions of ~25 rows each, n=30: every row's shift
    // crosses at least one boundary and some cross two
    val (out, release) = GlobalShift.withGlobalLagReleasable(
      frame, "prev", col("v"), 30, Seq(col("k")))
    assert(got(out, "prev") == expectedLag(30))
    release()
  }

  test("plan has no SinglePartition exchange (the operator's reason to exist)") {
    val (out, release) = GlobalShift.withGlobalLagReleasable(
      frame, "prev", col("v"), 2, Seq(col("k")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
    release()
  }

  test("lead's final plan sorts each partition once (shared window spec)") {
    val (out, release) = GlobalShift.withGlobalLeadReleasable(
      frame, "next", col("v"), 2, Seq(col("k")))
    val plan = out.queryExecution.executedPlan.toString
    // row_number and lead ride one Window over [__ok0 ASC]; a second,
    // descending boundary-index window would show as "DESC" sort keys
    assert(!plan.contains("DESC"), plan)
    release()
  }

  test("withGlobalShifts computes mixed lag+lead in one two-pass run") {
    val out = GlobalShift.withGlobalShifts(frame,
      Seq(GlobalShift.Shift("prev", col("v"), 2, isLead = false, default = -1L),
        GlobalShift.Shift("next", col("v"), 3, isLead = true)),
      Seq(col("k")))
    assert(got(out, "prev") == expectedLag(2).map(_.orElse(Some(-1L))))
    assert(got(out, "next") == expectedLead(3))
    assert(out.columns.toSeq == Seq("k", "v", "prev", "next"))
  }

  test("multi-shift: deep lead + shallow lag cross several boundaries together") {
    val out = GlobalShift.withGlobalShifts(frame,
      Seq(GlobalShift.Shift("next", col("v"), 30, isLead = true),
        GlobalShift.Shift("prev", col("v"), 1, isLead = false)),
      Seq(col("k")))
    assert(got(out, "next") == expectedLead(30))
    assert(got(out, "prev") == expectedLag(1))
  }

  test("split-point tier plan reads no snapshot (no InMemoryTableScan)") {
    val (out, release) = GlobalShift.withGlobalLagReleasable(
      frame, "prev", col("v"), 2, Seq(col("k")))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("InMemoryTableScan"), plan)
    release()
  }

  test("a shift deeper than the boundary-row bound refuses up front") {
    val e = intercept[IllegalArgumentException] {
      GlobalShift.withGlobalLagReleasable(
        frame, "prev", col("v"), 1 << 21, Seq(col("k")))
    }
    assert(e.getMessage.contains("boundary rows"), e.getMessage)
  }

  test("releasable handle: no snapshot to release on the split-point tier") {
    // long first key -> deterministic literal buckets, nothing persists
    val (_, release) = GlobalShift.withGlobalLagReleasable(
      frame, "prev", col("v"), 1, Seq(col("k")))
    assert(!release())
  }

  test("releasable handle is idempotent and reports one real release (legacy tier)") {
    // struct first key -> not in the split-point tier's type set (decimal
    // and date now are) -> sampled range partitioner + persisted snapshot;
    // struct(k) is order-isomorphic to k, so exactness still holds
    val sframe = frame.withColumn("ks", struct(col("k")))
    val (out, release) = GlobalShift.withGlobalLagReleasable(
      sframe, "prev", col("v"), 1, Seq(col("ks")))
    assert(got(out, "prev") == expectedLag(1), "legacy tier stays exact")
    assert(release())
    assert(!release())
  }

  test("string first key with a shared prefix: split-point tier, no persist, exact") {
    // the crawl-scale case (VERDICT r15 #3): a text order key whose
    // values all share a long common prefix — the binary-prefix tier
    // must strip the prefix, bucket on the next bytes, persist NOTHING,
    // and stay exactly equal to the reference shift
    val sframe = frame.withColumn(
      "ks", concat(lit("https://www.example.com/page-"),
        format_string("%09d", col("k"))))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (out, release) = GlobalShift.withGlobalLagReleasable(
      sframe, "prev", col("v"), 1, Seq(col("ks")))
    assert(got(out, "prev") == expectedLag(1), "string split tier stays exact")
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "string split-point tier must not persist anything")
    assert(!release(), "nothing to release on the string split tier")
  }

  test("empty input yields an empty shifted frame") {
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    val (out, release) = GlobalShift.withGlobalLagReleasable(
      empty, "prev", col("v"), 2, Seq(col("k")))
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("k", "v", "prev"))
    release()
  }

  test("input columns colliding with reserved internal names refuse up front") {
    val bad = frame.withColumn("__pid", lit(7))
    val e = intercept[IllegalArgumentException] {
      GlobalShift.withGlobalLagReleasable(
        bad, "prev", col("v"), 1, Seq(col("k")))
    }
    assert(e.getMessage.contains("__pid"), e.getMessage)
    // __ok<i> order-key aliases are reserved too
    val bad2 = frame.withColumn("__ok0", lit(1))
    val e2 = intercept[IllegalArgumentException] {
      GlobalShift.withGlobalLeadReleasable(
        bad2, "next", col("v"), 1, Seq(col("k")))
    }
    assert(e2.getMessage.contains("__ok0"), e2.getMessage)
    // a reserved OUTPUT name would be written into the internal slot
    // and erased by the closing drop — refuse it the same way
    val e3 = intercept[IllegalArgumentException] {
      GlobalShift.withGlobalLagReleasable(
        frame, "__sv", col("v"), 1, Seq(col("k")))
    }
    assert(e3.getMessage.contains("output name"), e3.getMessage)
  }

  test("pass-1 bounded tier plans rank-limit windows, not a full-sort strip (r22)") {
    // the r22 at-scale pass-1 shape: two rank-limit windows + a hash-agg
    // count, each strip filter directly above its window so Catalyst
    // inserts WindowGroupLimit (map-side bounded selection) — the
    // full-data exchange+sort of the exchange-tier strip must be gone
    GlobalShift.captureStripPlanForTest = true
    GlobalShift.forceBoundedStripForTest = Some(true)
    try {
      val out = GlobalShift.withGlobalShifts(frame,
        Seq(GlobalShift.Shift("prev", col("v"), 2, isLead = false),
          GlobalShift.Shift("next", col("v"), 3, isLead = true)),
        Seq(col("k")))
      out.write.format("noop").mode("overwrite").save()
      val plan = GlobalShift.lastStripPlanForTest
      assert(plan.contains("WindowGroupLimit"),
        s"strip must plan bounded WindowGroupLimit selection:\n$plan")
      assert(plan.contains("HashAggregate"),
        s"per-bucket counts must come from a hash aggregate:\n$plan")
      // lag strip orders descending — the k-th-from-END selection
      assert(plan.contains("DESC"),
        s"tail strip must plan the descending rank-limit window:\n$plan")
    } finally {
      GlobalShift.captureStripPlanForTest = false
      GlobalShift.forceBoundedStripForTest = None
    }
  }

  test("pass-1 strip tiers agree: bounded and exchange shapes, identical hand-off") {
    // the tier rule picks by input size; both shapes must produce the
    // exact same shifted frame (the bounded tier's descending row_number
    // k ≡ the exchange tier's ascending index cnt − k + 1)
    def run(bounded: Boolean) = {
      GlobalShift.forceBoundedStripForTest = Some(bounded)
      try {
        val out = GlobalShift.withGlobalShifts(frame,
          Seq(GlobalShift.Shift("prev", col("v"), 2, isLead = false, default = -1L),
            GlobalShift.Shift("next", col("v"), 30, isLead = true)),
          Seq(col("k")))
        (got(out, "prev"), got(out, "next"))
      } finally GlobalShift.forceBoundedStripForTest = None
    }
    val (bp, bn) = run(bounded = true)
    val (ep, en) = run(bounded = false)
    assert(bp == ep && bn == en, "strip tiers must be value-identical")
    assert(bp == expectedLag(2).map(_.orElse(Some(-1L))))
    assert(bn == expectedLead(30))
  }

  test("legacy (struct-key) tier: deep mixed lag+lead crossing several boundaries") {
    // the r22 strip rewrite indexes tails from the bucket END (descending
    // row_number) — exercise that indexing on the SAMPLED legacy tier,
    // where bucket sizes are uneven, with shifts deeper than a bucket
    val sframe = frame.withColumn("ks", struct(col("k")))
    val out = GlobalShift.withGlobalShifts(sframe,
      Seq(GlobalShift.Shift("prev", col("v"), 7, isLead = false, default = -1L),
        GlobalShift.Shift("next", col("v"), 30, isLead = true)),
      Seq(col("ks")))
    assert(got(out, "prev") == expectedLag(7).map(_.orElse(Some(-1L))))
    assert(got(out, "next") == expectedLead(30))
    GlobalShift.releaseSnapshots()
  }

  test("pass-parity guard trips loudly when pass-2 counts diverge from pass 1") {
    // simulate the snapshot-recompute case via the test seam: the guard
    // believes pass 1 saw one more row per partition than pass 2 has —
    // exactly what a boundary-resampling recompute looks like from the
    // guard's vantage point
    val (out, snap) = GlobalShift.build(
      frame, Seq(GlobalShift.Shift("prev", col("v"), 2, isLead = false)),
      Seq(col("k")),
      tamperCountsForTest = m => m.map { case (p, n) => p -> (n + 1) })
    val e = intercept[Exception] { out.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("misalignment")), e)
    snap.foreach(_.unpersist())
    // untampered, the same build executes clean (the guard recount
    // matches pass 1) — pinning that the parity check has no false trips
    val (ok, snap2) = GlobalShift.build(
      frame, Seq(GlobalShift.Shift("prev", col("v"), 2, isLead = false)),
      Seq(col("k")))
    assert(got(ok, "prev") == expectedLag(2))
    snap2.foreach(_.unpersist())
  }
}
