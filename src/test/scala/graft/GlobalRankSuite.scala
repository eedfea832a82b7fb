package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** Two-pass global rank: value parity with the naive single-partition
  * window (which is the semantics, just not an acceptable plan), tie
  * behavior across range-partition boundaries, empty input, and the plan
  * shape that makes it 100×-safe — range partitioning, never a
  * SinglePartition exchange, per-partition share bounded by the shuffle
  * fan-out instead of a partition-key's cardinality. */
class GlobalRankSuite extends SparkSpec {

  import spark.implicits._

  /** 400 rows over 7 input partitions with heavy ties (values 0..9 repeat
    * 40× each) — every tie group is larger than a naive even split, so any
    * tie straddling a range boundary would corrupt rank/dense_rank. */
  private def tied = spark.range(400)
    .select((col("id") % 10).as("v"), col("id").as("rid"))
    .repartition(7)

  /** Unique values — exercises the rank==dense_rank==row position case. */
  private def uniq = spark.range(1000)
    .select(((col("id") * 379) % 10007).as("v"), col("id").as("rid"))
    .repartition(5)

  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.orderBy(col("v"))
    df.withColumn("e_rnk", rank().over(w).cast("long"))
      .withColumn("e_drnk", dense_rank().over(w).cast("long"))
      .withColumn("e_prnk", percent_rank().over(w))
      .withColumn("e_cdist", cume_dist().over(w))
  }

  private def checkParity(df: org.apache.spark.sql.DataFrame): Unit = {
    val got = GlobalRank.withGlobalRanks(df, Seq(col("v")))
    val both = got.join(naive(df), "rid").collect()
    assert(both.length == df.count())
    both.foreach { r =>
      assert(r.getAs[Long]("rnk") == r.getAs[Long]("e_rnk"), s"rank: $r")
      assert(r.getAs[Long]("drnk") == r.getAs[Long]("e_drnk"), s"dense: $r")
      // exact ==, not epsilon: both sides are the same division of the
      // same exact integers — the operator's bit-exactness contract
      assert(r.getAs[Double]("prnk") == r.getAs[Double]("e_prnk"), s"pct: $r")
      assert(r.getAs[Double]("cdist") == r.getAs[Double]("e_cdist"), s"cume: $r")
    }
  }

  test("parity with single-partition window on tie-heavy data") {
    checkParity(tied)
  }

  test("parity with single-partition window on unique keys") {
    checkParity(uniq)
  }

  test("single-row and empty inputs") {
    val one = Seq((42L, 0L)).toDF("v", "rid")
    val r = GlobalRank.withGlobalRanks(one, Seq(col("v"))).collect()(0)
    assert(r.getAs[Long]("rnk") == 1L && r.getAs[Long]("drnk") == 1L)
    // SQL defines percent_rank of a 1-row frame as 0.0 (not 0/0)
    assert(r.getAs[Double]("prnk") == 0.0 && r.getAs[Double]("cdist") == 1.0)

    val empty = spark.emptyDataFrame.withColumn("v", lit(0L))
    val live0 = GlobalRank.liveSnapshotCount
    val e = GlobalRank.withGlobalRanks(empty, Seq(col("v")))
    assert(e.count() == 0L)
    assert(e.columns.toSeq == Seq("v", "rnk", "drnk", "prnk", "cdist"))
    // the empty-input short-circuit pins nothing — it must not register
    // a dead handle that makes liveSnapshotCount over-report
    assert(GlobalRank.liveSnapshotCount == live0)
  }

  test("plan: partitioned exchange, no SinglePartition anywhere") {
    // high-card long key -> split-point tier: the exchange hashes the
    // deterministic __pid buckets (legacy tier would show
    // rangepartitioning); either way, never SinglePartition
    val plan = GlobalRank.withGlobalRanks(uniq, Seq(col("v")))
      .queryExecution.executedPlan.toString
    val lower = plan.toLowerCase
    assert(lower.contains("hashpartitioning(__pid") ||
      lower.contains("rangepartitioning"), s"plan:\n$plan")
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
  }

  test("split-point tier: no snapshot pinned, release reports none, parity exact") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (ranked, release) = GlobalRank.withGlobalRanksReleasable(uniq, Seq(col("v")))
    assert(ranked.count() == 1000L)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "split-point tier must not persist anything")
    assert(!release(), "nothing to release on the split-point tier")
    checkParity(uniq)
  }

  test("date key: split-point tier (days-since-epoch image), no persist, exact") {
    // ingestion date is the most common global-order key in corpus work
    // (VERDICT r17 #3): DateType must ride the split tier — days since
    // epoch is already an exact monotone long image — persisting nothing
    val dated = spark.range(1000)
      .select(date_add(lit("2020-01-01").cast("date"),
        ((col("id") * 379) % 1500).cast("int")).as("v"), col("id").as("rid"))
      .repartition(5)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (ranked, release) = GlobalRank.withGlobalRanksReleasable(dated, Seq(col("v")))
    assert(ranked.count() == 1000L)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "date split-point tier must not persist anything")
    assert(!release(), "nothing to release on the date split tier")
    checkParity(dated)
  }

  test("string key with a corpus-wide common prefix: split tier, no persist, plan-pinned") {
    // the motivating 100 TB workload (VERDICT r15 #3): ranking by URL —
    // every value shares a long common prefix, so a naive first-K-bytes
    // image collapses to one bucket; the tier must strip the corpus-wide
    // common prefix (from one bounded min/max aggregate) and bucket on
    // the bytes after it, persisting nothing
    val urls = spark.range(1000)
      .select(concat(lit("https://www.example.com/page/"),
        format_string("%05d", (col("id") * 379) % 10007)).as("v"),
        col("id").as("rid"))
      .repartition(5)
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val (ranked, release) = GlobalRank.withGlobalRanksReleasable(urls, Seq(col("v")))
    assert(ranked.count() == 1000L)
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty,
      "string split-point tier must not persist anything")
    assert(!release(), "nothing to release on the string split tier")
    val plan = GlobalRank.withGlobalRanks(urls, Seq(col("v")))
      .queryExecution.executedPlan.toString
    val lower = plan.toLowerCase
    assert(lower.contains("hashpartitioning(__pid"),
      s"expected deterministic __pid buckets, got:\n$plan")
    assert(!lower.contains("inmemorytablescan"),
      s"string split tier must not read through a cached snapshot:\n$plan")
    checkParity(urls)
  }

  test("single-distinct-value string key falls back to the legacy tier, stays exact") {
    // min == max -> the prefix image is degenerate by construction; the
    // tier must reject and the sampled legacy path must still rank
    // (ties broken by nothing — all rank 1)
    val const = spark.range(100)
      .select(lit("https://only.example.com/").as("v"), col("id").as("rid"))
      .repartition(3)
    val (ranked, release) = GlobalRank.withGlobalRanksReleasable(const, Seq(col("v")))
    val rows = ranked.collect()
    assert(rows.length == 100 && rows.forall(_.getAs[Long]("rnk") == 1L))
    assert(release(), "legacy tier pins a snapshot the caller releases")
  }

  test("parity holds under AQE with coalescing forced (cross-job alignment)") {
    // The operator's correctness rests on the stats job and the rank job
    // deriving identical range partitions. AQE's partition coalescing is
    // the most plausible way for the two jobs to diverge, so force it:
    // adaptive on, a high initial fan-out that tiny data guarantees AQE
    // will rewrite, and coalescing explicitly enabled. Runtime stats over
    // a deterministic source are deterministic → both jobs must coalesce
    // identically, and ranks must still match the naive window.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "64")
      checkParity(tied)
      checkParity(uniq)
      // struct keys FORCE the legacy sampled-range + persist tier — the
      // path whose alignment this test was written to pin (numeric,
      // decimal, date, AND string keys now take split-point tiers, where
      // misalignment is impossible)
      checkParity(tied.select(struct(col("v")).as("v"), col("rid")))
      // the decimal unscaled-long split tier under the same AQE pressure
      checkParity(tied.select(
        col("v").cast("decimal(12,0)").as("v"), col("rid")))
      // and the string binary-prefix tier under the same AQE pressure
      checkParity(tied.select(
        format_string("%05d", col("v")).as("v"), col("rid")))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("parquet-backed tie-heavy source: parity survives job-specific range boundaries") {
    // THE regression case: Spark's range boundaries are sampled with a
    // seed involving the materialization-specific RDD id, so the stats
    // job and the rank job can cut a heavy tie group to different sides
    // (sf0.01 lineitem really did flip l_quantity=26 between two
    // count-by-pid jobs). The persisted snapshot freezes the assignment;
    // without it this test fails with ranks off by whole tie groups.
    val dir = java.nio.file.Files.createTempDirectory("graft_grank").toString
    try {
      spark.range(20000)
        .select(((col("id") * 7919) % 50).cast("double").as("v"), col("id").as("rid"))
        .repartition(9)
        .write.mode("overwrite").parquet(dir)
      checkParity(spark.read.parquet(dir))
      // legacy-tier twin: struct keys (same values, same heavy ties) go
      // through the sampled range partitioner + persisted snapshot — the
      // exact r10 regression this test exists for (decimal(12,2) rides
      // the r17 unscaled-long split tier now; keep it as that tier's
      // tie-heavy parquet parity pin)
      checkParity(spark.read.parquet(dir).select(
        struct(col("v")).as("v"), col("rid")))
      checkParity(spark.read.parquet(dir).select(
        col("v").cast("decimal(12,2)").as("v"), col("rid")))
      // string twin now rides the binary-prefix split tier — parity must
      // hold there too on the same tie-heavy parquet source
      checkParity(spark.read.parquet(dir).select(
        format_string("%09.2f", col("v")).as("v"), col("rid")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("managed variant releases the snapshot cache after use") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val n = GlobalRank.withGlobalRanksManaged(tied, Seq(col("v"))) { ranked =>
      assert(ranked.filter(col("rnk").isNull).count() == 0)
      ranked.count()
    }
    assert(n == 400L)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty, s"leaked cached RDDs: ${after -- before}")
  }

  test("bench-loop shape: N plain invocations + releaseSnapshots leave zero live snapshots") {
    // Bench/Verify run each query (a plain withGlobalRanks call), consume
    // the result fully, then call releaseSnapshots() — after the loop no
    // snapshot may stay pinned and no cached RDD may leak.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    GlobalRank.releaseSnapshots() // isolate from any earlier plain calls
    (1 to 3).foreach { _ =>
      val ranked = GlobalRank.withGlobalRanks(tied, Seq(col("v")))
      assert(ranked.count() == 400L) // consume before release
      GlobalRank.releaseSnapshots()
    }
    assert(GlobalRank.liveSnapshotCount == 0)
    assert(GlobalRank.releaseSnapshots() == 0) // nothing left to release
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty, s"leaked cached RDDs: ${after -- before}")
  }

  test("releasable handle frees only its own snapshot, idempotently") {
    // the per-call alternative to the process-wide wipe: two concurrent
    // callers must not be able to unpersist each other's snapshot
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val live0 = GlobalRank.liveSnapshotCount
    // struct keys -> always the legacy persist tier (numeric, decimal,
    // date, and string keys all take split-point tiers now, which pin
    // nothing and are tested separately); struct(v) orders exactly as v
    val tiedS = tied.select(struct(col("v")).as("v"), col("rid"))
    val uniqS = uniq.select(struct(col("v")).as("v"), col("rid"))
    val (r1, rel1) = GlobalRank.withGlobalRanksReleasable(tiedS, Seq(col("v")))
    val (r2, rel2) = GlobalRank.withGlobalRanksReleasable(uniqS, Seq(col("v")))
    assert(r1.count() == 400L && r2.count() == 1000L)
    val pinned = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinned.size == 2, s"expected 2 pinned snapshots, got $pinned")
    assert(rel1())
    assert(!rel1(), "second release must be a no-op")
    val remaining = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(remaining.size == 1, "releasing call 1 must not touch call 2")
    // call 2 is untouched and still consumable
    assert(r2.filter(col("rnk").isNull).count() == 0L)
    assert(rel2())
    assert((spark.sparkContext.getPersistentRDDs.keySet -- before).isEmpty)
    // handle-managed snapshots never enter the plain-call registry
    assert(GlobalRank.liveSnapshotCount == live0)
  }

  test("misalignment guard is wired: offset lookup raises instead of nulling") {
    // Real misalignment cannot be provoked from a deterministic source
    // (that's the point), so pin the guard's presence in the plan: the
    // rank projection must contain the raise_error branch, not a bare
    // element_at whose null would silently corrupt every rank.
    val analyzed = GlobalRank.withGlobalRanks(uniq, Seq(col("v")))
      .queryExecution.analyzed.toString
    assert(analyzed.contains("raise_error"), s"guard missing:\n$analyzed")
    assert(analyzed.contains("misalignment"), s"guard missing:\n$analyzed")
  }

  test("withGlobalNtile: SQL remainder rule, parity with the naive window") {
    // N=1000, b=7: q=142, r=6 — six buckets of 143, one of 142
    val got = GlobalRank.withGlobalNtile(uniq, 7, Seq(col("v")), "t")
    val w = Window.orderBy(col("v"))
    val exp = uniq.withColumn("e_t", ntile(7).over(w).cast("long"))
    val both = got.join(exp, "rid").collect()
    assert(both.length == 1000)
    both.foreach(r =>
      assert(r.getAs[Long]("t") == r.getAs[Long]("e_t"), s"ntile: $r"))
    val sizes = got.groupBy("t").count().collect()
      .map(r => r.getAs[Long]("t") -> r.getAs[Long]("count")).toMap
    assert(sizes == Map(1L -> 143L, 2L -> 143L, 3L -> 143L, 4L -> 143L,
      5L -> 143L, 6L -> 143L, 7L -> 142L), s"sizes: $sizes")
  }

  test("withGlobalNtile: fewer rows than buckets — one row per bucket") {
    val tiny = spark.range(3).select(col("id").as("v"), col("id").as("rid"))
    val got = GlobalRank.withGlobalNtile(tiny, 7, Seq(col("v")), "t")
      .orderBy("v").collect().map(_.getAs[Long]("t")).toSeq
    assert(got == Seq(1L, 2L, 3L), s"got $got")
  }

  test("withGlobalNtile: non-unique order fails loudly, never diverges silently") {
    val e = intercept[IllegalArgumentException] {
      GlobalRank.withGlobalNtile(tied, 4, Seq(col("v")), "t").collect()
    }
    assert(e.getMessage.contains("not unique"), e.getMessage)
  }

  test("withGlobalNtile: plan has no SinglePartition exchange") {
    val plan = GlobalRank.withGlobalNtile(uniq, 5, Seq(col("v")), "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
  }

  test("per-partition share is bounded by the range fan-out, not by key cardinality") {
    // the pass the operator actually runs: range-partition on the order
    // key. Explicit fan-out — on KB-sized test data AQE (correctly)
    // coalesces the default fan-out to one partition, which would test
    // the coalescer, not the range split
    val sizes = uniq.repartitionByRange(8, col("v"))
      .groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1))
    assert(sizes.length > 1, s"expected >1 range partitions, got ${sizes.toSeq}")
    val total = sizes.sum.toDouble
    // even split would be total/n; allow 4x sampling skew
    assert(sizes.max <= 4 * total / sizes.length,
      s"skewed range split: ${sizes.toSeq}")
  }
}
