package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, FpStore}
import graft.functions.TextFunctions.{fingerprint, winnowFingerprints}

/** Maintained fingerprint-store lifecycle (FpStore scaladoc): atomic
  * staged-publish, duplicate-tolerant set semantics, compaction, and the
  * chained two-batch ingestion parity that `q_dedup_incr_store` replays
  * against DuckDB. */
class FpStoreSuite extends SparkSpec {

  private def freshRoot(tag: String): String = {
    val p = s"/tmp/graft_fpstore_suite_${tag}_${ProcessHandle.current().pid()}"
    FpStore.destroy(p)
    p
  }

  private def fps(xs: Long*) = {
    import spark.implicits._
    xs.toDF("fp")
  }

  private def storeSet(root: String): Set[Long] =
    FpStore.read(spark, root).collect().map(_.getLong(0)).toSet

  test("create/append/read roundtrip; duplicates across deltas are tolerated") {
    val root = freshRoot("basic")
    FpStore.create(spark, root, fps(1L, 2L, 3L))
    FpStore.append(spark, root, fps(3L, 4L))
    assert(storeSet(root) == Set(1L, 2L, 3L, 4L))
    // fp=3 is present in both deltas — the raw read carries the dup,
    // and the documented consumers (distinct / semi / anti) are immune
    val raw = FpStore.read(spark, root)
    assert(raw.count() == 5)
    assert(raw.distinct().count() == 4)
    FpStore.destroy(root)
  }

  test("create refuses an existing store; append/read/compact refuse a missing one") {
    val root = freshRoot("guards")
    FpStore.create(spark, root, fps(1L))
    intercept[IllegalArgumentException](FpStore.create(spark, root, fps(2L)))
    FpStore.destroy(root)
    intercept[IllegalArgumentException](FpStore.append(spark, root, fps(2L)))
    intercept[IllegalArgumentException](FpStore.read(spark, root))
    intercept[IllegalArgumentException](FpStore.compact(spark, root))
  }

  test("compact folds every delta into one distinct delta and cleans orphans") {
    val root = freshRoot("compact")
    FpStore.create(spark, root, fps(1L, 2L))
    FpStore.append(spark, root, fps(2L, 3L))
    FpStore.append(spark, root, fps(3L, 4L))
    // a crash mid-stage leaves an orphaned staging dir: readers must
    // ignore it, compact must sweep it
    val orphan = Paths.get(root, ".staging-dead")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("junk"), "not parquet")
    assert(storeSet(root) == Set(1L, 2L, 3L, 4L))

    FpStore.compact(spark, root)
    val entries = Files.list(Paths.get(root)).iterator()
    val names = Iterator.continually(entries).takeWhile(_.hasNext)
      .map(_.next().getFileName.toString).toList
    assert(names.count(_.startsWith("delta-")) == 1, s"entries: $names")
    assert(names.exists(_.endsWith("-c")))
    assert(!names.exists(_.startsWith(".staging-")), s"entries: $names")
    val post = FpStore.read(spark, root)
    assert(post.count() == 4) // distinct after compact — dup 2,3 folded
    assert(storeSet(root) == Set(1L, 2L, 3L, 4L))
    // the store stays appendable after compaction (seq keeps rising)
    FpStore.append(spark, root, fps(5L))
    assert(storeSet(root) == Set(1L, 2L, 3L, 4L, 5L))
    FpStore.destroy(root)
  }

  test("point probes prune: fp predicate is pushed to the parquet scan") {
    val root = freshRoot("prune")
    FpStore.create(spark, root, fps(1L to 100L: _*))
    val probe = FpStore.read(spark, root).filter(col("fp") === 42L)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(fp,42)"),
      s"fp probe not pushed to the scan:\n$plan")
    assert(probe.count() == 1)
    FpStore.destroy(root)
  }

  test("winnow screen over a maintained store equals the direct corpus screen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val root = freshRoot("winnow")
    FpStore.create(spark, root,
      corpus.select(explode(
        winnowFingerprints(col("text"), 12, 8)).as("fp")))
    val viaStore = Dedup.winnowIncrementalAgainstFps(
      batch, "text", "doc_id", FpStore.read(spark, root), "fp",
      k = 12, w = 8, minShared = 40L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val direct = Dedup.winnowIncremental(batch, corpus, "text", "doc_id",
      k = 12, w = 8, minShared = 40L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaStore.nonEmpty && viaStore == direct)
    FpStore.destroy(root)
  }

  test("two-batch exact chain: store state carries batch-1 survivors into batch 2") {
    import spark.implicits._
    // corpus holds "a"; batch1 brings "a" (dup → dropped) and "b" (new,
    // twice → keep-first); batch2 brings "b" (now in the store via the
    // batch-1 append → dropped) and "c" (new)
    val corpus = Seq((0L, "a")).toDF("doc_id", "text")
    val b1 = Seq((10L, "a"), (11L, "b"), (12L, "b")).toDF("doc_id", "text")
    val b2 = Seq((20L, "b"), (21L, "c")).toDF("doc_id", "text")
    val root = freshRoot("chain")
    FpStore.create(spark, root,
      corpus.select(fingerprint(col("text")).as("fp")))
    val s1 = Dedup.exactIncrementalAgainstFps(b1, "text", "doc_id",
      FpStore.read(spark, root), "fp").select("doc_id", "fp")
    val s1Rows = s1.collect().map(_.getLong(0)).toSet
    assert(s1Rows == Set(11L))
    FpStore.append(spark, root, s1.select("fp"))
    val s2 = Dedup.exactIncrementalAgainstFps(b2, "text", "doc_id",
      FpStore.read(spark, root), "fp").select("doc_id", "fp")
    assert(s2.collect().map(_.getLong(0)).toSet == Set(21L))
    FpStore.destroy(root)
  }
}
