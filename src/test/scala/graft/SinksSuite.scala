package graft

import org.apache.spark.sql.functions._
import graft.sources.{Sinks, Tables}

/** Partitioned parquet sink: roundtrip fidelity + partition pruning. */
class SinksSuite extends SparkSpec {

  test("partitioned write roundtrips and prunes partitions on read") {
    val out = "/tmp/graft_sink_docs"
    val docs = Tables.df(spark, "/root/testdata/sf0.001", "documents")
    Sinks.writeParquet(docs, out, partitionCols = Seq("lang"))

    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    // partition value survives the roundtrip (moves into the dir name)
    val langs = back.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs == docs.select("lang").distinct().collect().map(_.getString(0)).toSet)

    // a lang filter must become a PartitionFilter (skips directories),
    // not a post-scan Filter over all data
    val pruned = back.filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"),
      s"lang filter not pushed to partition pruning:\n$scan")
    assert(pruned.count() ==
      docs.filter(col("lang") === "en").count())
  }

  test("fileStats reports per-file row counts and min/max (layout audit)") {
    val out = "/tmp/graft_sink_stats"
    val docs = Tables.df(spark, "/root/testdata/sf0.001", "documents")
    // 4 files range-partitioned by doc_id → disjoint doc_id spans
    docs.repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(out)
    val stats = Sinks.fileStats(spark, out, Seq("doc_id")).collect()
    assert(stats.length == 4)
    assert(stats.map(_.getAs[Long]("n_rows")).sum == docs.count())
    // spans must not overlap (sorted layout ⇒ disjoint min/max ranges)
    val spans = stats.map(r =>
      (r.getAs[Long]("doc_id_min"), r.getAs[Long]("doc_id_max")))
      .sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping file spans: $aMax >= $bMin")
      case _ =>
    }
  }

  test("compactParquet merges a small-file mess into sized files") {
    val messy = "/tmp/graft_sink_messy"
    val tidy = "/tmp/graft_sink_tidy"
    val docs = Tables.df(spark, "/root/testdata/sf0.001", "documents")
    docs.repartition(32).write.mode("overwrite").parquet(messy) // 32 tiny files
    Sinks.compactParquet(spark, messy, tidy, targetRowsPerFile = 300L)
    val back = spark.read.parquet(tidy)
    assert(back.count() == docs.count())
    val nFiles = back.select(input_file_name()).distinct().count()
    // 500 docs at 300/file → 2 files (vs 32 in the mess)
    assert(nFiles == 2, s"expected 2 compacted files, got $nFiles")
    // content survives: order-insensitive checksum matches
    def sig(df: org.apache.spark.sql.DataFrame): Long =
      df.select(sum(crc32(concat_ws("", col("doc_id"),
        md5(col("text").cast("binary")))))).head.getLong(0)
    assert(sig(back) == sig(docs))
  }

  test("compactParquet refuses overlapping in/out paths in any spelling") {
    val base = "/tmp/graft_sink_guard"
    val docs = Tables.df(spark, "/root/testdata/sf0.001", "documents")
    docs.write.mode("overwrite").parquet(base)
    for (out <- Seq(base, s"$base/", s"file:$base", s"$base/nested",
      "/tmp/graft_sink_guard/../graft_sink_guard")) {
      intercept[IllegalArgumentException] {
        Sinks.compactParquet(spark, base, out)
      }
    }
    // disjoint sibling path is fine
    Sinks.compactParquet(spark, base, s"${base}_ok", targetRowsPerFile = 1000L)
    assert(spark.read.parquet(s"${base}_ok").count() == docs.count())
  }

  test("ORC sink roundtrips and prunes partitions like parquet") {
    val out = "/tmp/graft_sink_orc"
    val docs = Tables.df(spark, "/root/testdata/sf0.001", "documents")
    Sinks.writeOrc(docs, out, partitionCols = Seq("lang"))
    val back = Sinks.readOrc(spark, out)
    assert(back.count() == docs.count())
    val pruned = back.filter(col("lang") === "en")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"),
      s"lang filter not pushed to ORC partition pruning:\n$scan")
    assert(pruned.count() == docs.filter(col("lang") === "en").count())
  }
}
