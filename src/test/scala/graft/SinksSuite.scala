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
}
