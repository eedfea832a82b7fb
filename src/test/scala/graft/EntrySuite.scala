package graft

/** The driver's smoke contract: entry() returns rows. */
class EntrySuite extends SparkSpec {

  test("every declared query has a DuckDB oracle (the r11/r12 ratchet)") {
    // Rounds 11 AND 12 each shipped new queries() entries with no
    // oracleSql twin — the driver grades them NO_ORACLE and the round's
    // verdict flags the contract violation (SparkEntry.scala:10-12).
    // This pins the key sets equal, so an orphan query fails the suite
    // (and the pre-commit gate) the moment it is declared.
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without an oracleSql entry: ${noOracle.toSeq.sorted.mkString(", ")}")
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracleSql entries without a query: ${orphanOracles.toSeq.sorted.mkString(", ")}")
  }
  test("entry() curation pipeline returns per-(split, lang) rollups") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    val splits = rows.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(rows.map(_.getAs[Long]("n_docs")).sum > 0)
  }

  test("writeCurated sinks the corpus and a split filter prunes partitions") {
    import org.apache.spark.sql.functions._
    val out = "/tmp/graft_curated_corpus"
    SparkEntry.writeCurated(spark, "/root/testdata/sf0.001", out)
    val back = spark.read.parquet(out)
    val curated = SparkEntry.curated(spark, "/root/testdata/sf0.001")
    assert(back.count() == curated.count())
    // reading one split must prune to that directory subtree
    val pruned = back.filter(col("split") === "train")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("split"),
      s"split filter not pushed to partition pruning:\n$plan")
    assert(pruned.count() ==
      curated.filter(col("split") === "train").count())
    // the sink rolls back up to exactly entry()'s rollup
    val viaDisk = back.groupBy(col("split"), col("lang_guess"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("split", "lang_guess")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val direct = SparkEntry.entry(spark)
      .collect().map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_docs"))).toSeq
    assert(viaDisk == direct)
  }
}
