package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 appears as a `queries` entry
  * (run by Verify/Bench) with a DuckDB oracle in `oracleSql` where the
  * semantics are ANSI-SQL-expressible. Column aliases match between the two
  * on purpose: the driver's compare hashes columns by name.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * An end-to-end CORPUS CURATION pipeline — the composition this engine
    * exists for: quality-score filter → language ID → exact dedup
    * survivors → deterministic train/val/test split → per-(split, lang)
    * rollup. Every stage is an operator proven individually by the oracle
    * gate; entry() shows them composing into one Catalyst plan. */
  def entry(spark: SparkSession): DataFrame =
    curated(spark, "/root/testdata/sf0.001")
      .groupBy(col("split"), col("lang_guess"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_dups") - 1).as("n_dups_removed"))
      .orderBy("split", "lang_guess")

  /** The per-document curated corpus entry() rolls up: quality-score
    * filter → language ID → exact dedup survivors → deterministic
    * train/val/test split, one Catalyst plan. */
  def curated(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextFunctions._
    import graft.operators.{Dedup, Sampling}
    val docs = Tables.df(spark, sfDir, "documents")
    val scored = docs
      .withColumn("__stop", stopwordRatio(col("text"), StopwordsEn))
      .withColumn("__mtl", meanTokenLen(col("text")))
      .withColumn("__punct", punctRatio(col("text")))
      .withColumn("quality",
        qualityFromParts(col("__stop"), col("__mtl"), col("__punct")))
      .withColumn("lang_guess", langGuess(col("text")))
      .filter(col("quality") > 0.1)
    val deduped = Dedup.exact(scored, "text", "doc_id")
    Sampling.splitAssign(deduped, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .drop("__stop", "__mtl", "__punct")
  }

  /** Sink the curated corpus partitioned by (split, lang_guess) — the
    * layout a downstream trainer reads: `split='train'` prunes to one
    * directory subtree (plan-asserted in EntrySuite). */
  def writeCurated(spark: SparkSession, sfDir: String, outPath: String): Unit =
    graft.sources.Sinks.writeParquet(curated(spark, sfDir), outPath,
      partitionCols = Seq("split", "lang_guess"))

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
