package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: concatenate documents into fixed-token-budget
  * training examples — the step between a cleaned corpus and a pretraining
  * dataloader. Beyond-reference (no counterpart; SURVEY.md §2.11).
  *
  * Greedy sequential packing is inherently serial, so the scalable shape
  * shards first: documents are hash-assigned to `shards` independent
  * streams, and the greedy scan runs per shard as ONE window cumsum —
  * `shards` parallel sorted streams instead of a single global order
  * (which would funnel 100 TB through one partition). A document that
  * crosses a budget boundary stays in the example where it started, like
  * boundary-agnostic pretraining packing.
  *
  * Deterministic end to end: shard = md5 hash of the id, order within a
  * shard = id, token counts are integers — the whole assignment replays
  * exactly in the DuckDB oracle.
  */
object Pack {

  /** Appends `shard` and `example_id`: `example_id` = index of the
    * `budget`-token training example within the shard that this document
    * starts in. `tokensCol` must be an integer token count. */
  def packGreedy(df: DataFrame, idCol: String, tokensCol: String,
                 budget: Long, shards: Int, seed: Long = 42L): DataFrame = {
    require(budget > 0 && shards > 0)
    val shard = pmod(Sampling.hashBucket(col(idCol), "pack", seed), lit(shards.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("example_id",
        ((col("__cum") - col(tokensCol)) / lit(budget)).cast("long"))
      .drop("__cum")
  }
}
