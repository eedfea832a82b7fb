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

  /** Context-window chunking — the other half of sequence preparation:
    * split each document into token windows of `chunkTokens`, starting
    * every `stride` tokens (stride < chunkTokens ⇒ overlap). One row per
    * chunk: `(id, chunk_id, n_tok, chunk_text)`. Pure per-row explode —
    * no shuffle, no state; chunk count per doc is ceil(tokens/stride).
    * Trailing chunks may be shorter than `chunkTokens` (kept: they carry
    * the document tail). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0)
    import graft.functions.TextFunctions.tokens
    df.withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol), col("__toks"),
        posexplode(sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)),
          lit(stride))).as(Seq("chunk_id", "__start")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        size(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)))
          .cast("long").as("n_tok"),
        concat_ws(" ", slice(col("__toks"), col("__start") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }
}
