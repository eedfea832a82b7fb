package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Corpus-level index/statistics operators for a training-data pipeline —
  * beyond-reference surface (the reference has no text-corpus layer; its
  * closest machinery is per-column string ops, `column.nim:1140-1175`).
  *
  * Both operators are pure DataFrame transforms in the house style: one
  * shuffle per logical phase, partial aggregation ahead of every
  * exchange, no driver-side collects, no UDFs.
  */
object Corpus {

  /** Inverted index (posting lists): one row per distinct token with its
    * document frequency and the sorted list of containing doc ids,
    * serialized as a comma-joined string (engine-portable; an array
    * column would pin the consumer to one engine's list rendering).
    * `minDf`/`maxDf` bound the emitted vocabulary — the classic
    * stopword/hapax cut that keeps posting lists usable at scale.
    *
    * Plan: explode → distinct (token, doc) pairs [shuffle 1, map-side
    * partial dedup] → groupBy token [shuffle 2] with count + sorted
    * collect. The collect_list is per-token and bounded by `maxDf` docs
    * after the filter — an uncapped megatoken ("the" at 100 TB) would
    * build a giant list, which is exactly why maxDf exists; pick it so
    * df*8 bytes fits an executor's row budget. */
  def postings(df: DataFrame, textCol: String, idCol: String,
               minDf: Long = 1L, maxDf: Long = Long.MaxValue): DataFrame = {
    val pairs = df
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("token"))
      .distinct()
    pairs.groupBy("token")
      .agg(count(lit(1)).as("df"),
        array_join(
          transform(array_sort(collect_list(col("__id"))),
            x => x.cast("string")),
          ",").as("posting"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
  }

  /** Unigram language-model surprisal — the CCNet-style quality signal:
    * score each document by the total information content of its tokens
    * under the corpus's own unigram distribution (boilerplate/word-soup
    * scores low, rare-token-dense text scores high). p(t) = count(t) /
    * total token instances, both from THIS corpus, so no smoothing is
    * needed (every scored token was seen).
    *
    * Output: (idCol, n_tokens, surprisal_micro) where surprisal_micro =
    * Σ_tokens round(-ln p(t) · 1e6) — each token's surprisal is
    * quantized to micro-nats BEFORE the sum, so the aggregate is an
    * order-insensitive integer sum (the float house rule,
    * Queries.scala): per-value ln parity is all the cross-engine replay
    * needs, never float-summation order. Mean per-token nats =
    * surprisal_micro / 1e6 / n_tokens.
    *
    * Plan: token counts [shuffle 1, partial agg]; the total is ONE
    * scalar aggregate broadcast back (BM25-stats pattern, never a
    * window); instances join their token's count [shuffle 2 — at scale
    * this is the big exchange, and a head vocabulary is the standard
    * broadcast optimization, kept relational here for unbounded
    * vocabularies]; per-doc integer sum [shuffle 3 on idCol]. */
  def lmScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val inst = df.select(col(idCol).as("__id"),
      explode(tokens(col(textCol))).as("__t"))
    val cnt = inst.groupBy("__t").agg(count(lit(1)).as("__c"))
    val total = cnt.agg(sum("__c").as("__n"))
    inst.join(cnt, Seq("__t"))
      .crossJoin(broadcast(total))
      .select(col("__id"),
        round(-log(col("__c").cast("double") / col("__n").cast("double"))
          * lit(1000000.0), 0).cast("long").as("__s"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__s")).as("surprisal_micro"))
  }
}
