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
  * exchange, bounded driver-side state, no UDFs.
  */
object Corpus {

  /** Inverted index (posting lists): one row per distinct token with its
    * document frequency and the sorted list of containing doc ids,
    * serialized as a comma-joined string (engine-portable; an array
    * column would pin the consumer to one engine's list rendering).
    * `minDf`/`maxDf` bound the emitted vocabulary — the classic
    * stopword/hapax cut that keeps posting lists usable at scale.
    *
    * Plan — TWO-PHASE so posting lists are only ever materialized for
    * the surviving vocabulary: (1) distinct (token, doc) pairs [shuffle
    * 1, map-side partial dedup] → per-token `df` count → filter to
    * [minDf, maxDf]; (2) the pairs join that filtered vocabulary on
    * token (exchange reusable — same key as phase 1; the vocabulary side
    * is one row per surviving token, so AQE may broadcast it) and ONLY
    * the survivors' doc ids are collected. A stop-token above `maxDf` is
    * cut at the count stage and never builds a list — the aggregation
    * buffer for collect_list is bounded by `maxDf` ids per token by
    * construction; pick maxDf so df*8 bytes fits an executor's row
    * budget. */
  def postings(df: DataFrame, textCol: String, idCol: String,
               minDf: Long = 1L, maxDf: Long = Long.MaxValue): DataFrame = {
    val pairs = df
      .select(col(idCol).as("__id"), explode(tokens(col(textCol))).as("token"))
      .distinct()
    val vocab = pairs.groupBy("token")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    pairs.join(vocab, Seq("token"))
      .groupBy("token")
      .agg(max(col("df")).as("df"),
        array_join(
          transform(array_sort(collect_list(col("__id"))),
            x => x.cast("string")),
          ",").as("posting"))
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
    * window). The instances⋈counts join is the skew hazard at scale —
    * token frequency is Zipfian, so a plain shuffle join concentrates
    * "the" on one reducer. HEAD/TAIL HYBRID: the top-`headVocab` tokens
    * by count (a bounded TakeOrdered — `headVocab` rows of (string,
    * long), trivially broadcastable) join instances via broadcast-hash
    * [no shuffle of instances], and only the TAIL instances — whose
    * per-key frequency is bounded above by the head cutoff — shuffle
    * relationally [shuffle 2, skew-bounded]. Per-doc integer sum
    * [shuffle 3 on idCol]. Results are byte-identical to the plain join
    * for any `headVocab` (the hybrid changes the route, not the
    * arithmetic). */
  def lmScore(df: DataFrame, textCol: String, idCol: String,
              headVocab: Int = 65536): DataFrame = {
    val inst = df.select(col(idCol),
      explode(tokens(col(textCol))).as("__t"))
    val cnt = inst.groupBy("__t").agg(count(lit(1)).as("__c"))
    val total = cnt.agg(sum("__c").as("__n"))
    // head: bounded top-K by frequency (ties broken on token for
    // determinism); TakeOrderedAndProject, never a full sort
    val head = cnt.orderBy(col("__c").desc, col("__t")).limit(headVocab)
    val headInst = inst.join(broadcast(head), Seq("__t"))
    val tailInst = inst
      .join(broadcast(head.select("__t")), Seq("__t"), "left_anti")
      .join(cnt, Seq("__t"))
    headInst.unionByName(tailInst)
      .crossJoin(broadcast(total))
      .select(col(idCol),
        round(-log(col("__c").cast("double") / col("__n").cast("double"))
          * lit(1000000.0), 0).cast("long").as("__s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__s")).as("surprisal_micro"))
  }
}
