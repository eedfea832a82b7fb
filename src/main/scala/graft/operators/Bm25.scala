package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.tokens

/** BM25 relevance scoring over a document corpus — the retrieval /
  * quality-weighting primitive of a training-data pipeline (score docs
  * against a topic query, mine hard examples, build dedup-safe eval
  * retrieval baselines). Beyond-reference.
  *
  * Standard Okapi BM25 (Robertson & Sparck Jones; the formula every
  * engine's full-text extension implements):
  *
  *   score(d, Q) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1-b + b·dl/avgdl))
  *   idf(t) = ln( (N - df + 0.5) / (df + 0.5) + 1 )
  *
  * Scale shape: corpus statistics (N, Σdl, per-term document frequency)
  * come from ONE scalar aggregate over the tokenized corpus — for the
  * handful of query terms a search carries, each df is a conditional sum
  * in the same pass, no explode and no per-term shuffle. The 1-row stats
  * result is broadcast back (the same plan as the ungrouped-reduce lift:
  * scalar HashAggregate → BroadcastNestedLoopJoin of a 1-row relation)
  * and scoring is a pure projection — two corpus scans, zero shuffles.
  *
  * Determinism: token arrays and per-term tf are aliased in their own
  * projections (interpreted higher-order functions get no CSE), the
  * per-term partial scores add in fixed query order, and the returned
  * score is micro-scaled to BIGINT (`round(score·1e6)`) so results are
  * exactly comparable across engines despite `ln`/division being
  * ulp-sensitive.
  */
object Bm25 {

  /** Per-document BM25 score for `terms`. Returns `idCol`,
    * `score_micro` (BIGINT, score·1e6). Docs matching no term score 0. */
  def score(df: DataFrame, idCol: String, textCol: String,
            terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "Bm25.score: no query terms")
    require(terms.distinct == terms, "Bm25.score: duplicate query terms")
    // tokenized once, aliased (HOF: no codegen, no CSE — keep one copy)
    val toks = df
      .select(col(idCol), tokens(lower(col(textCol))).as("__toks"))
      .withColumn("__dl", size(col("__toks")).cast("long"))
    // one pass: N, Σdl, and every term's document frequency
    val aggs =
      count(lit(1)).as("__n") +: sum(col("__dl")).as("__sumdl") +:
        terms.zipWithIndex.map { case (t, i) =>
          sum(when(array_contains(col("__toks"), t), 1L).otherwise(0L))
            .as(s"__df$i")
        }
    val stats = toks.agg(aggs.head, aggs.tail: _*)
    // per-term tf in its own projection (each tf is read twice below)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(col("__toks"), x => x === t)).cast("double").as(s"__tf$i")
    }
    val proj = toks.crossJoin(broadcast(stats))
      .select(col(idCol) +: col("__dl") +: col("__n") +: col("__sumdl") +:
        (terms.indices.map(i => col(s"__df$i")) ++ tfCols): _*)
    // avgdl = Σdl / N: integer-exact operands, ONE division — bit-equal
    // across engines; every parenthesis below is mirrored in the oracle
    val avgdl = col("__sumdl") / col("__n")
    val score = terms.indices.map { i =>
      val dfT = col(s"__df$i")
      val idf = log((col("__n") - dfT + lit(0.5)) / (dfT + lit(0.5)) + lit(1.0))
      val tf = col(s"__tf$i")
      (idf * (tf * lit(k1 + 1))) /
        (tf + lit(k1) * (lit(1 - b) + lit(b) * (col("__dl") / avgdl)))
    }.reduce(_ + _)
    proj.select(col(idCol), round(score * lit(1e6)).cast("long").as("score_micro"))
  }

  /** Per-document TF-IDF top-`k` keyword extraction — [[score]]'s
    * per-doc twin (score docs for a query vs. describe each doc by its
    * most distinctive terms): smoothed idf `ln((N+1)/(df+1)) + 1`
    * (sklearn's TfidfTransformer smoothing — never negative, never
    * divides by zero), tf × idf micro-scaled to BIGINT so the ranking
    * and the output are exact across engines despite `ln` being
    * ulp-sensitive (the [[score]] discipline; ties break on the term).
    *
    * Scale shape: tf is one (doc, term) partial-agged shuffle, df one
    * (term) shuffle, their join shuffles on the term; the per-doc top-k
    * window is bounded by each doc's distinct-term count and the
    * rank<=k filter pushes down as WindowGroupLimit (map-side prune).
    * The 1-row corpus count broadcasts. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    require(k >= 1, s"tfidfTopTerms: k must be >= 1, got $k")
    val toks = df.select(col(idCol),
      explode(tokens(lower(col(textCol)))).as("tok"))
    val tf = toks.groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("tf"))
    // df(tok) = tf's row count per tok (tf holds exactly one row per
    // (doc, tok)) — reuses the first shuffle's output instead of
    // re-tokenizing the corpus into a count_distinct
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("__n"))
    // every parenthesis mirrored in the oracle SQL
    val idf = log((col("__n") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)
    val scored = tf.join(dfreq, Seq("tok"))
      .crossJoin(broadcast(n))
      .withColumn("score_micro",
        round((col("tf") * idf) * lit(1e6)).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("tok"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("tok"), col("tf"), col("score_micro"), col("rank"))
  }
}
