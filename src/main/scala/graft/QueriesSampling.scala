package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.Tables
import graft.Queries._
import graft.functions.TextFunctions._
import graft.operators.{Blocklist, Bm25, Corpus, Dedup, Diagnostics, Layout, Multimodal, Outliers, Pack, RangeJoin, Sampling, Similarity}

/** Sampling surface: deterministic hash/weighted/stratified/mixture
  * sampling, split assignment, and the quantile gate.
  *
  * One ledger family of [[Queries.all]] (oracle-parity rules documented
  * there); assembled and key-set-ratcheted by SparkEntry/EntrySuite. */
private[graft] object QueriesSampling {

  /** The q_mixture_plan target weights (ppm, sums to exactly 1e6):
    * src0 gets an outsized 43% target so the 2-epoch availability cap
    * binds and water-filling redistributes; the other 19 sources split
    * the rest evenly. ONE constant feeds both the Spark plan and the
    * oracle SQL. */
  private val PlanWeights: Map[String, Long] =
    Map("src0" -> 430000L) ++
      (1 to 19).map(i => s"src$i" -> 30000L).toMap

  val queries: Map[String, Q] = Map(


    // shuffle + sample-head (dataframe.nim:2497-2521), demoed through the
    // deterministic hashShuffle total order (Sampling.scala) instead of
    // the reference's process-local RNG so the head-100 replays exactly
    // in DuckDB and the row is hash-checked like every other query.
    // (RNG randomHead/shuffleRows stay suite-covered — ApiSuite.)
    "q_sample" -> ((s: SparkSession, dir: String) =>
      graft.api.DataTable(
        graft.operators.Sampling.hashShuffle(orders(s, dir).df, "o_orderkey")
          .limit(100)
          .select(col("o_orderkey")))
        .arrange("o_orderkey").df),


      // deterministic hash sampling: reproducible 10% of the corpus,
      // scan-local predicate (no RNG, no shuffle) — exact oracle
      "q_sample_hash" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.hashSample(Tables.df(s, dir, "documents"), "doc_id", 0.1)
            .select(col("doc_id")))
          .arrange("doc_id").df),


      // quality-weighted deterministic sampling: keep-probability rises
      // with document length (clamped [0,1]); per-row cut vs hash bucket,
      // zero shuffle, exactly replayed by the DuckDB oracle
      "q_weighted_sample" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.weightedHashSample(Tables.df(s, dir, "documents"),
            "doc_id", col("n_chars") / lit(2000.0))
            .select(col("doc_id"), col("n_chars")))
          .arrange("doc_id").df),


      // balanced per-stratum sample: exactly 25 docs per language by
      // deterministic hash rank (WindowGroupLimit prunes map-side)
      "q_stratified" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.stratifiedTopN(Tables.df(s, dir, "documents"),
            "doc_id", "lang", n = 25)
            .select(col("doc_id"), col("lang")))
          .arrange("doc_id").df),


      // stratified rebalancing: per-language keep rates (corpus mixing)
      "q_mixture" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.stratifiedHashSample(Tables.df(s, dir, "documents"),
            "doc_id", "lang", Map("en" -> 0.5, "zh" -> 0.8))
            .select(col("doc_id"), col("lang")))
          .arrange("doc_id").df),


      // temperature-flattened language mixture (τ=0.5): per-domain keep
      // rates (n_min/n_s)^0.5 — sqrt is IEEE-correctly-rounded, so the
      // cut replays bit-exactly (Sampling.temperatureMixture scaladoc)
      "q_temperature_mix" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.temperatureMixture(Tables.df(s, dir, "documents"),
            "doc_id", "lang", tau = 0.5)
            .select(col("doc_id"), col("lang")))
          .arrange("doc_id").df),


      // token-budget mixture: per-source deterministic picks until 500
      // tokens each (the "N tokens of domain X" mixture spec; crossing
      // doc included, short domains keep everything)
      "q_token_budget" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.tokenBudgetSample(
            Tables.df(s, dir, "documents")
              .select(col("doc_id"), col("source"),
                graft.functions.TextFunctions.tokenCount(col("text"))
                  .cast("long").as("n_tokens")),
            "doc_id", "source", "n_tokens", budget = 500L))
          .arrange("doc_id").df),


      // deterministic train/val/test split assignment (80/10/10)
      "q_split" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.splitAssign(Tables.df(s, dir, "documents"), "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
            .select(col("doc_id"), col("split")))
          .arrange("doc_id").df),


      // exact-total proportional sample: Hamilton largest-remainder
      // quotas across sources, exactly 200 rows overall — the draw
      // neither fixed-n-per-stratum nor rate samplers can make
      "q_proportional_sample" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.proportionalSample(
            Tables.df(s, dir, "documents").select("doc_id", "source"),
            "doc_id", "source", totalN = 200L)
            .select(col("doc_id"), col("source")))
          .arrange("doc_id").df),


      // token-budget mixture plan: exact water-filling of a 400k-char
      // budget across sources under a 2-epoch availability cap — src0's
      // outsized 43% target caps out and redistributes; windows run
      // over the |sources|-row aggregate only
      "q_mixture_plan" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.mixturePlan(
            Tables.df(s, dir, "documents").select("source", "n_chars"),
            "source", "n_chars", PlanWeights, budget = 400000L,
            maxEpochs = 2))
          .arrange("domain").df),


      // EXECUTED mixture plan: the water-filling plan drives per-domain
      // greedy token fills (crossing-doc rule, broadcast plan join) —
      // the weights → plan → corpus loop closed in one hash-checked
      // composition
      "q_mixture_plan_exec" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.df(s, dir, "documents")
          .select("doc_id", "source", "n_chars")
        val plan = Sampling.mixturePlan(docs, "source", "n_chars",
          PlanWeights, budget = 400000L, maxEpochs = 2)
        graft.api.DataTable(
          Sampling.executeMixturePlan(docs, "doc_id", "source", "n_chars",
            plan))
          .arrange("doc_id").df
      }),


      // systematic weighted resample WITH replacement: exactly 1000
      // draws over the length distribution — the deterministic
      // importance-resampling draw (heavy docs emit multiple copies);
      // global cumsum via the two-pass GlobalCumSum, pure integer
      // interval arithmetic, exact oracle
      "q_systematic_resample" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.systematicResample(
            Tables.df(s, dir, "documents").select("doc_id", "n_chars"),
            "doc_id", "n_chars", totalN = 1000L))
          .arrange("doc_id").df),


      // leakage-safe split: the 80/10/10 assignment keyed on the
      // near-dup CLUSTER label — no near-dup pair ever straddles
      // train/test (the invariant a doc-keyed split cannot give)
      "q_split_leakage_safe" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.leakageSafeSplit(Tables.df(s, dir, "documents"),
            "text", "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
            .select(col("doc_id"), col("cluster_id"), col("split")))
          .arrange("doc_id").df),


      // global-quantile quality gate: top quartile of the corpus by size
      "q_quantile_gate" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.quantileGate(
            Tables.df(s, dir, "documents").select("doc_id", "n_chars"),
            "n_chars", 0.75))
          .arrange("doc_id").df)
  )

  val oracles: Map[String, String] = Map(


    "q_sample" ->
      """SELECT o_orderkey FROM (
        |  SELECT o_orderkey FROM orders
        |  ORDER BY ('0x' || substring(md5('graft_shuffle_42_' || o_orderkey), 1, 12))::BIGINT
        |             % 1000000,
        |           o_orderkey
        |  LIMIT 100)
        |ORDER BY o_orderkey""".stripMargin,


    "q_sample_hash" ->
      """SELECT doc_id FROM documents
        |WHERE ('0x' || substring(md5('graft_sample_42_' || doc_id), 1, 12))::BIGINT
        |        % 1000000 < 100000
        |ORDER BY doc_id""".stripMargin,


    "q_weighted_sample" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE ('0x' || substring(md5('graft_wsample_42_' || doc_id), 1, 12))::BIGINT
        |        % 1000000
        |      < round(least(1.0, greatest(0.0, n_chars / 2000.0)) * 1000000, 0)::BIGINT
        |ORDER BY doc_id""".stripMargin,


    // token budget: exclusive running sum over the (hash, id) order per
    // source; the crossing doc's prev < budget keeps it
    "q_token_budget" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_tokens,
        |    ('0x' || substring(md5('graft_tbudget_42_' || doc_id), 1, 12))::BIGINT
        |      % 1000000 AS rk
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY rk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
        |  FROM d)
        |SELECT doc_id, source, n_tokens FROM r
        |WHERE prev < 500 ORDER BY doc_id""".stripMargin,


    "q_temperature_mix" ->
      """WITH c AS (SELECT lang, COUNT(*)::BIGINT AS n
        |           FROM documents GROUP BY lang),
        |m AS (SELECT MIN(n) AS mn FROM c),
        |r AS (SELECT lang,
        |        round(sqrt(mn::DOUBLE / n::DOUBLE) * 1000000, 0)::BIGINT AS cut
        |      FROM c CROSS JOIN m)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN r USING (lang)
        |WHERE ('0x' || substring(md5('graft_tmix_42_' || d.doc_id), 1, 12))::BIGINT
        |        % 1000000 < r.cut
        |ORDER BY d.doc_id""".stripMargin,


    "q_stratified" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |      ORDER BY ('0x' || substring(md5('graft_stratn_42_' || doc_id), 1, 12))::BIGINT
        |                 % 1000000, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 25 ORDER BY doc_id""".stripMargin,


    "q_mixture" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    ('0x' || substring(md5('graft_strat_42_' || doc_id), 1, 12))::BIGINT
        |      % 1000000 AS b,
        |    CASE WHEN lang = 'en' THEN 500000
        |         WHEN lang = 'zh' THEN 800000
        |         ELSE 1000000 END AS cut
        |  FROM documents)
        |WHERE b < cut ORDER BY doc_id""".stripMargin,


    // proportional sample: integer Hamilton quotas (base DIV + largest
    // remainder, ties -> stratum asc), md5-rank rows per stratum
    "q_proportional_sample" ->
      """WITH c AS (
        |  SELECT source, COUNT(*)::BIGINT AS c FROM documents GROUP BY source),
        |t AS (SELECT SUM(c)::BIGINT AS t FROM c),
        |q AS (SELECT source, (200 * c // t)::BIGINT AS base,
        |        ((200 * c) % t)::BIGINT AS rem
        |      FROM c CROSS JOIN t),
        |b AS (SELECT SUM(base)::BIGINT AS bsum FROM q),
        |qt AS (
        |  SELECT source,
        |    base + (CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, source)
        |                      <= 200 - bsum THEN 1 ELSE 0 END) AS quota
        |  FROM q CROSS JOIN b),
        |r AS (
        |  SELECT d.doc_id, d.source,
        |    ROW_NUMBER() OVER (PARTITION BY d.source
        |      ORDER BY ('0x' || substring(md5('graft_propn_42_' || d.doc_id), 1, 12))::BIGINT
        |                 % 1000000, d.doc_id) AS rk
        |  FROM documents d)
        |SELECT r.doc_id, r.source FROM r JOIN qt ON qt.source = r.source
        |WHERE r.rk <= qt.quota
        |ORDER BY r.doc_id""".stripMargin,


    // mixture plan: the same closed-form water-filling windows over
    // the |sources|-row aggregate (weights shared via PlanWeights)
    "q_mixture_plan" -> OracleSql.mixturePlan(
      PlanWeights.toSeq.sortBy(_._1), budget = 400000L, maxEpochs = 2),

    // executed plan: the plan relation verbatim as a CTE + the
    // q_token_budget crossing-doc window per domain
    "q_mixture_plan_exec" -> {
      val plan = OracleSql.mixturePlan(
        PlanWeights.toSeq.sortBy(_._1), budget = 400000L, maxEpochs = 2)
        .replaceAll("ORDER BY domain\\s*$", "")
      s"""WITH plan AS MATERIALIZED (
         |  SELECT domain, planned_tokens FROM ($plan)),
         |r AS (
         |  SELECT d.doc_id, d.source, d.n_chars,
         |    COALESCE(CAST(SUM(d.n_chars) OVER (PARTITION BY d.source
         |      ORDER BY ('0x' || substring(md5('graft_tbudget_42_' || d.doc_id), 1, 12))::BIGINT
         |                 % 1000000, d.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
         |      AS prev
         |  FROM documents d)
         |SELECT r.doc_id, r.source, r.n_chars
         |FROM r JOIN plan p ON p.domain = r.source
         |WHERE r.prev < p.planned_tokens
         |ORDER BY r.doc_id""".stripMargin
    },

    // systematic resample: window cumsum (RANGE default = Spark's),
    // copies-below-point as pure integer division — the CAST to BIGINT
    // pins the portable type (window SUM(BIGINT) is HUGEINT in DuckDB)
    "q_systematic_resample" ->
      """WITH d AS (
        |  SELECT doc_id, COALESCE(n_chars, 0)::BIGINT AS w FROM documents),
        |t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM d),
        |c AS (SELECT doc_id, w,
        |        CAST(SUM(w) OVER (ORDER BY doc_id) AS BIGINT) AS cum FROM d)
        |SELECT doc_id, n_copies FROM (
        |  SELECT c.doc_id,
        |    CAST((2000 * c.cum + t.tw) // (2 * t.tw)
        |       - (2000 * (c.cum - c.w) + t.tw) // (2 * t.tw) AS BIGINT)
        |      AS n_copies
        |  FROM c CROSS JOIN t)
        |WHERE n_copies >= 1
        |ORDER BY doc_id""".stripMargin,

    // leakage-safe split: split buckets over the recursive-CTE cluster
    // closure (same md5 rule, keyed on cluster_id)
    "q_split_leakage_safe" -> OracleSql.leakageSafeSplit(),

    "q_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 800000 THEN 'train'
        |       WHEN b < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substring(md5('graft_split_42_' || doc_id), 1, 12))::BIGINT
        |          % 1000000 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,


    // global-quantile gate: DuckDB's quantile_cont IS the interpolation
    // Spark's exact percentile implements (Sampling.quantileGate scaladoc)
    "q_quantile_gate" ->
      """WITH thr AS (SELECT quantile_cont(n_chars, 0.75) AS t FROM documents)
        |SELECT doc_id, n_chars
        |FROM documents CROSS JOIN thr
        |WHERE n_chars::DOUBLE >= t
        |ORDER BY doc_id""".stripMargin
  )
}
