package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.Tables
import graft.Queries._
import graft.functions.TextFunctions._
import graft.operators.{Blocklist, Bm25, Corpus, Dedup, Diagnostics, Layout, Multimodal, Outliers, Pack, RangeJoin, Sampling, Similarity}

/** Text-corpus analysis surface: token/quality/language stats, LM
  * surprisal, BM25, postings, fingerprints, redaction, and the
  * bounded-quadratic Jaccard verifiers.
  *
  * One ledger family of [[Queries.all]] (oracle-parity rules documented
  * there); assembled and key-set-ratcheted by SparkEntry/EntrySuite. */
private[graft] object QueriesCorpus {

  /** Pinned quality-classifier model (Corpus.trainQualityClassifier on
    * the sf0.001 documents, epochs = 150, lr = 4.0): the distillation
    * target is the Gopher min-word-count gate (≥ 50 tokens — the one
    * published heuristic with variance on the synthetic word-soup
    * corpus; production training swaps in curated-vs-crawl labels, same
    * machinery). The label is exactly linearly separable in hashed
    * count space (n_tokens = Σ_j c_j) and the trained model reaches
    * train accuracy 1.0 — both re-derived and pinned in CorpusSuite, so
    * a testdata refresh that shifts the corpus fails the suite instead
    * of silently drifting the ledger. */
  private[graft] val QcWeights: Seq[Long] = Seq(
    578966L, 0L, 484746L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L,
    0L, 0L, 348778L, 0L, 418615L, 0L, 634363L, 335858L, 531288L, 0L,
    478130L, 996096L, 0L, 0L, 581488L, 729305L, 0L, 0L, 0L, 0L, 98878L,
    0L, 839797L, 0L, 61371L, 742109L, 0L, 0L, 227651L, 190772L, 0L, 0L,
    1027483L, 0L, 380190L, 480623L, 0L, 483077L, 0L, 114847L, 0L,
    1287974L, 0L, 0L, 0L, -768286L, 0L, 751295L, 0L, 0L)
  private[graft] val QcBias: Long = -25750753L
  private[graft] val QcEpochs = 150
  private[graft] val QcLr = 4.0

  /** Merge rounds for the BPE queries — shared by the Spark trainer and
    * the generated oracle CTE chain. */
  private[graft] val BpeMerges = 8

  /** Quality-classifier scoring oracle (shared by the retrain twin and
    * the store-backed chain): the pinned micro-weights spliced as a
    * VALUES relation; per-token-instance weight sum ≡ the count-vector
    * dot product (the q_dsir replay shape); bucket = the q_feature_hash
    * token hash; null/token-free docs score the bare bias via the
    * LEFT JOIN + COALESCE. */
  private val QcScoreOracle: String = {
    val values = QcWeights.zipWithIndex
      .map { case (w, j) => s"($j, $w)" }.mkString(", ")
    s"""WITH w(j, wt) AS (VALUES $values),
       |tok AS (
       |  SELECT doc_id, unnest(list_transform(
       |    string_split_regex(trim(text), '\\s+'),
       |    tk -> ('0x' || substring(md5(tk), 1, 12))::BIGINT
       |            % ${QcWeights.length})) AS h
       |  FROM documents),
       |s AS (
       |  SELECT d.doc_id,
       |    (COALESCE(SUM(w.wt), 0) + ($QcBias))::BIGINT AS qc_micro
       |  FROM documents d
       |  LEFT JOIN tok ON tok.doc_id = d.doc_id
       |  LEFT JOIN w ON w.j = tok.h
       |  GROUP BY d.doc_id)
       |SELECT doc_id, qc_micro, qc_micro > 0 AS qc_keep
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** One word-n-gram stats CTE pair for the q_repetition_rules oracle:
    * `g{n}` = the house shingle convention (< n tokens → one whole-doc
    * shingle, the q_repetition spelling), `s{n}` = duplicated-gram chars
    * and the lexicographic-(count, chars) top gram — the quadratic
    * distinct×count spelling is fine HERE (sf0.01 oracle only); the
    * Spark side runs the sorted-fold kernel (dupRunStats). */
  private def repGramCte(n: Int): String =
    s"""g$n AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) < $n THEN [array_to_string(toks, ' ')]
       |         ELSE list_transform(range(0, len(toks) - ${n - 1}),
       |                i -> array_to_string(toks[i+1:i+$n], ' ')) END AS gs
       |  FROM d),
       |s$n AS (
       |  SELECT doc_id,
       |    COALESCE(list_sum(list_transform(list_distinct(gs),
       |      x -> CASE WHEN len(list_filter(gs, y -> y = x)) > 1
       |                THEN len(list_filter(gs, y -> y = x)) * length(x)
       |                ELSE 0 END)), 0)::BIGINT AS dup_chars,
       |    COALESCE(list_max(list_transform(list_distinct(gs),
       |      x -> [len(list_filter(gs, y -> y = x)),
       |            len(list_filter(gs, y -> y = x)) * length(x)]))[2],
       |      0)::BIGINT AS top_chars
       |  FROM g$n)""".stripMargin

  val queries: Map[String, Q] = Map(


      // token counting: whitespace + BPE-ish regex
      "q_token_count" -> ((s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .selectCols(col("doc_id"),
            tokenCount(col("text")).cast("long").as("n_tokens"),
            bpeTokenCount(col("text")).cast("long").as("n_bpe"))
          .arrange("doc_id").df),


      // cross-document line dedup (boilerplate removal). The synthetic
      // corpus is single-line word soup, so multi-line docs are
      // synthesized first: a newline every 8 tokens — aligned 8-token
      // chunks DO repeat across documents (the near-dup population), so
      // the frequent-"line" strip path is genuinely exercised. Both
      // engines build the lines with identical integer slicing.
      "q_line_dedup" -> ((s: SparkSession, dir: String) => {
        val ml = Tables.df(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("__ts"))
          .select(col("doc_id"),
            array_join(
              transform(
                sequence(lit(0), ((size(col("__ts")) - 1) / lit(8)).cast("int")),
                i => array_join(slice(col("__ts"), i * 8 + 1, lit(8)), " ")),
              "\n").as("text"))
        graft.api.DataTable(
          Dedup.dedupLines(ml, "text", "doc_id", minDocFreq = 2))
          .arrange("doc_id").df
      }),


      // inverted index: posting lists for the mid-frequency vocabulary.
      // The df band is CORPUS-SIZE-DERIVED (r20 — VERDICT r19 #5): lo =
      // max(3, ceil(0.006·N)), hi = floor(0.79·N), both in exact integer
      // arithmetic so the two engines can never round apart. At sf0.01
      // (N=500) this is the original [3, 395] — both cuts bite (4
      // stop-tokens above, the rare token stays in) and the ledger hash
      // is unchanged; at sf10 (N=500k) it is [3000, 395000], which is
      // non-vacuous (2,232 tokens, 11.6M posting entries) where the old
      // absolute band caught nothing. The count(*) scalar rides the SAME
      // plan as a broadcast 1-row aggregate (r21 — VERDICT r20 #3: the
      // r20 eager docs.count() ran as a separate job before the query
      // body and doubled the warm time; postingsScaleBanded folds it in).
      "q_postings" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Corpus.postingsScaleBanded(Tables.df(s, dir, "documents"),
            "text", "doc_id"))
          .arrange("token").df),


      // unigram-LM surprisal quality signal (micro-nat integer sums;
      // per-value ln parity only — see Corpus.lmScore scaladoc)
      "q_lm_score" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Corpus.lmScore(Tables.df(s, dir, "documents"), "text", "doc_id"))
          .arrange("doc_id").df),


      // bigram conditional surprisal (second-order LM quality signal;
      // same micro-nat replay contract)
      "q_lm_bigram" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Corpus.lmScoreBigram(Tables.df(s, dir, "documents"), "text", "doc_id"))
          .arrange("doc_id").df),


      // quality scoring: length/stopword/punctuation stats; ratios are
      // computed once and the composite score reads the aliased columns
      "q_quality" -> ((s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .selectCols(col("doc_id"),
            length(col("text")).cast("long").as("n_chars_m"),
            meanTokenLen(col("text")).as("mean_tok_len"),
            stopwordRatio(col("text"), StopwordsEn).as("stop_ratio"),
            punctRatio(col("text")).as("punct_ratio"))
          .selectCols(col("doc_id"), col("n_chars_m"), col("mean_tok_len"),
            col("stop_ratio"), col("punct_ratio"),
            qualityFromParts(col("stop_ratio"), col("mean_tok_len"), col("punct_ratio"))
              .as("quality"))
          .arrange("doc_id").df),


      // language-ID heuristic by stopword hits, fixed tie order. Counts
      // are computed ONCE in their own projection, and the guess reads
      // the aliased columns — CollapseProject keeps non-cheap expressions
      // referenced multiple times in a separate stage, so the token array
      // is scanned 4x per row, not ~16x.
      "q_lang_id" -> ((s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .selectCols(col("doc_id"),
            stopwordCount(col("text"), StopwordsEn).cast("long").as("s_en"),
            stopwordCount(col("text"), StopwordsDe).cast("long").as("s_de"),
            stopwordCount(col("text"), StopwordsEs).cast("long").as("s_es"),
            stopwordCount(col("text"), StopwordsFr).cast("long").as("s_fr"))
          .selectCols(col("doc_id"), col("s_en"), col("s_de"), col("s_es"), col("s_fr"),
            langGuessFromCounts(col("s_en"), col("s_de"), col("s_es"), col("s_fr"))
              .as("lang_guess"))
          .arrange("doc_id").df),


      // language-ID CONFUSION MATRIX: the q_lang_id heuristic evaluated
      // against the stored lang label — per (label, guess) cell counts
      // plus a hit flag; the accuracy readout a lang gate needs before
      // filtering by guess
      "q_langid_confusion" -> ((s: SparkSession, dir: String) =>
        // counts aliased FIRST (the langGuessFromCounts contract): the
        // when-chain references each count several times and interpreted
        // HOFs get no CSE — inlining would re-scan the tokens ~12x/row
        Tables(s, dir, "documents")
          .selectCols(col("lang"),
            stopwordCount(col("text"), StopwordsEn).cast("long").as("__en"),
            stopwordCount(col("text"), StopwordsDe).cast("long").as("__de"),
            stopwordCount(col("text"), StopwordsEs).cast("long").as("__es"),
            stopwordCount(col("text"), StopwordsFr).cast("long").as("__fr"))
          .selectCols(col("lang"),
            langGuessFromCounts(col("__en"), col("__de"), col("__es"),
              col("__fr")).as("lang_guess"))
          .df.groupBy("lang", "lang_guess")
          .agg(count(lit(1)).as("n"))
          .withColumn("is_hit",
            when(col("lang") === col("lang_guess"), 1L).otherwise(0L))
          .orderBy("lang", "lang_guess")),


      // corpus vocabulary: top-50 tokens by frequency (canonical
      // explode -> partial-agg wordcount; deterministic tiebreak)
      "q_vocab" -> ((s: SparkSession, dir: String) =>
        Tables.df(s, dir, "documents")
          .select(explode(tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(50)),


      // feature-hashing embeddings: dim-64 count vector per doc, checked
      // through exact scalar projections (nnz / l2sq / argmax bucket)
      "q_feature_hash" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .withColumn("__v", featureHash(col("text"), 64))
            .select(col("doc_id"),
              size(filter(col("__v"), x => x > 0)).cast("long").as("nnz"),
              aggregate(col("__v"), lit(0L), (acc, x) => acc + x * x).as("l2sq"),
              array_position(col("__v"), array_max(col("__v"))).as("top_bucket")))
          .arrange("doc_id").df),


      // DSIR importance resampling: docs scored by hashed-unigram
      // likelihood ratio against a deterministic target slice
      // (doc_id % 10 = 0), then gated at the global 0.75 quantile —
      // the integer micro-nat score feeds quantileGate directly
      "q_dsir" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.df(s, dir, "documents")
        graft.api.DataTable(
          graft.operators.Sampling.quantileGate(
            graft.operators.Corpus.dsirWeights(
              docs.filter(col("doc_id") % 10 =!= 0),
              docs.filter(col("doc_id") % 10 === 0),
              "text", "doc_id"),
            "dsir_micro", 0.75))
          .arrange("doc_id").df
      }),


      // per-source distribution shift: KL divergence of each source's
      // hashed-unigram distribution from the corpus-wide one — the
      // mixture-design diagnostic (exact integer numerator + one
      // bit-stable division)
      "q_domain_kl" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Corpus.domainKl(Tables.df(s, dir, "documents"), "text", "source"))
          .arrange("source").df),


      // PMI collocations: top multiword expressions by pointwise mutual
      // information (micro-nat, count >= 5 cut) — bounded TakeOrdered
      "q_collocations" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Corpus.collocations(Tables.df(s, dir, "documents"), "text"))
          .arrange("w1", "w2").df),


      // THE FLAGSHIP, hash-checked: the entry() curation pipeline
      // (quality gate → lang ID → exact dedup survivors → split →
      // rollup) as ONE Catalyst plan, replayed stage by stage in SQL —
      // the individually-proven operators proven COMPOSED
      "q_pipeline_e2e" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          SparkEntry.curated(s, dir)
            .groupBy(col("split"), col("lang_guess"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_dups") - 1).as("n_dups_removed")))
          .arrange("split", "lang_guess").df),


      // HTML → text extraction: script/style blocks dropped whole, tags
      // stripped, entities decoded (&amp; last), whitespace squeezed —
      // the WET-style ingestion step; synthetic HTML derived per row so
      // both engines extract from identical markup
      "q_html_extract" -> ((s: SparkSession, dir: String) => {
        val html = concat(
          lit("<html><head><script>var x = 1 < 2;</script>" +
            "<style>p { color: red; }</style></head><body><h1>Title</h1><p>"),
          col("text"),
          lit("</p><div class=\"x\">&amp;lt; &lt;kept&gt; &nbsp;&#39;q&#39;" +
            "</div></body></html>"))
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .select(col("doc_id"), htmlToText(html).as("clean"))
            .withColumn("n_clean_chars", length(col("clean")).cast("long")))
          .arrange("doc_id").df
      }),


      // cross-document boilerplate: top-50 corpus-wide trigrams (bounded
      // TakeOrdered, deterministic tie order) broadcast back; per-doc
      // boilerplate-instance fraction in exact integral arithmetic
      "q_boilerplate" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Corpus.boilerplate(Tables.df(s, dir, "documents"),
            "text", "doc_id", n = 3, topB = 50))
          .arrange("doc_id").df),


      // CCNet-style perplexity bucketing: per-token unigram surprisal
      // (exact integer micro-nats per token) split at the global 0.25 /
      // 0.75 quantiles — head/middle/tail as buckets 0/1/2; one
      // percentile aggregate broadcast back, corpus never shuffles for
      // the stamp. Quarter cuts, not thirds: q·(n−1) and the
      // interpolation fraction stay EXACT doubles (powers of two), so
      // Spark's lo+(hi−lo)·f and DuckDB's (1−f)·lo+f·hi round
      // identically — at 1/3 the two interpolation orders can differ by
      // 1 ULP and flip boundary rows
      "q_ppl_buckets" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          graft.operators.Sampling.quantileBuckets(
            Corpus.lmScore(Tables.df(s, dir, "documents"), "text", "doc_id")
              .withColumn("ppl_micro", expr("surprisal_micro div n_tokens")),
            "ppl_micro", Seq(0.25, 0.75), "bucket")
            .select(col("doc_id"), col("ppl_micro"), col("bucket")))
          .arrange("doc_id").df),


      // dataset card: the one-pass per-language datasheet (docs, token/
      // char volume, source fan-in, length extremes, exact-dup count).
      // Two distinct-aggregates ride one Expand pass — a once-per-release
      // reporting query, not a hot-path operator
      "q_corpus_card" -> ((s: SparkSession, dir: String) =>
        Tables.df(s, dir, "documents")
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(tokenCount(col("text")).cast("long")).as("n_tokens"),
            sum(col("n_chars")).as("total_chars"),
            countDistinct(col("source")).as("n_sources"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars"),
            (count(lit(1)) - countDistinct(col("text"))).as("n_exact_dup"))
          .orderBy("lang")),


      // BPE merge training (Sennrich et al. 2016): the first 8 learned
      // merge rules with weighted counts — trained on the word
      // histogram (corpus scanned once; rounds iterate over the vocab
      // only), oracle re-derives every round independently
      "q_bpe_merges" -> ((s: SparkSession, dir: String) => {
        val (_, merges) = Corpus.bpeTrain(
          Tables.df(s, dir, "documents"), "text", merges = BpeMerges)
        import s.implicits._
        merges.zipWithIndex
          .map { case ((p, c), i) => ((i + 1).toLong, p, c) }
          .toDF("round", "pair", "weighted_count")
          .orderBy("round")
      }),


      // tokenize with the trained BPE vocab: per-doc subword counts via
      // the broadcast word→pieces lookup (the production tokenizer
      // shape — no per-document merge re-application)
      "q_bpe_tokenize" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.df(s, dir, "documents")
        val (vocab, _) = Corpus.bpeTrain(docs, "text", merges = BpeMerges)
        graft.api.DataTable(
          Corpus.bpeTokenCounts(docs, "text", "doc_id", vocab))
          .arrange("doc_id").df
      }),


      // the trained-artifact store chain, tokenizer consumer: BPE
      // trains once, the merge table AND the word→pieces vocab publish
      // to the ModelStore, and tokenization runs from the LOADED vocab
      // with zero training scans (the ship-a-tokenizer shape) — same
      // oracle as the retrain-per-query twin
      "q_model_store_bpe" -> ((s: SparkSession, dir: String) => {
        val root = roundtripDir("modelstore_bpe", dir)
        graft.operators.ModelStore.destroy(root)
        val docs = Tables.df(s, dir, "documents")
        val (vocab, merges) = Corpus.bpeTrain(docs, "text", merges = BpeMerges)
        graft.operators.ModelStore.saveBpeMerges(s, root, merges)
        graft.operators.ModelStore.saveBpeVocab(s, root, vocab)
        val stored = graft.operators.ModelStore.load(s, root, "bpe_vocab")
        graft.api.DataTable(
          Corpus.bpeTokenCounts(docs, "text", "doc_id", stored))
          .arrange("doc_id").df
      }),


      // trained linear quality classifier (fastText/CCNet-style gate):
      // logistic model over hashed bag-of-words counts, trained by
      // Corpus.trainQualityClassifier (deterministic distributed GD)
      // and applied with PINNED integer micro-weights — scoring is a
      // pure integer-dot-product projection, scan-local, stream-safe
      "q_quality_classifier" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Corpus.qualityClassifierScore(
            Tables.df(s, dir, "documents"), "text", "doc_id",
            QcWeights, QcBias))
          .arrange("doc_id").df),


      // the trained-artifact store chain, classifier consumer: the
      // pinned micro-weight model (training determinism + provenance
      // are pinned in CorpusSuite against trainQualityClassifier)
      // publishes to the ModelStore and scoring runs from the LOADED
      // weights — long micro-weights round-trip parquet exactly, so the
      // chain shares the scoring twin's oracle verbatim
      "q_model_store_qc" -> ((s: SparkSession, dir: String) => {
        val root = graft.Queries.roundtripDir("modelstore_qc", dir)
        graft.operators.ModelStore.destroy(root)
        graft.operators.ModelStore.saveLinearWeights(s, root,
          QcWeights, QcBias)
        val (w, b) = graft.operators.ModelStore.loadLinearWeights(s, root)
        graft.api.DataTable(
          Corpus.qualityClassifierScore(
            Tables.df(s, dir, "documents"), "text", "doc_id", w, b))
          .arrange("doc_id").df
      }),


      // C4 page cleaning (Raffel et al. 2020): terminal-punctuation /
      // min-words / boilerplate line rules + lorem-ipsum / brace /
      // 3-sentence doc flags — scan-local (Corpus.c4Clean scaladoc)
      // the synthetic docs are one-line word soup, so the page is first
      // sentence-chunked deterministically (every 6 words → ".\n") to
      // exercise the line rules; both engines apply the same rewrite
      "q_c4_clean" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          graft.operators.Corpus.c4Clean(
            Tables.df(s, dir, "documents").withColumn("text",
              regexp_replace(col("text"),
                "(\\w+ \\w+ \\w+ \\w+ \\w+ \\w+) ", "$1.\n")),
            "text", "doc_id"))
          .arrange("doc_id").df),


      // Gopher repetition-removal rules (Rae et al. 2021 table A1):
      // dup-line fractions + top/dup word-n-gram char coverage, one
      // sorted fold per gram size (Corpus.repetitionRules scaladoc)
      "q_repetition_rules" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          graft.operators.Corpus.repetitionRules(
            Tables.df(s, dir, "documents"), "text", "doc_id"))
          .arrange("doc_id").df),


      // Gopher quality rules (Rae et al. 2021): the published heuristic
      // document gate as integer cross-multiplied flags — division-free,
      // scan-local (Corpus.gopherRules scaladoc)
      "q_gopher" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          graft.operators.Corpus.gopherRules(
            Tables.df(s, dir, "documents"), "text", "doc_id"))
          .arrange("doc_id").df),


      // exact percentiles of an integer measure per language (corpus
      // length profile; interpolated like SQL percentile_cont)
      "q_percentiles" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .groupBy(col("lang"))
            .agg(expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.9D))").as("p"))
            .select(col("lang"), col("p")(0).as("p25"), col("p")(1).as("p50"),
              col("p")(2).as("p75"), col("p")(3).as("p90")))
          .arrange("lang").df),


      // lexical-diversity / repetition quality signals
      "q_diversity" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .withColumn("__toks", tokens(col("text")))
            .select(col("doc_id"),
              typeTokenRatioFromTokens(col("__toks")).as("ttr"),
              topTokenRatioFromTokens(col("__toks")).as("top_tok_ratio")))
          .arrange("doc_id").df),


      // document fingerprinting (md5 of normalized text)
      "q_fingerprint" -> ((s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .selectCols(col("doc_id"), fingerprint(col("text")).as("fp"))
          .arrange("doc_id").df),


      // PII scrubbing: the synthetic corpus carries no PII, so the query
      // injects emails/URLs in-expression — both engines then run the
      // same regexes over non-trivial matches (redaction actually fires)
      "q_pii_redact" -> ((s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .selectCols(col("doc_id"),
            redactPii(concat(col("text"), lit(PiiTail))).as("redacted"))
          .arrange("doc_id").df),


      // context-window chunking: 32-token windows every 24 tokens
      // (overlap 8); chunk text checked via md5 fingerprint
      "q_chunk" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Pack.chunkDocuments(
            Tables.df(s, dir, "documents").filter(col("doc_id") < 100),
            "doc_id", "text", chunkTokens = 32, stride = 24)
            .select(col("doc_id"), col("chunk_id"), col("n_tok"),
              md5(col("chunk_text").cast("binary")).as("chunk_fp")))
          .arrange("doc_id", "chunk_id").df),


      // sequence packing: shard-parallel greedy fill of 256-token
      // training examples (window cumsum per shard)
      "q_pack" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Pack.packGreedy(
            Tables.df(s, dir, "documents")
              .withColumn("n_tok", tokenCount(col("text"))),
            "doc_id", "n_tok", budget = 256, shards = 8)
            .select(col("doc_id"), col("shard"), col("example_id")))
          .arrange("doc_id").df),


      // Gopher/C4-style repetition signals in exact integer form: word
      // 2-gram totals, distinct counts, and the top 2-gram's frequency —
      // one compiled kernel pass per row (build, sort, sweep), not the
      // interpreted HOF fold
      "q_repetition" -> ((s: SparkSession, dir: String) => {
        import org.apache.spark.sql.graftshim.{NgramStats, Shim}
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .select(col("doc_id"),
              Shim.toColumn(NgramStats(
                Shim.toExpression(col("text")), 2)).as("__st"))
            .select(col("doc_id"),
              col("__st").getItem(0).as("n_2gram"),
              col("__st").getItem(1).as("n_distinct_2gram"),
              col("__st").getItem(2).as("top_2gram_n")))
          .arrange("doc_id").df
      }),


      // Unicode NFC canonical composition (the cross-source dedup
      // precondition): decomposed sequences injected in-expression so
      // the normalizer provably fires; both engines run the same
      // Unicode algorithm (java.text.Normalizer / nfc_normalize)
      "q_nfc" -> ((s: SparkSession, dir: String) => {
        import org.apache.spark.sql.graftshim.{NfcNormalize, Shim}
        // DECOMPOSED combining marks (e+U+0301, i+U+0308, A+U+030A):
        // the engine must compose them; the oracle injects the same
        // sequence via chr() and both land on the composed forms
        val injected = concat(
          lit("café naïve Å "), col("text"))
        val norm = Shim.toColumn(NfcNormalize(Shim.toExpression(injected)))
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .select(col("doc_id"), norm.as("__n"))
            .select(col("doc_id"),
              md5(col("__n").cast("binary")).as("norm_fp"),
              length(col("__n")).as("n_chars_norm")))
          .arrange("doc_id").df
      }),


      // cross-document exact substring duplication: per doc, how many
      // of its word-5-gram windows appear in any OTHER document
      "q_substring_dup" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.substringDupStats(Tables.df(s, dir, "documents"),
            "text", "doc_id", n = 5))
          .arrange("doc_id").df),


      // per-domain corpus accounting (web-curation staple): URLs
      // synthesized from source/lang/doc_id, host + path split out with
      // parse_url (codegen'd), rolled up per host — the shape of a
      // crawl-mix report or domain blocklist join
      // URL canonicalization: the corpus has no URL column, so messy
      // URLs are SYNTHESIZED deterministically per doc (4 shapes: messy
      // case + default port + tracking params + fragment; trailing
      // slash; all-tracking query; non-default port + duplicate keys)
      // and canonicalized — the normalization URL-keyed dedup needs
      // before equality means anything (q_line_dedup's synthesize-then-
      // operate pattern)
      "q_url_canonical" -> ((s: SparkSession, dir: String) => {
        val messy = when(col("doc_id") % 4 === 0,
          concat(lit("HTTP://WWW."), col("source"),
            lit(".Example.COM:80/a/b/?b=2&a=1&utm_campaign=c#frag")))
          .when(col("doc_id") % 4 === 1,
            concat(lit("https://www."), col("source"),
              lit(".example.com/path/"), col("doc_id").cast("string"), lit("/")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("HTTPS://"), col("source"),
              lit(".EXAMPLE.com:443/x?utm_source=s&gclid=g")))
          .otherwise(concat(lit("http://"), col("source"),
            lit(".example.com:8080/p?z=1&y=2&y=1")))
        Tables(s, dir, "documents")
          .selectCols(col("doc_id"), messy.as("url"))
          .mutate("canonical_url" -> canonicalUrl(col("url")))
          .arrange("doc_id").df
      }),


      // code-likeness routing signal: structural symbol densities +
      // the combined code_micro rate (pure scan-local projection)
      "q_code_signals" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Corpus.codeSignals(Tables.df(s, dir, "documents"),
            "text", "doc_id"))
          .arrange("doc_id").df),


      // per-language tokenizer fertility: BPE-ish subwords per
      // whitespace word and bytes per subword, by language — the
      // numbers that decide per-language token budgets in a mixture
      // (CJK-like scripts pay more subwords per word; the micro ratios
      // are integral division, bit-portable)
      "q_lang_fertility" -> ((s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .selectCols(col("lang"),
            tokenCount(col("text")).cast("long").as("__t"),
            bpeTokenCount(col("text")).cast("long").as("__b"),
            length(col("text")).cast("long").as("__c"))
          .groupBy("lang")
          .summarize(
            "n_docs" -> count(lit(1)),
            "n_tokens" -> sum(col("__t")),
            "n_bpe" -> sum(col("__b")),
            "n_chars" -> sum(col("__c")))
          .mutate(
            "fertility_micro" ->
              when(col("n_tokens") === 0L, lit(0L))
                .otherwise(expr("n_bpe * 1000000 DIV n_tokens")),
            "chars_per_bpe_micro" ->
              when(col("n_bpe") === 0L, lit(0L))
                .otherwise(expr("n_chars * 1000000 DIV n_bpe")))
          .arrange("lang").df),


      "q_domains" -> ((s: SparkSession, dir: String) => {
        val url = concat(lit("https://"), col("source"),
          lit(".example.com/"), col("lang"), lit("/"), col("doc_id"))
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .select(col("doc_id"), col("n_chars"), url.as("__u"))
            .select(col("doc_id"), col("n_chars"),
              parse_url(col("__u"), lit("HOST")).as("host"),
              parse_url(col("__u"), lit("PATH")).as("path"))
            .groupBy(col("host"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_chars")).as("sum_chars"),
              min(col("path")).as("first_path")))
          .arrange("host").df
      }),


      // BM25 relevance of every document for a fixed term query
      // (micro-scaled BIGINT scores; oracle mirrors every float op)
      "q_bm25" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Bm25.score(Tables.df(s, dir, "documents"), "doc_id", "text",
            Bm25Terms))
          .arrange("doc_id").df),


      // per-doc TF-IDF top-3 keywords (BM25's per-doc twin): smoothed
      // idf, micro-scaled BIGINT ranking so ln's ulp sensitivity never
      // reaches the rank order
      "q_tfidf_terms" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Bm25.tfidfTopTerms(Tables.df(s, dir, "documents"),
            "doc_id", "text", k = 3))
          .arrange("doc_id", "rank").df),


      // exact token-set Jaccard over a bounded window of docs
      "q_token_jaccard" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.tokenJaccardPairs(
            Tables.df(s, dir, "documents").filter(col("doc_id") < 40),
            "text", "doc_id", minJaccard = 0.3))
          .arrange("id_a", "id_b").df),


      // exact char-5-gram Jaccard over a bounded window of docs
      // (0.25: char-5-gram similarity tops out near 0.28 on this corpus, so
      // the former 0.3 cut returned an empty — vacuously green — result)
      "q_ngram_jaccard" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.ngramJaccardPairs(
            Tables.df(s, dir, "documents").filter(col("doc_id") < 40),
            "text", "doc_id", n = 5, minJaccard = 0.25))
          .arrange("id_a", "id_b").df)
  )

  val oracles: Map[String, String] = Map(


    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,


    // cross-document line dedup: DuckDB rebuilds the same newline-every-8-
    // tokens documents with integer slicing, then replays the doc-freq
    // strip; zipped unnests pair each line with its position
    "q_line_dedup" ->
      """WITH ml AS (
        |  SELECT doc_id,
        |    array_to_string(
        |      list_transform(range(0, ((len(ts)-1)//8)+1),
        |        i -> array_to_string(list_slice(ts, i*8+1, i*8+8), ' ')),
        |      chr(10)) AS text
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
        |lines AS (
        |  SELECT doc_id, unnest(range(len(ls))) AS pos, unnest(ls) AS line
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM ml)),
        |freq AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY line)
        |SELECT doc_id,
        |  COALESCE(array_to_string(list(line ORDER BY pos) FILTER (WHERE df < 2),
        |    chr(10)), '') AS clean_text,
        |  (COUNT(*) FILTER (WHERE df < 2))::BIGINT AS n_kept,
        |  (COUNT(*) FILTER (WHERE df >= 2))::BIGINT AS n_dropped
        |FROM lines JOIN freq USING (line)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    // inverted index; the same corpus-size-derived [lo, hi] cut as the
    // query, in identical integer arithmetic (exact at any scale)
    "q_postings" ->
      """WITH nd AS (SELECT COUNT(*)::BIGINT AS n FROM documents),
        |b AS (SELECT GREATEST(3, (6*n + 999) // 1000) AS lo,
        |             (79*n) // 100 AS hi FROM nd),
        |pairs AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        |    FROM documents)),
        |v AS (SELECT token, COUNT(*)::BIGINT AS df FROM pairs GROUP BY token
        |      HAVING COUNT(*) BETWEEN (SELECT lo FROM b) AND (SELECT hi FROM b))
        |SELECT token, df,
        |  array_to_string(list_sort(list(doc_id)), ',') AS posting
        |FROM pairs JOIN v USING (token)
        |GROUP BY token, df
        |ORDER BY token""".stripMargin,


    // DSIR: bucket = the q_feature_hash token hash; add-1 smoothed
    // bucket distributions; the lloyd floor(x*S + 0.5) quantization
    // (sign-exact); per-doc score = Σ_instances w[bucket] ≡ the count
    // vector · llr dot product; gate replays quantile_cont
    "q_dsir" ->
      """WITH rtok AS (
        |  SELECT doc_id, unnest(list_transform(
        |    string_split_regex(trim(text), '\s+'),
        |    tk -> ('0x' || substring(md5(tk), 1, 12))::BIGINT % 64)) AS h
        |  FROM documents WHERE doc_id % 10 <> 0),
        |ttok AS (
        |  SELECT doc_id, unnest(list_transform(
        |    string_split_regex(trim(text), '\s+'),
        |    tk -> ('0x' || substring(md5(tk), 1, 12))::BIGINT % 64)) AS h
        |  FROM documents WHERE doc_id % 10 = 0),
        |tcnt AS (SELECT h, COUNT(*)::BIGINT AS n FROM ttok GROUP BY h),
        |rcnt AS (SELECT h, COUNT(*)::BIGINT AS n FROM rtok GROUP BY h),
        |ttot AS (SELECT COUNT(*) + 64 AS n FROM ttok),
        |rtot AS (SELECT COUNT(*) + 64 AS n FROM rtok),
        |llr AS (
        |  SELECT g.j AS h,
        |    CAST(floor((ln((COALESCE(t.n, 0) + 1)::DOUBLE / ttot.n::DOUBLE)
        |              - ln((COALESCE(r.n, 0) + 1)::DOUBLE / rtot.n::DOUBLE))
        |         * 1000000.0 + 0.5) AS BIGINT) AS w
        |  FROM range(0, 64) AS g(j)
        |  LEFT JOIN tcnt t ON t.h = g.j
        |  LEFT JOIN rcnt r ON r.h = g.j
        |  CROSS JOIN ttot CROSS JOIN rtot),
        |scores AS (
        |  SELECT d.doc_id, COALESCE(SUM(llr.w), 0)::BIGINT AS dsir_micro
        |  FROM (SELECT doc_id FROM documents WHERE doc_id % 10 <> 0) d
        |  LEFT JOIN rtok ON rtok.doc_id = d.doc_id
        |  LEFT JOIN llr ON llr.h = rtok.h
        |  GROUP BY d.doc_id),
        |thr AS (SELECT quantile_cont(dsir_micro, 0.75) AS t FROM scores)
        |SELECT doc_id, dsir_micro FROM scores CROSS JOIN thr
        |WHERE dsir_micro::DOUBLE >= t
        |ORDER BY doc_id""".stripMargin,


    // domain KL: the q_dsir bucket/smoothing conventions grouped by
    // source; corpus totals re-aggregate the (source, bucket) counts —
    // kl_num is an exact integer, kl_micro one division of identical
    // integers (bit-stable)
    "q_domain_kl" ->
      """WITH tok AS (
        |  SELECT source, ('0x' || substring(md5(tk), 1, 12))::BIGINT % 64 AS h
        |  FROM (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tk
        |        FROM documents)),
        |agg AS (SELECT source, h, COUNT(*)::BIGINT AS c FROM tok GROUP BY source, h),
        |st AS (SELECT source, SUM(c)::BIGINT AS n FROM agg GROUP BY source),
        |bt AS (SELECT h, SUM(c)::BIGINT AS cb FROM agg GROUP BY h),
        |g AS (SELECT SUM(cb)::BIGINT AS nn FROM bt),
        |dense AS (
        |  SELECT st.source, st.n, r.j AS h,
        |    COALESCE(a.c, 0)::BIGINT AS c, COALESCE(bt.cb, 0)::BIGINT AS cb, g.nn
        |  FROM st CROSS JOIN range(0, 64) AS r(j)
        |  LEFT JOIN agg a ON a.source IS NOT DISTINCT FROM st.source AND a.h = r.j
        |  LEFT JOIN bt ON bt.h = r.j
        |  CROSS JOIN g),
        |terms AS (
        |  SELECT source, n,
        |    (c + 1) * (CAST(floor(ln((c + 1)::DOUBLE / (n + 64)::DOUBLE)
        |                 * 1000000.0 + 0.5) AS BIGINT)
        |             - CAST(floor(ln((cb + 1)::DOUBLE / (nn + 64)::DOUBLE)
        |                 * 1000000.0 + 0.5) AS BIGINT)) AS t
        |  FROM dense)
        |SELECT source, MAX(n)::BIGINT AS n_tokens, SUM(t)::BIGINT AS kl_num,
        |  SUM(t)::DOUBLE / (MAX(n) + 64)::DOUBLE AS kl_micro
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,


    // flagship pipeline: quality + lang CASE chains (the q_quality /
    // q_lang_id replays), min-id survivor per fp over the FILTERED set,
    // survivor-row lang, split buckets, HUGEINT-pinned rollup sums
    "q_pipeline_e2e" ->
      """WITH q AS (
        |  SELECT doc_id, text,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
        |      / len(string_split_regex(trim(text), '\s+')) * 0.5
        |    + CASE WHEN length(regexp_replace(text, '\s+', '', 'g'))
        |        / len(string_split_regex(trim(text), '\s+')) BETWEEN 3.0 AND 10.0
        |        THEN 0.3 ELSE 0.0 END
        |    + CASE WHEN (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
        |        / length(text) < 0.1 THEN 0.2 ELSE 0.0 END AS quality,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS s_en,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','den'], x))) AS s_de,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> list_contains(['el','la','de','que','y','en','un','es','se','no'], x))) AS s_es,
        |    len(list_filter(string_split_regex(trim(text), '\s+'),
        |        x -> list_contains(['le','la','de','et','un','que','pour','dans','ce','une'], x))) AS s_fr
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, text,
        |    CASE
        |      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |      WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |      WHEN s_es >= s_fr THEN 'es'
        |      ELSE 'fr' END AS lang_guess
        |  FROM q WHERE quality > 0.1),
        |d AS (
        |  SELECT min(doc_id) AS doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |    COUNT(*)::BIGINT AS n_dups
        |  FROM g GROUP BY fp),
        |s AS (SELECT d.doc_id, d.n_dups, g.lang_guess
        |      FROM d JOIN g USING (doc_id)),
        |sp AS (
        |  SELECT n_dups, lang_guess,
        |    CASE WHEN b < 800000 THEN 'train'
        |         WHEN b < 900000 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM (SELECT *,
        |          ('0x' || substring(md5('graft_split_42_' || doc_id), 1, 12))::BIGINT
        |            % 1000000 AS b
        |        FROM s))
        |SELECT split, lang_guess, COUNT(*)::BIGINT AS n_docs,
        |  SUM(n_dups - 1)::BIGINT AS n_dups_removed
        |FROM sp GROUP BY split, lang_guess
        |ORDER BY split, lang_guess""".stripMargin,


    // html extract: the same regex/replace chain, RE2 'g' flags, &amp;
    // decoded last
    "q_html_extract" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    '<html><head><script>var x = 1 < 2;</script>' ||
        |    '<style>p { color: red; }</style></head><body><h1>Title</h1><p>' ||
        |    text ||
        |    '</p><div class="x">&amp;lt; &lt;kept&gt; &nbsp;&#39;q&#39;' ||
        |    '</div></body></html>' AS html
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |            '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '(?s)<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
        |      '[ \t\n\f\r]+', ' ', 'g')) AS clean
        |  FROM h)
        |SELECT doc_id, clean, length(clean)::BIGINT AS n_clean_chars
        |FROM c ORDER BY doc_id""".stripMargin,


    // boilerplate: token-poly gram instances (the th → hs convention),
    // top-50 by (count DESC, hash ASC), integral-division fraction
    "q_boilerplate" -> OracleSql.boilerplate(),


    // collocations: bigram/unigram count replay, the one spelled-out
    // division order, micro-nat floor quantization, deterministic
    // (pmi DESC, w1, w2) top-100 then outer name order
    "q_collocations" ->
      """WITH toks AS (
        |  SELECT string_split_regex(trim(text), '\s+') AS ts FROM documents),
        |inst AS (
        |  SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1,
        |         unnest(list_transform(range(1, len(ts)), i -> ts[i+1])) AS w2
        |  FROM toks),
        |c2 AS (SELECT w1, w2, COUNT(*)::BIGINT AS n FROM inst GROUP BY w1, w2),
        |n12 AS (SELECT SUM(n)::BIGINT AS t FROM c2),
        |uni AS (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        |        FROM documents),
        |c1 AS (SELECT w, COUNT(*)::BIGINT AS c FROM uni GROUP BY w),
        |n1 AS (SELECT SUM(c)::BIGINT AS t FROM c1),
        |scored AS (
        |  SELECT c2.w1, c2.w2, c2.n,
        |    CAST(floor(ln((c2.n::DOUBLE / n12.t::DOUBLE) /
        |      ((a.c::DOUBLE / n1.t::DOUBLE) * (b.c::DOUBLE / n1.t::DOUBLE)))
        |      * 1000000.0 + 0.5) AS BIGINT) AS pmi_micro
        |  FROM c2 JOIN c1 a ON a.w = c2.w1 JOIN c1 b ON b.w = c2.w2
        |  CROSS JOIN n12 CROSS JOIN n1
        |  WHERE c2.n >= 5),
        |top AS (SELECT * FROM scored ORDER BY pmi_micro DESC, w1, w2 LIMIT 100)
        |SELECT w1, w2, n, pmi_micro FROM top ORDER BY w1, w2""".stripMargin,


    // ppl buckets: the q_lm_score replay + integral per-token division,
    // tertile thresholds via quantile_cont (the quantileGate
    // interpolation parity), CASE chain identical to the Spark stamp
    "q_ppl_buckets" ->
      """WITH inst AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents),
        |cnt AS (SELECT t, COUNT(*) AS c FROM inst GROUP BY t),
        |tot AS (SELECT SUM(c) AS n FROM cnt),
        |scores AS (
        |  SELECT doc_id, COUNT(*)::BIGINT AS n_tokens,
        |    (SUM(CAST(round(-ln(c::DOUBLE / n::DOUBLE) * 1000000.0, 0) AS BIGINT)))::BIGINT
        |      AS surprisal_micro
        |  FROM inst JOIN cnt USING (t) CROSS JOIN tot
        |  GROUP BY doc_id),
        |m AS (SELECT doc_id, (surprisal_micro // n_tokens)::BIGINT AS ppl_micro
        |      FROM scores),
        |thr AS (SELECT quantile_cont(ppl_micro, 0.25) AS t0,
        |               quantile_cont(ppl_micro, 0.75) AS t1
        |        FROM m)
        |SELECT doc_id, ppl_micro,
        |  (CASE WHEN ppl_micro::DOUBLE <= t0 THEN 0
        |        WHEN ppl_micro::DOUBLE <= t1 THEN 1 ELSE 2 END)::BIGINT AS bucket
        |FROM m CROSS JOIN thr ORDER BY doc_id""".stripMargin,


    // dataset card: straight SQL twin of the one-pass rollup
    "q_corpus_card" ->
      """SELECT lang, COUNT(*)::BIGINT AS n_docs,
        |  SUM(len(string_split_regex(trim(text), '\s+')))::BIGINT AS n_tokens,
        |  SUM(n_chars)::BIGINT AS total_chars,
        |  COUNT(DISTINCT source)::BIGINT AS n_sources,
        |  MIN(n_chars)::BIGINT AS min_chars,
        |  MAX(n_chars)::BIGINT AS max_chars,
        |  (COUNT(*) - COUNT(DISTINCT text))::BIGINT AS n_exact_dup
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,


    // BPE: generated round-by-round CTE replay (OracleSql.bpeCtes)
    "q_bpe_merges" -> OracleSql.bpeMerges(BpeMerges),

    "q_bpe_tokenize" -> OracleSql.bpeTokenize(BpeMerges),

    // store-backed twin: training math identical, artifact round-trip
    // lossless (strings + longs) — oracle shared verbatim
    "q_model_store_bpe" -> OracleSql.bpeTokenize(BpeMerges),


    // quality classifier: the pinned micro-weights spliced as a VALUES
    // relation; per-token-instance weight sum ≡ the count-vector dot
    // product (the q_dsir replay shape); bucket = the q_feature_hash
    // token hash; null/token-free docs score the bare bias via the
    // LEFT JOIN + COALESCE
    "q_quality_classifier" -> QcScoreOracle,

    // store-backed twin: the pinned micro-weights round-trip the
    // ModelStore losslessly (longs), so scoring from the LOADED model
    // replays the same oracle verbatim
    "q_model_store_qc" -> QcScoreOracle,


    // C4 cleaning: same line lambda as Spark's HOF; sentence count is a
    // length delta (regexp_replace needs DuckDB's explicit 'g' flag)
    "q_c4_clean" ->
      """WITH s AS (
        |  SELECT doc_id, regexp_replace(text,
        |    '(\w+ \w+ \w+ \w+ \w+ \w+) ', '\1.' || chr(10), 'g') AS text
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, text, string_split_regex(text, '\r?\n') AS lines
        |  FROM s),
        |k AS (
        |  SELECT doc_id, text, len(lines)::BIGINT AS n_lines,
        |    list_filter(lines, l ->
        |      regexp_matches(rtrim(l), '[.!?"”]\z')
        |      AND len(string_split_regex(trim(l), '\s+')) >= 5
        |      AND NOT contains(lower(l), 'javascript')) AS kept
        |  FROM d),
        |c AS (
        |  SELECT doc_id, text,
        |    -- DuckDB renders the empty list's join as NULL; Spark's
        |    -- array_join is '' — coalesce to the Spark value
        |    COALESCE(array_to_string(kept, chr(10)), '') AS clean_text,
        |    len(kept)::BIGINT AS n_kept,
        |    (n_lines - len(kept))::BIGINT AS n_dropped
        |  FROM k)
        |SELECT doc_id, clean_text, n_kept, n_dropped,
        |  (NOT contains(lower(text), 'lorem ipsum'))
        |    AND (NOT contains(text, '{'))
        |    AND (length(clean_text)
        |         - length(regexp_replace(clean_text, '[.!?]', '', 'g')) >= 3)
        |    AS c4_keep
        |FROM c ORDER BY doc_id""".stripMargin,


    // repetition rules: line stats + one g/s CTE pair per gram size
    // (repGramCte); flags are the same integer cross-multiplications
    "q_repetition_rules" -> {
      val gramCtes = (2 to 10).map(repGramCte).mkString(",\n")
      val joins = (2 to 10).map(n => s"JOIN s$n USING (doc_id)").mkString(" ")
      val flags = Seq(
        "n_dup_lines * 10 <= n_lines * 3 AS r_dup_line",
        "dup_line_chars * 5 <= n_line_chars AS r_dup_line_char",
        "top_2gram_chars * 100 <= n_chars * 20 AS r_top_2gram",
        "top_3gram_chars * 100 <= n_chars * 18 AS r_top_3gram",
        "top_4gram_chars * 100 <= n_chars * 16 AS r_top_4gram",
        "dup_5gram_chars * 100 <= n_chars * 15 AS r_dup_5gram",
        "dup_6gram_chars * 100 <= n_chars * 14 AS r_dup_6gram",
        "dup_7gram_chars * 100 <= n_chars * 13 AS r_dup_7gram",
        "dup_8gram_chars * 100 <= n_chars * 12 AS r_dup_8gram",
        "dup_9gram_chars * 100 <= n_chars * 11 AS r_dup_9gram",
        "dup_10gram_chars * 100 <= n_chars * 10 AS r_dup_10gram")
      val passConj = flags.map(_.split(" AS ")(0).trim)
        .map(c => s"($c)").mkString("\n    AND ")
      s"""WITH d AS (
         |  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks,
         |         string_split(text, chr(10)) AS lines
         |  FROM documents),
         |lstat AS (
         |  SELECT doc_id,
         |    length(text)::BIGINT AS n_chars,
         |    len(lines)::BIGINT AS n_lines,
         |    (len(lines) - len(list_distinct(lines)))::BIGINT AS n_dup_lines,
         |    (length(text) - (len(lines) - 1))::BIGINT AS n_line_chars,
         |    COALESCE(list_sum(list_transform(list_distinct(lines),
         |      x -> CASE WHEN len(list_filter(lines, y -> y = x)) > 1
         |                THEN len(list_filter(lines, y -> y = x)) * length(x)
         |                ELSE 0 END)), 0)::BIGINT AS dup_line_chars
         |  FROM d),
         |$gramCtes,
         |j AS (
         |  SELECT l.*,
         |    s2.top_chars AS top_2gram_chars,
         |    s3.top_chars AS top_3gram_chars,
         |    s4.top_chars AS top_4gram_chars,
         |    s5.dup_chars AS dup_5gram_chars,
         |    s6.dup_chars AS dup_6gram_chars,
         |    s7.dup_chars AS dup_7gram_chars,
         |    s8.dup_chars AS dup_8gram_chars,
         |    s9.dup_chars AS dup_9gram_chars,
         |    s10.dup_chars AS dup_10gram_chars
         |  FROM lstat l $joins)
         |SELECT doc_id, n_chars, n_lines, n_dup_lines, n_line_chars,
         |  dup_line_chars, top_2gram_chars, top_3gram_chars, top_4gram_chars,
         |  dup_5gram_chars, dup_6gram_chars, dup_7gram_chars, dup_8gram_chars,
         |  dup_9gram_chars, dup_10gram_chars,
         |  ${flags.mkString(",\n  ")},
         |  $passConj AS repetition_pass
         |FROM j ORDER BY doc_id""".stripMargin
    },


    // Gopher rules: all-integer comparisons (no float in the whole
    // query); DuckDB regexp_replace needs the explicit 'g' flag Spark
    // applies by default, and integer division is `//`
    "q_gopher" ->
      """WITH d AS (
        |  SELECT doc_id, text,
        |    string_split_regex(trim(text), '\s+') AS toks,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    len(toks)::BIGINT AS n_words,
        |    length(regexp_replace(text, '\s+', '', 'g'))::BIGINT AS n_chars_ns,
        |    ((length(text) - length(replace(text, '#', '')))
        |      + (length(text) - length(replace(text, '...', ''))) // 3
        |      + (length(text) - length(replace(text, '…', ''))))::BIGINT AS n_sym,
        |    len(lines)::BIGINT AS n_lines,
        |    len(list_filter(lines,
        |      l -> regexp_matches(l, '^\s*[-*•]')))::BIGINT AS n_bullet,
        |    len(list_filter(lines,
        |      l -> regexp_matches(l, '(\.\.\.|…)\s*\z')))::BIGINT AS n_ellipsis,
        |    len(list_filter(toks,
        |      w -> regexp_matches(w, '[A-Za-z]')))::BIGINT AS n_alpha_words,
        |    len(list_filter(['the','be','to','of','and','that','have','with'],
        |      w -> list_contains(toks, w)))::BIGINT AS n_stop_hits
        |  FROM d)
        |SELECT doc_id, n_words,
        |  n_words BETWEEN 50 AND 100000 AS r_word_count,
        |  n_chars_ns BETWEEN n_words * 3 AND n_words * 10 AS r_word_len,
        |  n_sym * 10 <= n_words AS r_symbol,
        |  n_bullet * 10 <= n_lines * 9 AS r_bullet,
        |  n_ellipsis * 10 <= n_lines * 3 AS r_ellipsis,
        |  n_alpha_words * 5 >= n_words * 4 AS r_alpha,
        |  n_stop_hits >= 2 AS r_stopwords,
        |  (n_words BETWEEN 50 AND 100000)
        |    AND (n_chars_ns BETWEEN n_words * 3 AND n_words * 10)
        |    AND (n_sym * 10 <= n_words)
        |    AND (n_bullet * 10 <= n_lines * 9)
        |    AND (n_ellipsis * 10 <= n_lines * 3)
        |    AND (n_alpha_words * 5 >= n_words * 4)
        |    AND (n_stop_hits >= 2) AS gopher_pass
        |FROM c ORDER BY doc_id""".stripMargin,


    // unigram-LM surprisal: per-token -ln p quantized to micro-nats BEFORE
    // the sum (order-insensitive integer aggregate; per-value ln parity is
    // the only float contract — Corpus.lmScore scaladoc)
    "q_lm_score" ->
      """WITH inst AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents),
        |cnt AS (SELECT t, COUNT(*) AS c FROM inst GROUP BY t),
        |tot AS (SELECT SUM(c) AS n FROM cnt)
        |SELECT doc_id,
        |  COUNT(*)::BIGINT AS n_tokens,
        |  (SUM(CAST(round(-ln(c::DOUBLE / n::DOUBLE) * 1000000.0, 0) AS BIGINT)))::BIGINT
        |    AS surprisal_micro
        |FROM inst JOIN cnt USING (t) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    // bigram conditional surprisal: p(w2|w1) = c(w1,w2)/c(w1,*), counts
    // from this corpus; micro-nat quantization BEFORE the sum (same
    // order-insensitive replay contract as q_lm_score); <2-token docs
    // restored as (0, 0) via the left join, mirroring Corpus.lmScoreBigram
    "q_lm_bigram" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
        |  FROM documents),
        |inst AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1,
        |    unnest(list_transform(range(1, len(ts)), i -> ts[i+1])) AS w2
        |  FROM toks),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM inst GROUP BY w1, w2),
        |cc AS (SELECT w1, SUM(c2) AS cc FROM c2 GROUP BY w1),
        |scored AS (
        |  SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
        |    CAST(SUM(CAST(round(-ln(c2::DOUBLE / cc::DOUBLE) * 1000000.0, 0)
        |      AS BIGINT)) AS BIGINT) AS surprisal2_micro
        |  FROM inst JOIN c2 USING (w1, w2) JOIN cc USING (w1)
        |  GROUP BY doc_id)
        |SELECT doc_id,
        |  COALESCE(n_bigrams, 0)::BIGINT AS n_bigrams,
        |  COALESCE(surprisal2_micro, 0)::BIGINT AS surprisal2_micro
        |FROM documents LEFT JOIN scored USING (doc_id)
        |ORDER BY doc_id""".stripMargin,


    "q_quality" ->
      """SELECT doc_id,
        |  length(text) AS n_chars_m,
        |  length(regexp_replace(text, '\s+', '', 'g'))
        |    / len(string_split_regex(trim(text), '\s+')) AS mean_tok_len,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
        |    / len(string_split_regex(trim(text), '\s+')) AS stop_ratio,
        |  (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
        |    / length(text) AS punct_ratio,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
        |    / len(string_split_regex(trim(text), '\s+')) * 0.5
        |  + CASE WHEN length(regexp_replace(text, '\s+', '', 'g'))
        |      / len(string_split_regex(trim(text), '\s+')) BETWEEN 3.0 AND 10.0
        |      THEN 0.3 ELSE 0.0 END
        |  + CASE WHEN (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
        |      / length(text) < 0.1 THEN 0.2 ELSE 0.0 END AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,


    "q_lang_id" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents)
        |SELECT doc_id,
        |  len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS s_en,
        |  len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','den'], x))) AS s_de,
        |  len(list_filter(w, x -> list_contains(['el','la','de','que','y','en','un','es','se','no'], x))) AS s_es,
        |  len(list_filter(w, x -> list_contains(['le','la','de','et','un','que','pour','dans','ce','une'], x))) AS s_fr,
        |  CASE
        |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |    WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |    WHEN s_es >= s_fr THEN 'es'
        |    ELSE 'fr' END AS lang_guess
        |FROM t ORDER BY doc_id""".stripMargin,


    // confusion matrix: the q_lang_id guess chain grouped against the
    // stored label
    "q_langid_confusion" ->
      """WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS w FROM documents),
        |g AS (
        |  SELECT lang,
        |    len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS s_en,
        |    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','den'], x))) AS s_de,
        |    len(list_filter(w, x -> list_contains(['el','la','de','que','y','en','un','es','se','no'], x))) AS s_es,
        |    len(list_filter(w, x -> list_contains(['le','la','de','et','un','que','pour','dans','ce','une'], x))) AS s_fr,
        |    CASE
        |      WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |      WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |      WHEN s_es >= s_fr THEN 'es'
        |      ELSE 'fr' END AS lang_guess
        |  FROM t)
        |SELECT lang, lang_guess, COUNT(*)::BIGINT AS n,
        |  (CASE WHEN lang = lang_guess THEN 1 ELSE 0 END)::BIGINT AS is_hit
        |FROM g GROUP BY lang, lang_guess
        |ORDER BY lang, lang_guess""".stripMargin,


    "q_vocab" ->
      """SELECT token, COUNT(*)::BIGINT AS n
        |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,


    "q_feature_hash" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_transform(string_split_regex(trim(text), '\s+'),
        |      tk -> ('0x' || substring(md5(tk), 1, 12))::BIGINT % 64) AS hs
        |  FROM documents),
        |v AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 64), j -> len(list_filter(hs, h -> h = j))) AS v
        |  FROM t)
        |SELECT doc_id,
        |  len(list_filter(v, x -> x > 0))::BIGINT AS nnz,
        |  list_aggregate(list_transform(v, x -> x * x), 'sum')::BIGINT AS l2sq,
        |  list_position(v, list_max(v))::BIGINT AS top_bucket
        |FROM v ORDER BY doc_id""".stripMargin,


    "q_percentiles" ->
      """SELECT lang,
        |  quantile_cont(n_chars, 0.25) AS p25,
        |  quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.75) AS p75,
        |  quantile_cont(n_chars, 0.9) AS p90
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,


    "q_diversity" ->
      """SELECT doc_id,
        |  len(list_distinct(toks)) / len(toks) AS ttr,
        |  list_max(list_transform(list_distinct(toks),
        |    t -> len(list_filter(toks, x -> x = t)))) / len(toks) AS top_tok_ratio
        |FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,


    "q_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,


    "q_pii_redact" ->
      s"""SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(text || '$PiiTail',
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\\s]+', '<URL>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,


    "q_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE doc_id < 100),
        |s AS (
        |  SELECT doc_id, toks,
        |    unnest(range(0, greatest(len(toks), 1), 24)) AS st
        |  FROM t)
        |SELECT doc_id, (st / 24)::BIGINT AS chunk_id,
        |  len(toks[st + 1 : st + 32])::BIGINT AS n_tok,
        |  md5(array_to_string(toks[st + 1 : st + 32], ' ')) AS chunk_fp
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,


    "q_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5('graft_pack_42_' || doc_id), 1, 12))::BIGINT
        |      % 1000000 % 8 AS shard,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, shard, ((cum - n_tok) // 256)::BIGINT AS example_id
        |FROM c ORDER BY doc_id""".stripMargin,


    "q_repetition" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(0, len(toks) - 1),
        |                i -> array_to_string(toks[i+1:i+2], ' ')) END AS gs
        |  FROM d)
        |SELECT doc_id, len(gs)::BIGINT AS n_2gram,
        |  len(list_distinct(gs))::BIGINT AS n_distinct_2gram,
        |  list_max(list_transform(list_distinct(gs),
        |    x -> len(list_filter(gs, y -> y = x))))::BIGINT AS top_2gram_n
        |FROM g ORDER BY doc_id""".stripMargin,


    "q_nfc" ->
      """WITH n AS (
        |  SELECT doc_id, nfc_normalize(
        |    'cafe' || chr(769) || ' nai' || chr(776) || 've ' ||
        |    'A' || chr(778) || ' ' || text) AS nt
        |  FROM documents)
        |SELECT doc_id, md5(nt) AS norm_fp,
        |  length(nt)::INT AS n_chars_norm
        |FROM n ORDER BY doc_id""".stripMargin,


    "q_substring_dup" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(0, len(toks) - 4),
        |                i -> array_to_string(toks[i+1:i+5], ' ')) END)) AS g
        |  FROM d),
        |h AS (SELECT doc_id, ('0x' || substring(md5(g), 1, 12))::BIGINT AS hh
        |      FROM w),
        |f AS (SELECT hh, COUNT(*) AS df FROM h GROUP BY hh)
        |SELECT doc_id, COUNT(*)::BIGINT AS n_windows,
        |  SUM(CASE WHEN f.df > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared
        |FROM h JOIN f USING (hh)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,


    // URL canonicalization: same synthesis, step-by-step regexp replay
    // (DuckDB regexp_replace needs its explicit 'g'; extract-no-match
    // returns '' in both engines)
    "q_url_canonical" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE doc_id % 4
        |      WHEN 0 THEN 'HTTP://WWW.' || source ||
        |        '.Example.COM:80/a/b/?b=2&a=1&utm_campaign=c#frag'
        |      WHEN 1 THEN 'https://www.' || source || '.example.com/path/'
        |        || doc_id::VARCHAR || '/'
        |      WHEN 2 THEN 'HTTPS://' || source ||
        |        '.EXAMPLE.com:443/x?utm_source=s&gclid=g'
        |      ELSE 'http://' || source || '.example.com:8080/p?z=1&y=2&y=1'
        |    END AS url
        |  FROM documents),
        |s1 AS (
        |  SELECT doc_id, url,
        |    regexp_replace(trim(url), '#.*$', '') AS nofrag FROM m),
        |s2 AS (
        |  SELECT *,
        |    lower(regexp_extract(nofrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_replace(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
        |  FROM s1),
        |s3 AS (
        |  SELECT *, lower(regexp_extract(rest, '^([^/?]*)', 1)) AS hostport,
        |    regexp_replace(rest, '^[^/?]*', '') AS afterhost FROM s2),
        |s4 AS (
        |  SELECT *,
        |    CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
        |         WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
        |         ELSE hostport END AS host,
        |    COALESCE(regexp_replace(regexp_extract(afterhost, '^([^?]*)', 1),
        |      '/+$', ''), '') AS path0,
        |    COALESCE(regexp_extract(afterhost, '\?(.*)$', 1), '') AS query0
        |  FROM s3),
        |s5 AS (
        |  SELECT *, CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
        |    COALESCE(array_to_string(list_sort(list_filter(
        |      string_split(query0, '&'),
        |      p -> p <> '' AND NOT regexp_matches(p,
        |        '^(utm_[a-z]+|fbclid|gclid|msclkid)='))), '&'), '') AS q
        |  FROM s4)
        |SELECT doc_id, url,
        |  scheme || '://' || host || path ||
        |    CASE WHEN q = '' THEN '' ELSE '?' || q END AS canonical_url
        |FROM s5 ORDER BY doc_id""".stripMargin,

    // code signals: length-difference char-class counts (DuckDB needs
    // the 'g' flag — its regexp_replace is first-match by default,
    // Spark's is global) + non-overlapping camel transitions
    "q_code_signals" ->
      """WITH d AS (SELECT doc_id, coalesce(text, '') AS text FROM documents)
        |SELECT doc_id,
        |  length(text)::BIGINT AS n_chars,
        |  (length(text) - length(regexp_replace(text, '[{}()\[\];=<>#]', '', 'g')))::BIGINT AS n_sym,
        |  (length(text) - length(regexp_replace(text, '_', '', 'g')))::BIGINT AS n_underscore,
        |  len(regexp_extract_all(text, '[a-z][A-Z]'))::BIGINT AS n_camel,
        |  (CASE WHEN length(text) = 0 THEN 0 ELSE
        |    ((length(text) - length(regexp_replace(text, '[{}()\[\];=<>#]', '', 'g'))) * 4
        |     + (length(text) - length(regexp_replace(text, '_', '', 'g'))) * 2
        |     + len(regexp_extract_all(text, '[a-z][A-Z]')) * 2) * 1000000
        |    // length(text) END)::BIGINT AS code_micro
        |FROM d ORDER BY doc_id""".stripMargin,

    // fertility: same token/BPE-proxy conventions as q_token_count;
    // micro ratios in integer division, sums cast to the portable BIGINT
    "q_lang_fertility" ->
      """WITH d AS (
        |  SELECT lang,
        |    len(string_split_regex(trim(text), '\s+'))::BIGINT AS t,
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))::BIGINT AS b,
        |    length(text)::BIGINT AS c
        |  FROM documents),
        |g AS (
        |  SELECT lang, COUNT(*)::BIGINT AS n_docs,
        |    CAST(SUM(t) AS BIGINT) AS n_tokens,
        |    CAST(SUM(b) AS BIGINT) AS n_bpe,
        |    CAST(SUM(c) AS BIGINT) AS n_chars
        |  FROM d GROUP BY lang)
        |SELECT lang, n_docs, n_tokens, n_bpe, n_chars,
        |  (CASE WHEN n_tokens = 0 THEN 0
        |        ELSE n_bpe * 1000000 // n_tokens END)::BIGINT AS fertility_micro,
        |  (CASE WHEN n_bpe = 0 THEN 0
        |        ELSE n_chars * 1000000 // n_bpe END)::BIGINT AS chars_per_bpe_micro
        |FROM g ORDER BY lang""".stripMargin,

    "q_domains" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    'https://' || source || '.example.com/' || lang || '/' || doc_id
        |      AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n_chars,
        |    regexp_extract(url, 'https://([^/]+)', 1) AS host,
        |    regexp_extract(url, 'https://[^/]+(/.*)', 1) AS path
        |  FROM u)
        |SELECT host, COUNT(*)::BIGINT AS n_docs,
        |  SUM(n_chars)::BIGINT AS sum_chars, MIN(path) AS first_path
        |FROM p GROUP BY host ORDER BY host""".stripMargin,


    "q_bm25" -> OracleSql.bm25(Bm25Terms),

    // tf-idf: same smoothing, same parenthesization, rank on the exact
    // micro-scaled BIGINT (ties on the term)
    "q_tfidf_terms" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*)::BIGINT AS tf
        |       FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT tok, COUNT(DISTINCT doc_id)::BIGINT AS df
        |          FROM toks GROUP BY 1),
        |nn AS (SELECT COUNT(*)::BIGINT AS n FROM documents),
        |sc AS (
        |  SELECT doc_id, tok, tf,
        |    CAST(round((tf * (ln((n + 1.0) / (df + 1.0)) + 1.0)) * 1000000.0)
        |         AS BIGINT) AS score_micro
        |  FROM tf JOIN dfreq USING (tok) CROSS JOIN nn)
        |SELECT doc_id, tok, tf, score_micro, rank FROM (
        |  SELECT doc_id, tok, tf, score_micro,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY score_micro DESC, tok) AS BIGINT) AS rank
        |  FROM sc) z
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,


    "q_token_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS toks
        |  FROM documents WHERE doc_id < 40)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.toks, b.toks))
        |      / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.3 ORDER BY id_a, id_b""".stripMargin,


    "q_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct(
        |      CASE WHEN length(nrm) <= 5 THEN [nrm]
        |           ELSE list_transform(range(0, length(nrm) - 4),
        |                  i -> substring(nrm, CAST(i + 1 AS INT), 5)) END) AS gs
        |  FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nrm
        |        FROM documents WHERE doc_id < 40))
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.gs, b.gs))
        |      / len(list_distinct(list_concat(a.gs, b.gs))) AS jaccard
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.25 ORDER BY id_a, id_b""".stripMargin
  )
}
