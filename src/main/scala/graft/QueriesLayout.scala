package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.Tables
import graft.Queries._
import graft.functions.TextFunctions._
import graft.operators.{Blocklist, Bm25, Corpus, Dedup, Diagnostics, Layout, Multimodal, Outliers, Pack, RangeJoin, Sampling, Similarity}

/** Layout and diagnostics surface: Z-order, ORC/JSONL roundtrips,
  * multimodal plumbing, blocklists, outliers, skew and histogram
  * reports.
  *
  * One ledger family of [[Queries.all]] (oracle-parity rules documented
  * there); assembled and key-set-ratcheted by SparkEntry/EntrySuite. */
private[graft] object QueriesLayout {

  /** The q_blocklist deny rule, shared with its audit twin so the 1.8%
    * threshold lives in ONE place per engine: sources whose sub-60-char
    * fragment rate exceeds 1.8%, compared in exact integer arithmetic
    * (n60·1000 > n·18) so both engines agree bitwise at any scale. The
    * oracle twin is [[denyCte]]. */
  private def denySources(docs: DataFrame): DataFrame =
    docs.groupBy("source")
      .agg(sum(when(col("n_chars") < 60, 1L).otherwise(0L)).as("__n60"),
        count(lit(1)).as("__n"))
      .filter(col("__n60") * 1000L > col("__n") * 18L)
      .select("source")

  /** [[denySources]]' oracle replay — the same integer rate rule. */
  private val denyCte =
    """WITH deny AS (
      |  SELECT source FROM documents GROUP BY source
      |  HAVING COUNT(*) FILTER (WHERE n_chars < 60) * 1000 > COUNT(*) * 18)""".stripMargin

  val queries: Map[String, Q] = Map(


      // Z-order (Morton) layout key over (l_partkey, l_suppkey): 8-bit
      // quantize lanes from a one-row min/max stats aggregate, bits
      // interleaved — pure integer arithmetic, so DuckDB replays the key
      // bit-exactly (same subtract/scale/div/shift/or both engines)
      "q_zorder" -> ((s: SparkSession, dir: String) => {
        val li = lineitem(s, dir).df
        val st = li.agg(
          min(col("l_partkey")), max(col("l_partkey")),
          min(col("l_suppkey")), max(col("l_suppkey"))).head()
        val bits = 8
        val key = Layout.zorderKey(Seq(
          Layout.quantize(col("l_partkey"), st.getLong(0), st.getLong(1), bits),
          Layout.quantize(col("l_suppkey"), st.getLong(2), st.getLong(3), bits)),
          bits)
        graft.api.DataTable(
          li.select(col("l_orderkey"), col("l_linenumber"), key.as("zkey")))
          .arrange("l_orderkey", "l_linenumber").df
      }),


      // JSONL interchange roundtrip: parallel write of a directory of
      // part files, schema-explicit distributed read-back (no inference
      // pass), identity vs the source table
      "q_jsonl_roundtrip" -> ((s: SparkSession, dir: String) => {
        val tmp = roundtripDir("jsonl", dir)
        val src = Tables.df(s, dir, "documents")
        graft.sources.Jsonl.writeJsonl(src, tmp)
        val back = graft.sources.Jsonl.readJsonl(s, tmp, Some(src.schema))
        graft.api.DataTable(
          back.select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), md5(col("text").cast("binary")).as("text_fp")))
          .arrange("doc_id").df
      }),


      // ORC interchange roundtrip (predicate/partition behavior shared
      // with the parquet sink; identity vs the source table)
      "q_orc_roundtrip" -> ((s: SparkSession, dir: String) => {
        val tmp = roundtripDir("orc", dir)
        val src = Tables.df(s, dir, "documents")
        graft.sources.Sinks.writeOrc(src, tmp)
        graft.api.DataTable(
          graft.sources.Sinks.readOrc(s, tmp)
            .select(col("doc_id"), col("lang"), col("source"),
              col("n_chars"), md5(col("text").cast("binary")).as("text_fp")))
          .arrange("doc_id").df
      }),


      // multimodal blob plumbing (stub decode; features deterministic)
      "q_multimodal" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Multimodal.documentBlobFeatures(s, Tables.df(s, dir, "documents"))
            .select(col("doc_id"), col("n_bytes"),
              col("width").cast("long").as("width"),
              col("height").cast("long").as("height"),
              col("mean_byte")))
          .arrange("doc_id").df),


      // blocklist gate: drop every document from a deny-listed source. The
      // deny-list is derived from the data itself — sources whose sub-60-
      // char fragment RATE exceeds 1.8% ("spam-ridden domains"). The rate
      // rule (r20 — VERDICT r19 #5) replaces the original existence rule
      // (ANY sub-60 doc denies), which is not scale-invariant: at 500k
      // docs every source owns at least one tiny fragment and the deny
      // list covered the universe. The rate compares in exact integer
      // arithmetic (n60·1000 > n·18 ⇔ rate > 1.8%) so both engines agree
      // bitwise at any scale; at sf0.01 it reproduces the existence
      // denylist exactly (every denied source there has rate ≥ 4%), at
      // sf10 it denies 9 of 20 sources — non-vacuous both sides. Plan:
      // the list is dimension-sized → broadcast LeftAnti, corpus never
      // shuffles; the rate screen is one map-side-combined aggregate.
      "q_blocklist" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.df(s, dir, "documents")
        graft.api.DataTable(
          Blocklist.filterBlocklist(docs, denySources(docs), "source")
            .select("doc_id", "source", "n_chars"))
          .arrange("doc_id").df
      }),


      // the audit complement of q_blocklist: rows that ARE blocked
      // (LeftSemi twin, same broadcast shape) — what the curation report
      // shows before dropping them.
      "q_blocklist_audit" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.df(s, dir, "documents")
        graft.api.DataTable(
          Blocklist.matchBlocklist(docs, denySources(docs), "source")
            .select("doc_id", "source", "n_chars"))
          .arrange("doc_id").df
      }),


      // per-(source,lang) z-score outlier screen over integer n_chars:
      // exact decimal sums → fixed IEEE derivation, so z is bit-identical
      // cross-engine (the operator's exactness contract, oracle-proven);
      // singleton (source,lang) groups exist in the data and exercise the
      // degenerate-group z=0 guard on both engines.
      "q_outliers" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Outliers.zscoreOutliers(Tables.df(s, dir, "documents"),
            col("n_chars"), Seq("source", "lang"), threshold = 1.5)
            .select("doc_id", "source", "lang", "n_chars", "z"))
          .arrange("doc_id").df),


      // per-column profile: null/distinct/min/max data card in one
      // aggregate pass (multi-distinct on one Expand)
      "q_profile" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Diagnostics.profile(Tables.df(s, dir, "documents"),
            Seq("doc_id", "lang", "source", "n_chars")))
          .arrange("col_name").df),


      // quantile winsorization: n_chars clipped to the exact [p25, p75]
      // interpolated cuts; one percentile aggregate, scan-local clamp
      "q_winsorize" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.winsorize(
            Tables.df(s, dir, "documents").select("doc_id", "n_chars"),
            "n_chars", lo = 0.25, hi = 0.75))
          .arrange("doc_id").df),


      // snapshot diff: per-id added/removed/changed between two corpus
      // versions (derived deterministically from documents); unchanged
      // rows never materialize
      "q_dataset_diff" -> ((s: SparkSession, dir: String) => {
        val d = Tables.df(s, dir, "documents")
        val oldV = d.filter(col("doc_id") < 400)
        val newV = d.filter(col("doc_id") >= 100)
          .withColumn("text", when(col("doc_id") % 7 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        graft.api.DataTable(
          Diagnostics.datasetDiff(oldV, newV, "doc_id", "text"))
          .arrange("doc_id").df
      }),


      // Deequ-style validation gate: declarative rules -> one integer
      // pass/fail report; all row-local rules share ONE aggregate pass,
      // uniqueness adds one bounded key shuffle
      "q_expectations" -> ((s: SparkSession, dir: String) => {
        import graft.operators.Expectations._
        graft.api.DataTable(
          check(Tables.df(s, dir, "documents"), Seq(
            RowRule("lang_code_shape", col("lang").rlike("^[a-z]{2}$")),
            RowRule("n_chars_consistent",
              col("n_chars") === length(col("text"))),
            RowRule("n_chars_positive", col("n_chars") > 0),
            RowRule("text_not_null", col("text").isNotNull),
            UniqueRule("doc_id_unique", "doc_id"))))
          .arrange("rule").df
      }),


      // robust (median/MAD) outliers: the heavy-tail-immune twin of
      // q_outliers — modified z with the conventional 3.5 cut, exact
      // half-integer percentile parity; threshold 1.5 here so the
      // synthetic corpus actually flags rows
      "q_robust_outliers" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Outliers.robustOutliers(
            Tables.df(s, dir, "documents")
              .select("doc_id", "source", "lang", "n_chars"),
            "n_chars", Seq("source", "lang"), threshold = 1.5)
            .select("doc_id", "source", "lang", "n_chars", "rz"))
          .arrange("doc_id").df),


      // key-skew pre-flight: the 20 heaviest l_suppkey values with exact
      // counts + corpus share — the decide-salting-vs-broadcast report
      "q_key_skew" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Diagnostics.keySkew(Tables.df(s, dir, "lineitem"),
            Seq("l_suppkey"), topK = 20))
          .arrange("rnk").df),


      // exact fixed-width histogram of document lengths — all-integer
      // binning so the edges replay bit-identically in DuckDB
      "q_histogram" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Diagnostics.histogram(Tables.df(s, dir, "documents"),
            "n_chars", lo = 0L, hi = 600L, bins = 24))
          .arrange("bin").df),


      // count-min sketch audit: the exact top-20 tokens joined with
      // their sketch estimates (est >= exact by construction — the
      // sketch's shuffle is bounded at depth×width groups, the 100 TB
      // alternative to an unbounded-vocabulary exact groupBy; md5-derived
      // hash rows make every counter DuckDB-replayable)
      "q_countmin" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.df(s, dir, "documents")
        // ONE corpus scan + ONE vocabulary shuffle feed both the exact
        // top-k side and the sketch counters (r21): the pinned
        // token-frequency frame replaces two independent explode+count
        // subtrees, and the sketch hashes each DISTINCT token once
        // instead of every instance (countMinSketchFromCounts scaladoc)
        val tokCounts = graft.operators.PlanCache.pinned(
          docs.select(explode(tokens(col("text"))).as("tok"))
            .groupBy("tok").agg(count(lit(1)).as("n_exact")))
        val top = tokCounts
          .orderBy(col("n_exact").desc, col("tok")).limit(20)
        val sk = Diagnostics.countMinSketchFromCounts(
          tokCounts.select(col("tok"), col("n_exact").as("cnt")),
          "tok", "cnt", depth = 4, width = 256)
        graft.api.DataTable(
          top.join(Diagnostics.countMinEstimate(sk, top,
            depth = 4, width = 256), Seq("tok"))
            .select(col("tok"), col("n_exact"), col("n_est")))
          .arrange("tok").df
      })
  )

  val oracles: Map[String, String] = Map(


    "q_zorder" -> OracleSql.zorderLineitem(),


    "q_jsonl_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars,
        |  md5(text) AS text_fp
        |FROM documents ORDER BY doc_id""".stripMargin,


    "q_orc_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars,
        |  md5(text) AS text_fp
        |FROM documents ORDER BY doc_id""".stripMargin,


    "q_multimodal" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  64 + octet_length(encode(text)) % 512 AS width,
        |  64 + (octet_length(encode(text)) * 31) % 512 AS height,
        |  list_aggregate(list_transform(
        |    range(1, least(octet_length(encode(text)), 64) + 1),
        |    i -> ord(substring(text, i, 1))), 'avg') AS mean_byte
        |FROM documents ORDER BY doc_id""".stripMargin,


    // same integer rate rule as the query (denyCte, one site per engine)
    "q_blocklist" ->
      s"""$denyCte
        |SELECT doc_id, source, n_chars FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM deny WHERE deny.source = d.source)
        |ORDER BY doc_id""".stripMargin,


    "q_blocklist_audit" ->
      s"""$denyCte
        |SELECT doc_id, source, n_chars FROM documents d
        |WHERE EXISTS (SELECT 1 FROM deny WHERE deny.source = d.source)
        |ORDER BY doc_id""".stripMargin,


    // mirrors Outliers.withZscore's exact op sequence: integer-exact group
    // sums cast to double (values << 2^53, so every cast is exact), then
    // the same divide/sqrt chain — correctly-rounded IEEE ops on identical
    // inputs give identical bits; degenerate groups guard to 0.0 BEFORE
    // the threshold filter on both engines
    "q_outliers" ->
      """WITH st AS (
        |  SELECT source, lang,
        |    COUNT(*)::DOUBLE AS n,
        |    SUM(n_chars)::DOUBLE AS s,
        |    SUM(n_chars * n_chars)::DOUBLE AS q
        |  FROM documents GROUP BY source, lang),
        |scored AS (
        |  SELECT d.doc_id, d.source, d.lang, d.n_chars,
        |    CASE WHEN st.n > 1.0 AND (st.q - st.s*st.s/st.n) > 0.0
        |         THEN (d.n_chars::DOUBLE - st.s/st.n)
        |              / sqrt((st.q - st.s*st.s/st.n) / (st.n - 1.0))
        |         ELSE 0.0 END AS z
        |  FROM documents d JOIN st USING (source, lang))
        |SELECT * FROM scored WHERE abs(z) > 1.5
        |ORDER BY doc_id""".stripMargin,


    // profile: one aggregate row melted per column; min/max native-typed
    // then cast
    "q_profile" ->
      """WITH p AS (
        |  SELECT COUNT(*)::BIGINT AS n,
        |    COUNT(doc_id)::BIGINT AS nn_id, COUNT(DISTINCT doc_id)::BIGINT AS nd_id,
        |    CAST(MIN(doc_id) AS VARCHAR) AS mn_id, CAST(MAX(doc_id) AS VARCHAR) AS mx_id,
        |    COUNT(lang)::BIGINT AS nn_lang, COUNT(DISTINCT lang)::BIGINT AS nd_lang,
        |    CAST(MIN(lang) AS VARCHAR) AS mn_lang, CAST(MAX(lang) AS VARCHAR) AS mx_lang,
        |    COUNT(source)::BIGINT AS nn_src, COUNT(DISTINCT source)::BIGINT AS nd_src,
        |    CAST(MIN(source) AS VARCHAR) AS mn_src, CAST(MAX(source) AS VARCHAR) AS mx_src,
        |    COUNT(n_chars)::BIGINT AS nn_nc, COUNT(DISTINCT n_chars)::BIGINT AS nd_nc,
        |    CAST(MIN(n_chars) AS VARCHAR) AS mn_nc, CAST(MAX(n_chars) AS VARCHAR) AS mx_nc
        |  FROM documents)
        |SELECT col_name, n_rows, n_null, n_distinct, min_val, max_val FROM (
        |  SELECT 'doc_id' AS col_name, n AS n_rows, (n - nn_id)::BIGINT AS n_null,
        |    nd_id AS n_distinct, mn_id AS min_val, mx_id AS max_val FROM p
        |  UNION ALL
        |  SELECT 'lang', n, (n - nn_lang)::BIGINT, nd_lang, mn_lang, mx_lang FROM p
        |  UNION ALL
        |  SELECT 'source', n, (n - nn_src)::BIGINT, nd_src, mn_src, mx_src FROM p
        |  UNION ALL
        |  SELECT 'n_chars', n, (n - nn_nc)::BIGINT, nd_nc, mn_nc, mx_nc FROM p)
        |ORDER BY col_name""".stripMargin,


    // winsorize: quantile_cont cuts (the quantileGate interpolation
    // parity), explicit null branch, LEAST/GREATEST clamp
    "q_winsorize" ->
      """WITH t AS (
        |  SELECT quantile_cont(n_chars, 0.25) AS wlo,
        |         quantile_cont(n_chars, 0.75) AS whi
        |  FROM documents)
        |SELECT doc_id, n_chars,
        |  CASE WHEN n_chars IS NULL THEN NULL
        |       ELSE LEAST(GREATEST(n_chars::DOUBLE, wlo), whi) END AS n_chars_w
        |FROM documents CROSS JOIN t
        |ORDER BY doc_id""".stripMargin,


    // dataset diff: full-outer on id, md5 fingerprints, null-safe change
    // compare, unchanged filtered
    "q_dataset_diff" ->
      """WITH o AS (
        |  SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id < 400),
        |n AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS fp
        |  FROM documents WHERE doc_id >= 100)
        |SELECT doc_id, status FROM (
        |  SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |         WHEN n.doc_id IS NULL THEN 'removed'
        |         WHEN o.fp IS DISTINCT FROM n.fp THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
        |WHERE status <> 'unchanged'
        |ORDER BY doc_id""".stripMargin,


    // robust outliers: two quantile_cont stages (integral then
    // half-integer inputs — both interpolations exact), null-safe group
    // joins, 0.6745 modified-z scale, degenerate MAD -> 0
    "q_robust_outliers" ->
      """WITH m AS (
        |  SELECT source, lang, quantile_cont(n_chars, 0.5) AS med
        |  FROM documents GROUP BY source, lang),
        |a AS (
        |  SELECT d.doc_id, d.source, d.lang, d.n_chars, m.med,
        |    abs(d.n_chars::DOUBLE - m.med) AS ad
        |  FROM documents d JOIN m
        |    ON d.source IS NOT DISTINCT FROM m.source
        |   AND d.lang IS NOT DISTINCT FROM m.lang),
        |md AS (
        |  SELECT source, lang, quantile_cont(ad, 0.5) AS mad
        |  FROM a GROUP BY source, lang)
        |SELECT doc_id, source, lang, n_chars, rz FROM (
        |  SELECT a.doc_id, a.source, a.lang, a.n_chars,
        |    CASE WHEN md.mad > 0.0e0
        |         THEN 0.6745e0 * (a.n_chars::DOUBLE - a.med) / md.mad
        |         ELSE 0.0e0 END AS rz
        |  FROM a JOIN md
        |    ON a.source IS NOT DISTINCT FROM md.source
        |   AND a.lang IS NOT DISTINCT FROM md.lang)
        |WHERE abs(rz) > 1.5e0
        |ORDER BY doc_id""".stripMargin,


    // expectations: SUM(CASE) per row rule over one scan, per-key counts
    // for uniqueness; null predicates fail (the coalesce(false) rule)
    "q_expectations" ->
      """WITH r AS (
        |  SELECT COUNT(*)::BIGINT AS n,
        |    SUM(CASE WHEN regexp_matches(lang, '^[a-z]{2}$') THEN 1 ELSE 0 END)::BIGINT AS p_lang,
        |    SUM(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END)::BIGINT AS p_cons,
        |    SUM(CASE WHEN n_chars > 0 THEN 1 ELSE 0 END)::BIGINT AS p_pos,
        |    SUM(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS p_nn
        |  FROM documents),
        |u AS (
        |  SELECT SUM(c)::BIGINT AS n,
        |    SUM(CASE WHEN k IS NOT NULL AND c = 1 THEN 1 ELSE 0 END)::BIGINT AS p
        |  FROM (SELECT doc_id AS k, COUNT(*) AS c FROM documents GROUP BY doc_id))
        |SELECT rule, n_rows, n_pass, (n_rows - n_pass)::BIGINT AS n_fail FROM (
        |  SELECT 'lang_code_shape' AS rule, n AS n_rows, p_lang AS n_pass FROM r
        |  UNION ALL
        |  SELECT 'n_chars_consistent', n, p_cons FROM r
        |  UNION ALL
        |  SELECT 'n_chars_positive', n, p_pos FROM r
        |  UNION ALL
        |  SELECT 'text_not_null', n, p_nn FROM r
        |  UNION ALL
        |  SELECT 'doc_id_unique', n, p FROM u)
        |ORDER BY rule""".stripMargin,


    // key skew: exact counts, one integer division for share, rank with
    // the same (n DESC, key ASC) deterministic tie-break as the query
    "q_key_skew" ->
      """WITH c AS (
        |  SELECT l_suppkey, COUNT(*)::BIGINT AS n FROM lineitem GROUP BY 1),
        |t AS (SELECT SUM(n) AS tot FROM c)
        |SELECT l_suppkey, n, n::DOUBLE / tot::DOUBLE AS share,
        |  (ROW_NUMBER() OVER (ORDER BY n DESC, l_suppkey))::BIGINT AS rnk
        |FROM c CROSS JOIN t
        |ORDER BY n DESC, l_suppkey
        |LIMIT 20""".stripMargin,


    // histogram: the same all-integer bin formula ((x-lo)*bins // (hi-lo))
    // and the same one-division edge arithmetic as the operator
    "q_histogram" ->
      """WITH b AS (
        |  SELECT ((n_chars - 0) * 24) // 600 AS bin
        |  FROM documents WHERE n_chars >= 0 AND n_chars < 600)
        |SELECT bin, COUNT(*)::BIGINT AS n,
        |  0 + bin * 600 / 24 AS lo_edge,
        |  0 + (bin + 1) * 600 / 24 AS hi_edge
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,


    // count-min: the same md5-derived hash rows ("cm<r>_<token>" hash48
    // mod width) rebuild the identical counter table; estimate = MIN over
    // rows, absent buckets read 0
    "q_countmin" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        |  FROM documents),
        |top AS (
        |  SELECT tok, COUNT(*)::BIGINT AS n_exact FROM toks GROUP BY tok
        |  ORDER BY n_exact DESC, tok LIMIT 20),
        |sk AS (
        |  SELECT r, bucket, COUNT(*)::BIGINT AS cnt FROM (
        |    SELECT t.r,
        |      ('0x' || substring(md5('cm' || t.r || '_' || tok), 1, 12))::BIGINT % 256 AS bucket
        |    FROM toks CROSS JOIN range(4) t(r)) x
        |  GROUP BY r, bucket),
        |pe AS (
        |  SELECT p.tok, MIN(COALESCE(sk.cnt, 0)) AS n_est FROM (
        |    SELECT tok, t.r,
        |      ('0x' || substring(md5('cm' || t.r || '_' || tok), 1, 12))::BIGINT % 256 AS bucket
        |    FROM top CROSS JOIN range(4) t(r)) p
        |  LEFT JOIN sk USING (r, bucket) GROUP BY p.tok)
        |SELECT top.tok, n_exact, n_est FROM top JOIN pe USING (tok)
        |ORDER BY tok""".stripMargin
  )
}
