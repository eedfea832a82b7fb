package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines.
  *
  * Beyond-reference surface (the reference has no text catalog — any Nim
  * proc is callable in a formula, SURVEY.md §2.9); here we provide the
  * operations an LLM training-data pipeline needs, built exclusively from
  * codegen-friendly `org.apache.spark.sql.functions` (no UDFs): they run
  * inside whole-stage codegen / vectorized evaluation and scale linearly
  * with executors.
  */
object TextFunctions {

  /** Whitespace tokens. `trim` first so leading/trailing runs don't produce
    * empty tokens. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: alpha runs, digit runs, and single punctuation
    * marks — a cheap proxy for tokenizer cost accounting. */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def bpeTokenCount(c: Column): Column = size(bpeTokens(c))

  /** Canonical form for fingerprinting: lowercase, whitespace collapsed. */
  def normalizeText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Canonical URL — the normalization URL-keyed dedup and per-domain
    * accounting need before equality means anything: a crawl stores the
    * same page as `HTTP://Site.com:80/a/?b=2&a=1&utm_source=x#frag` and
    * `http://site.com/a?a=1&b=2`. Steps, in order: trim; drop the
    * fragment; lowercase scheme and host:port (path/query keep case —
    * paths are case-sensitive by spec); strip the scheme's default port
    * (:80 http, :443 https — others kept); collapse repeated trailing
    * slashes off the path (empty path → "/"); drop tracking parameters
    * (`utm_*`, `fbclid`, `gclid`, `msclkid`) and empty fragments of the
    * query, sort the survivors bytewise, rejoin. Pure codegen-friendly
    * string expressions; every step replays in DuckDB (the oracle's
    * regexp_replace needs its explicit 'g' flag). Contract: absolute
    * http(s) URLs; anything else is normalized best-effort, never
    * nulled. */
  def canonicalUrl(c: Column): Column = {
    val noFrag = regexp_replace(trim(c), "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val afterHost = regexp_replace(rest, "^[^/?]*", "")
    val path0 = regexp_replace(regexp_extract(afterHost, "^([^?]*)", 1),
      "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query0 = regexp_extract(afterHost, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query0, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[a-z]+|fbclid|gclid|msclkid)=")))
    val q = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Deterministic document fingerprint (md5 of the normalized text) —
    * cross-engine stable, the key for exact dedup. */
  def fingerprint(c: Column): Column = md5(normalizeText(c).cast("binary"))

  /** Cross-engine 48-bit hash: the first 12 hex chars of md5, parsed
    * base-16. Unlike xxhash64 this is reproducible in any engine with md5
    * — DuckDB: `('0x' || substring(md5(x), 1, 12))::BIGINT` — which makes
    * every LSH stage built on it exactly oracle-checkable. 48 bits keeps
    * the value well inside both BIGINT and double-exact range. */
  def hash48(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 12), 16, 10).cast("long")

  /** Word k-shingles: contiguous k-grams of whitespace tokens, the input
    * unit for MinHash. NOTE: higher-order functions get no CSE — when `c`
    * is an expression (not an attribute), pass an aliased token column
    * through [[wordShinglesFromTokens]] instead, or the tokenizer re-runs
    * per shingle (O(tokens²) per row). */
  def wordShingles(c: Column, k: Int): Column =
    wordShinglesFromTokens(tokens(c), k)

  /** [[wordShingles]] over an already-tokenized (ideally aliased) array
    * column. */
  def wordShinglesFromTokens(w: Column, k: Int): Column =
    when(size(w) < k, array(concat_ws(" ", w)))
      .otherwise(transform(
        sequence(lit(0), size(w) - k),
        i => concat_ws(" ", slice(w, i + 1, lit(k)))))

  /** Character n-grams of the normalized text (near-dup shingling for
    * short strings). */
  def charNgrams(c: Column, n: Int): Column = {
    val s = normalizeText(c)
    when(length(s) <= n, array(s))
      .otherwise(transform(
        sequence(lit(0), length(s) - n),
        i => s.substr(i + 1, lit(n))))
  }

  /** hash48 of every char k-gram of an ALREADY-normalized text column —
    * stage 1 of winnowing. Alias the result before feeding
    * [[winnowFromHashes]] (same no-CSE rule as [[wordShingles]]: HOF
    * lambdas re-evaluate non-attribute inputs per element). */
  def gramHashes(nrm: Column, k: Int): Column =
    transform(
      when(length(nrm) <= k, array(nrm))
        .otherwise(transform(sequence(lit(0), length(nrm) - k),
          i => nrm.substr(i + 1, lit(k)))),
      g => hash48(g))

  /** Winnowing fingerprint selection (the MOSS algorithm: Schleimer,
    * Wilkerson & Aiken, SIGMOD'03) — stage 2: the minimum hash of every
    * `w`-consecutive-hash window, deduplicated and sorted. Any substring
    * of length >= k + w - 1 shared by two documents contributes at least
    * one common fingerprint, while only ~2/(w+1) of all gram hashes are
    * kept — the standard local, position-robust document fingerprint.
    * Scan-local per row: no shuffle anywhere; hashes shorter than one
    * window collapse to their single minimum. */
  def winnowFromHashes(hs: Column, w: Int): Column =
    array_sort(array_distinct(transform(
      sequence(lit(1), greatest(size(hs) - (w - 1), lit(1))),
      j => array_min(slice(hs, j, lit(w))))))

  /** One-call winnowing over raw text (normalize → gram hashes → window
    * minima) as ONE codegen'd kernel call (graftshim.WinnowText): the
    * whole pipeline runs compiled inside the scan projection, pinned
    * bit-identical to the staged HOF form ([[gramHashes]] →
    * [[winnowFromHashes]]) in TextSuite. This is the hot-path spelling —
    * the HOF stages remain as the reference semantics. */
  def winnowFingerprints(c: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.graftshim.{Shim, WinnowText}
    Shim.toColumn(WinnowText(Shim.toExpression(c), k, w))
  }

  /** Interpreted HOF formulation of [[winnowFingerprints]] (what the
    * kernel replaced) — kept for the bit-identity pin. */
  private[graft] def winnowFingerprintsHof(c: Column, k: Int, w: Int): Column =
    winnowFromHashes(gramHashes(normalizeText(c), k), w)

  /** Number of tokens present in `words` (duplicates counted). */
  def stopwordCount(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), t => array_contains(array(words.map(lit): _*), t)))

  def stopwordRatio(c: Column, words: Seq[String]): Column =
    stopwordCount(c, words).cast("double") / tokenCount(c).cast("double")

  /** Mean token length (chars-without-spaces / tokens). */
  def meanTokenLen(c: Column): Column =
    length(regexp_replace(c, "\\s+", "")).cast("double") /
      tokenCount(c).cast("double")

  /** Ratio of non-alphanumeric, non-space characters. */
  def punctRatio(c: Column): Column =
    (length(c) - length(regexp_replace(c, "[^A-Za-z0-9\\s]", ""))).cast("double") /
      length(c).cast("double")

  /** Composite quality score in [0,1]-ish from PRE-COMPUTED ratio columns
    * (same no-recompute rule as [[langGuessFromCounts]]): rewards stopword
    * presence and moderate token length, penalizes punctuation soup. The
    * exact weights are pipeline policy, not truth — keep them simple and
    * documented. */
  def qualityFromParts(stopRatio: Column, meanTokLen: Column, pRatio: Column): Column =
    stopRatio * lit(0.5) +
      when(meanTokLen.between(3.0, 10.0), lit(0.3)).otherwise(lit(0.0)) +
      when(pRatio < 0.1, lit(0.2)).otherwise(lit(0.0))

  /** Convenience form over raw text — prefer [[qualityFromParts]] with
    * aliased ratio columns in hot paths (see q_quality). */
  def qualityScore(c: Column, stopwords: Seq[String]): Column =
    qualityFromParts(stopwordRatio(c, stopwords), meanTokenLen(c), punctRatio(c))

  /** Lexical diversity (type-token ratio): distinct tokens / tokens.
    * Low values flag template/boilerplate text (Gopher-style repetition
    * signal). Pass a PRE-COMPUTED token-array column (no-recompute rule). */
  def typeTokenRatioFromTokens(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")

  /** Count of the most frequent element of a string-array column,
    * computed as the longest run in the SORTED array (one fold,
    * O(n log n) per row) — the naive distinct×count spelling is
    * quadratic per document, which a long doc at corpus scale turns
    * into a straggler. Same value: the max run of a sorted array IS
    * the max element frequency. */
  def maxRunCount(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + lit(1L))
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** Duplicate-run character stats of a string-array column, computed as
    * ONE fold over the sorted array (the [[maxRunCount]] technique —
    * the distinct×count spelling is quadratic per row and stragglers a
    * long doc). Returns a struct:
    *   - `dup_chars`: Σ over elements occurring ≥ 2 of count·strlen —
    *     the "characters inside duplicated elements" numerator of the
    *     Gopher repetition rules (all occurrences count, the public
    *     convention);
    *   - `best_count` / `best_chars`: the run stats of the
    *     lexicographic-(count, chars) max element — the "most frequent
    *     n-gram" numerator. The (count, then chars) tie rule is what a
    *     `list_max` over [count, chars] pairs replays exactly in SQL;
    *     a both-tie leaves chars equal, so the residual first-in-sort
    *     preference is value-neutral.
    *
    * The phantom initial run (prev = "", run = 0) closes harmlessly:
    * 0·len = 0 chars, run ≥ 2 false, (0,0) never beats. A REAL leading
    * empty string merges into that phantom run — also harmless, its
    * char contribution is 0 either way. */
  def dupRunStats(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("dup"),
        lit(0L).as("bc"), lit(0L).as("bh")),
      (acc, x) => {
        val same = x === acc("prev")
        val closedChars = acc("run") * length(acc("prev")).cast("long")
        val closedDup = acc("dup") +
          when(acc("run") >= 2L, closedChars).otherwise(lit(0L))
        val better = acc("run") > acc("bc") ||
          (acc("run") === acc("bc") && closedChars > acc("bh"))
        struct(
          x.as("prev"),
          when(same, acc("run") + 1L).otherwise(lit(1L)).as("run"),
          when(same, acc("dup")).otherwise(closedDup).as("dup"),
          when(same || !better, acc("bc")).otherwise(acc("run")).as("bc"),
          when(same || !better, acc("bh")).otherwise(closedChars).as("bh"))
      },
      acc => {
        val closedChars = acc("run") * length(acc("prev")).cast("long")
        val better = acc("run") > acc("bc") ||
          (acc("run") === acc("bc") && closedChars > acc("bh"))
        struct(
          (acc("dup") + when(acc("run") >= 2L, closedChars).otherwise(lit(0L)))
            .as("dup_chars"),
          when(better, acc("run")).otherwise(acc("bc")).as("best_count"),
          when(better, closedChars).otherwise(acc("bh")).as("best_chars"))
      })

  /** Fraction of the document taken by its most frequent token — the
    * companion repetition signal ([[maxRunCount]] over the tokens).
    * Pass a pre-computed token-array column. */
  def topTokenRatioFromTokens(toks: Column): Column =
    maxRunCount(toks).cast("double") / size(toks).cast("double")

  /** Feature-hashing (hashing-trick) bag-of-words embedding: token →
    * md5-bucket, `dim`-length count vector. The deterministic, vocab-free
    * text vectorizer (hashing vectorizer) — enough to drive the ANN /
    * near-dup machinery without a model. Codegen'd single-kernel
    * expression (graftshim.FeatureHashText): one O(tokens) compiled pass,
    * pinned bit-identical to the HOF reference form in TextSuite. */
  def featureHash(c: Column, dim: Int): Column = {
    import org.apache.spark.sql.graftshim.{FeatureHashText, Shim}
    Shim.toColumn(FeatureHashText(Shim.toExpression(c), dim))
  }

  /** Interpreted HOF formulation of [[featureHash]] (the O(tokens × dim)
    * fold the kernel replaced) — kept for the bit-identity pin. */
  private[graft] def featureHashHof(c: Column, dim: Int): Column = {
    val hs = transform(tokens(c), t => pmod(hash48(t), lit(dim.toLong)))
    aggregate(hs, array_repeat(lit(0L), dim),
      (acc, h) => zip_with(acc, sequence(lit(0L), lit(dim - 1L)),
        (a, j) => a + when(h === j, lit(1L)).otherwise(lit(0L))))
  }

  /** HTML → text extraction (the WET-style ingestion step): drop
    * script/style blocks whole (their contents are code, not text),
    * strip remaining tags to spaces, decode the six common entities
    * (`&amp;` LAST, so `&amp;lt;` decodes to the literal `&lt;` instead
    * of `<` — the standard double-decode pitfall), squeeze whitespace.
    * A pure projection; every pattern is RE2-compatible, so the oracle
    * replays the chain with DuckDB `regexp_replace(..., 'g')`. The
    * whitespace class is SPELLED OUT instead of `\s` — Java's `\s`
    * includes `\x0B` (vertical tab) where RE2's does not, the one place
    * the two dialects disagree on this chain. */
  def htmlToText(c: Column): Column = {
    val noScript = regexp_replace(c, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]*>", " ")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (from, to)) =>
        replace(acc, lit(from), lit(to))
      }
    trim(regexp_replace(ent, "[ \\t\\n\\f\\r]+", " "))
  }

  /** PII scrubbing: emails and URLs replaced by typed placeholders.
    * Conservative patterns shared by Java and RE2 regex dialects, so the
    * same expression replays in any engine. */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "https?://[^\\s]+", "<URL>")

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Public common-word lists, truncated. */
  val StopwordsEn = Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for")
  val StopwordsDe = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
  val StopwordsEs = Seq("el", "la", "de", "que", "y", "en", "un", "es", "se", "no")
  val StopwordsFr = Seq("le", "la", "de", "et", "un", "que", "pour", "dans", "ce", "une")

  /** Language guess from PRE-COMPUTED stopword-hit counts, fixed priority
    * order on ties (en > de > es > fr) — deterministic, cross-engine
    * replicable. Take count COLUMNS, not text: the when-chain references
    * each count several times, and interpreted expressions get no CSE —
    * inlining the counts would re-scan the token array ~16x per row. */
  def langGuessFromCounts(en: Column, de: Column, es: Column, fr: Column): Column =
    when(en >= de && en >= es && en >= fr, lit("en"))
      .when(de >= es && de >= fr, lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))

  /** Convenience form over raw text — prefer [[langGuessFromCounts]] with
    * aliased count columns in hot paths (see q_lang_id). */
  def langGuess(c: Column): Column =
    langGuessFromCounts(
      stopwordCount(c, StopwordsEn), stopwordCount(c, StopwordsDe),
      stopwordCount(c, StopwordsEs), stopwordCount(c, StopwordsFr))
}
