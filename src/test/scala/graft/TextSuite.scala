package graft

import org.apache.spark.sql.functions._
import graft.api.toDf
import graft.functions.TextFunctions._

/** Text-analysis primitives with literal golden inputs (the synthetic
  * corpus contains no PII-like strings, so redaction is pinned here
  * rather than through a vacuous corpus query). */
class TextSuite extends SparkSpec {

  test("htmlToText: blocks dropped whole, tags stripped, entities decoded") {
    val df = toDf(spark)("id" -> Seq(1, 2, 3), "h" -> Seq(
      "<html><script>var a = 1 < 2;</script><p>Hello <b>world</b></p></html>",
      "<style>p{}</style>A &amp;lt; B &lt;x&gt; &quot;q&quot; &#39;r&#39;&nbsp;!",
      "no markup at all")).df
    val out = df.select(col("id"), htmlToText(col("h")).as("c"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out(0) == "Hello world", s"got '${out(0)}'")
    // &amp;lt; decodes to the LITERAL '&lt;' (amp decoded last), while
    // the real &lt;x&gt; becomes <x>
    assert(out(1) == "A &lt; B <x> \"q\" 'r' !", s"got '${out(1)}'")
    assert(out(2) == "no markup at all")
  }

  test("canonicalUrl: case, ports, fragments, tracking params, slash collapse") {
    val cases = Seq(
      // messy everything: case, default port, unsorted+tracking query, fragment
      "HTTP://WWW.Site.COM:80/a/b/?b=2&a=1&utm_campaign=c#frag"
        -> "http://www.site.com/a/b?a=1&b=2",
      // trailing slashes collapse, path case preserved
      "https://site.com/Path/To//" -> "https://site.com/Path/To",
      // bare host -> "/", default https port stripped
      "https://Site.com:443" -> "https://site.com/",
      // all-tracking query disappears entirely (no dangling '?')
      "https://s.com/x?utm_source=a&fbclid=b&gclid=c&msclkid=d"
        -> "https://s.com/x",
      // NON-default port survives; duplicate keys sort stably
      "http://s.com:8080/p?z=1&y=2&y=1" -> "http://s.com:8080/p?y=1&y=2&z=1",
      // :443 on http is NOT default -> kept; empty params dropped
      "http://s.com:443/p?&&a=1" -> "http://s.com:443/p?a=1",
      // fragment-only suffix; root path stays one slash
      "https://s.com/#top" -> "https://s.com/")
    val df = toDf(spark)("id" -> cases.indices.map(_.toLong),
      "u" -> cases.map(_._1)).df
    val got = df.select(col("id"), canonicalUrl(col("u")).as("c"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got == cases.map(_._2), got.mkString("\n"))
  }

  test("redactPii replaces emails and URLs with typed placeholders") {
    val df = toDf(spark)("id" -> Seq(1, 2, 3), "t" -> Seq(
      "contact me at jane.doe+spam@example.co.uk today",
      "docs at https://example.com/a?b=c#frag and http://t.co/x",
      "no pii here at all")).df
    val r = df.select(redactPii(col("t"))).orderBy(lit(1)).collect().map(_.getString(0))
    assert(r.contains("contact me at <EMAIL> today"))
    assert(r.contains("docs at <URL> and <URL>"))
    assert(r.contains("no pii here at all"))
  }

  test("FeatureHashText kernel equals the HOF fold (incl. empty/whitespace)") {
    val df = toDf(spark)("id" -> Seq(1, 2, 3, 4), "t" -> Seq(
      "the quick brown fox the quick",
      "a",
      "  tabs\tand\nnewlines  ",
      "")).df
    val viaKernel = df.select(col("id"), featureHash(col("t"), 16).as("v"))
      .orderBy("id").collect().map(_.getSeq[Long](1)).toSeq
    val viaHof = df.select(col("id"), featureHashHof(col("t"), 16).as("v"))
      .orderBy("id").collect().map(_.getSeq[Long](1)).toSeq
    assert(viaKernel == viaHof)
    assert(viaKernel.head.sum == 6L) // six tokens counted
  }

  test("ShinglePolyHashes kernel equals the HOF poly fold (incl. short docs)") {
    import graft.operators.Dedup
    import org.apache.spark.sql.graftshim.{Shim, ShinglePolyHashes}
    val df = toDf(spark)("id" -> Seq(1, 2, 3, 4), "t" -> Seq(
      "the quick brown fox jumps over",
      "two words",
      "  tabs\tand\nnewlines mixed in here  ",
      "")).df
    val kernel = df.select(col("id"),
      Shim.toColumn(ShinglePolyHashes(Shim.toExpression(col("t")),
        3, Dedup.P, Dedup.ShingleC)).as("h"))
      .orderBy("id").collect().map(_.getSeq[Long](1)).toSeq
    val th = transform(tokens(col("t")), tk => pmod(hash48(tk), lit(Dedup.P)))
    def poly(ts: org.apache.spark.sql.Column) =
      aggregate(ts, lit(0L), (acc, h) =>
        pmod(acc * lit(Dedup.ShingleC) + h, lit(Dedup.P)))
    val hof = df.select(col("id"),
      when(size(th) < 3, array(poly(th)))
        .otherwise(transform(sequence(lit(0), size(th) - 3),
          i => poly(slice(th, i + 1, lit(3))))).as("h"))
      .orderBy("id").collect().map(_.getSeq[Long](1)).toSeq
    assert(kernel == hof)
    assert(kernel.head.length == 4) // 6 tokens -> 4 windows
    assert(kernel(1).length == 1)   // short doc -> one fallback shingle
  }

  test("NgramStats kernel equals the HOF spelling (incl. short/empty docs)") {
    import org.apache.spark.sql.graftshim.{NgramStats, Shim}
    val df = toDf(spark)("id" -> Seq(1, 2, 3, 4, 5), "t" -> Seq(
      "a b a b a b c",   // repeated bigram 'a b' x3, 'b a' x2
      "one",             // < n tokens: single whole-text gram
      "x y",             // exactly n
      "",                // empty → one gram of the empty token
      "z z z z z")).df   // max repetition
    def kernel(n: Int) = df.select(col("id"),
      Shim.toColumn(NgramStats(Shim.toExpression(col("t")), n)).as("st"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toSeq).toSeq
    def hof(n: Int) = df
      .select(col("id"), tokens(col("t")).as("tk"))
      .select(col("id"), wordShinglesFromTokens(col("tk"), n).as("g"))
      .select(col("id"),
        size(col("g")).cast("long"),
        size(array_distinct(col("g"))).cast("long"),
        maxRunCount(col("g")))
      .orderBy("id").collect()
      .map(r => Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(kernel(2) == hof(2))
    assert(kernel(3) == hof(3))
    assert(kernel(2).head == Seq(6L, 3L, 3L)) // 6 bigrams, 3 distinct, 'a b' x3
    assert(kernel(2)(4) == Seq(4L, 1L, 4L))
  }

  test("NFC normalization converges decomposed and precomposed forms") {
    import org.apache.spark.sql.graftshim.{NfcNormalize, Shim}
    def norm(c: org.apache.spark.sql.Column) =
      Shim.toColumn(NfcNormalize(Shim.toExpression(c)))
    val df = toDf(spark)("id" -> Seq(1, 2, 3),
      "t" -> Seq(
        "café",  // decomposed: e + combining acute
        "café",   // precomposed é
        "plain")).df
    val out = df.select(col("id"), norm(col("t")).as("n"),
      length(norm(col("t"))).as("len")).orderBy("id").collect()
    assert(out(0).getString(1) == out(1).getString(1),
      "decomposed and precomposed must normalize identically")
    assert(out(0).getInt(2) == 4, "composed café is 4 chars")
    assert(out(2).getString(1) == "plain") // already-NFC fast path
    // dedup consequence: the fingerprints now collide as they should
    val fps = df.select(graft.functions.TextFunctions.fingerprint(
      norm(col("t"))).as("fp")).collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("winnowing: docs sharing a >= k+w-1 substring share a fingerprint") {
    // MOSS guarantee (Schleimer et al., SIGMOD'03): with k=5, w=4 any
    // shared substring of length >= 8 contributes >= 1 common fingerprint.
    val shared = "commonblock" // 11 chars, normalized-stable
    val df = toDf(spark)("id" -> Seq(1, 2, 3), "t" -> Seq(
      s"xxxx $shared yyyy",
      s"zz $shared qqqqqq",
      "entirely different text")).df
    val fps = df
      .select(col("id"), normalizeText(col("t")).as("n"))
      .select(col("id"), gramHashes(col("n"), 5).as("h"))
      .select(col("id"), winnowFromHashes(col("h"), 4).as("f"))
      .orderBy("id").collect().map(_.getSeq[Long](1).toSet)
    assert((fps(0) intersect fps(1)).nonEmpty,
      "shared 11-char block must yield a common fingerprint")
    assert((fps(0) intersect fps(2)).isEmpty,
      "unrelated docs should not collide on this input")
  }

  test("winnowing keeps ~2/(w+1) of gram hashes and handles short docs") {
    val long = ('a' to 'z').mkString + ('a' to 'z').mkString // 52 chars, k=5 → 48 grams
    val df = toDf(spark)("id" -> Seq(1, 2), "t" -> Seq(long, "ab")).df
      .select(col("id"), gramHashes(normalizeText(col("t")), 5).as("h"))
      .select(col("id"), size(col("h")).as("nh"),
        winnowFromHashes(col("h"), 4).as("f"), col("h"))
      .orderBy("id").collect()
    val (nh, fp) = (df(0).getInt(1), df(0).getSeq[Long](2))
    assert(nh == 48)
    assert(fp.length < nh / 2, "winnowing must select a small fraction")
    assert(fp == fp.sorted && fp.distinct == fp, "sorted, deduplicated")
    // doc shorter than k: one gram (the whole text), one fingerprint
    val shortFp = df(1).getSeq[Long](2)
    val shortHash = df(1).getSeq[Long](3)
    assert(shortFp == shortHash && shortFp.length == 1)
  }

  test("WinnowText kernel equals the staged HOF pipeline (incl. unicode/empty)") {
    val df = toDf(spark)("id" -> Seq(1, 2, 3, 4, 5, 6), "t" -> Seq(
      "The Quick   Brown Fox",
      "tiny",                       // shorter than one gram
      "",                           // empty → one gram of the empty text
      "  tabs\tand\nnewlines  ",    // whitespace collapse path
      "café naïve résumé über café", // 2-byte chars
      "a😀b emoji 😀😀 pad")).df // astral (4-byte) chars
    val staged = df
      .select(col("id"), normalizeText(col("t")).as("n"))
      .select(col("id"), gramHashes(col("n"), 5).as("h"))
      .select(col("id"), winnowFromHashes(col("h"), 4).as("f"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    val kernel = df.select(col("id"), winnowFingerprints(col("t"), 5, 4).as("f"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    assert(kernel.toSeq == staged.toSeq)
    // and against the one-call HOF spelling with different (k, w)
    val hof = df.select(col("id"), winnowFingerprintsHof(col("t"), 3, 6).as("f"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    val kernel2 = df.select(col("id"), winnowFingerprints(col("t"), 3, 6).as("f"))
      .orderBy("id").collect().map(_.getSeq[Long](1))
    assert(kernel2.toSeq == hof.toSeq)
  }

  test("type-token and top-token ratios") {
    val df = toDf(spark)("id" -> Seq(1), "t" -> Seq("a b a a c")).df
      .withColumn("toks", tokens(col("t")))
    val row = df.select(
      typeTokenRatioFromTokens(col("toks")),
      topTokenRatioFromTokens(col("toks"))).head()
    assert(row.getDouble(0) == 3.0 / 5.0) // {a,b,c} of 5 tokens
    assert(row.getDouble(1) == 3.0 / 5.0) // 'a' appears 3 of 5
  }

  test("dupRunStats: duplicate chars and lexicographic-(count,chars) top") {
    def stats(xs: String*): (Long, Long, Long) = {
      // the no-element literal array is VOID-typed; cast pins string
      val arr = array(xs.map(lit): _*).cast("array<string>")
      val r = toDf(spark)("id" -> Seq(1)).df
        .select(dupRunStats(arr).as("s"))
        .select(col("s")("dup_chars"), col("s")("best_count"),
          col("s")("best_chars")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    // a×3 (3 chars) + b×2 (2 chars) duplicated; top run is a: (3, 3)
    assert(stats("a", "b", "a", "ccc", "b", "a") == (5L, 3L, 3L))
    // count tie (2,4) vs (2,2) → chars break the tie toward "aa"
    assert(stats("aa", "aa", "b", "b") == (6L, 2L, 4L))
    // no duplicates: dup 0; top is the longest single ("ccc", 1 run)
    assert(stats("a", "bb", "ccc") == (0L, 1L, 3L))
    // empty array: all zeros (the phantom init run never counts)
    assert(stats() == (0L, 0L, 0L))
    // real empty strings merge into the phantom run at zero chars
    assert(stats("", "", "x") == (0L, 2L, 0L))
  }
}
