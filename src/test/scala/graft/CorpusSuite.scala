package graft

import org.apache.spark.sql.functions._
import graft.api.{toDf, DataTable}
import graft.operators.{Corpus, Dedup}

/** Corpus-layer operators: cross-document line dedup (boilerplate strip),
  * inverted-index posting lists, unigram-LM surprisal. */
class CorpusSuite extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    toDf(spark)("doc_id" -> rows.map(_._1), "text" -> rows.map(_._2)).df

  // ------------------------------------------------------ codeSignals

  test("codeSignals separates code-like text from prose; counts are exact") {
    val code = "def fooBar(x):\n    return {x[0]: x*2}  # camelCase_ident"
    val prose = "plain english sentences carry almost no code syntax at all"
    val out = graft.operators.Corpus.codeSignals(
      docs(1L -> code, 2L -> prose, 3L -> ""), "text", "doc_id")
      .orderBy("doc_id").collect()
    val c = out(0)
    // hand-count on `code`: ( ) { [ ] } # = 7 in-class symbols
    // (':' and '*' are deliberately outside the class)
    assert(c.getAs[Long]("n_sym") == 7L, c.toString)
    assert(c.getAs[Long]("n_underscore") == 1L)
    assert(c.getAs[Long]("n_camel") == 2L) // fooBar, camelCase
    val p = out(1)
    assert(p.getAs[Long]("n_sym") == 0L && p.getAs[Long]("code_micro") == 0L)
    assert(c.getAs[Long]("code_micro") > 100000L,
      s"code text must score high: ${c.getAs[Long]("code_micro")}")
    // empty doc: zero everything, no division blowup
    assert(out(2).getAs[Long]("code_micro") == 0L)
  }

  test("codeSignals plan is a pure scan-local projection (no exchange)") {
    val plan = graft.operators.Corpus.codeSignals(
      docs(1L -> "x"), "text", "doc_id").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ------------------------------------------------------- dedupLines

  test("dedupLines strips cross-doc boilerplate, keeps unique lines") {
    val out = DataTable(Dedup.dedupLines(docs(
      1L -> "FOOTER\nunique one\nFOOTER",
      2L -> "FOOTER\nunique two",
      3L -> "FOOTER\nFOOTER"), "text", "doc_id"))
      .arrange("doc_id")
    assert(colStrings(out, "clean_text") ==
      Seq("unique one", "unique two", ""))
    assert(colLongs(out, "n_kept") == Seq(1L, 1L, 0L))
    // BOTH instances of a dropped line count as dropped rows
    assert(colLongs(out, "n_dropped") == Seq(2L, 1L, 2L))
  }

  test("dedupLines: within-doc repeats count once toward doc frequency") {
    // "twice" appears twice but only in doc 1 → df = 1 → kept, both copies
    val out = DataTable(Dedup.dedupLines(docs(
      1L -> "twice\ntwice\nunique",
      2L -> "other"), "text", "doc_id")).arrange("doc_id")
    assert(colStrings(out, "clean_text") == Seq("twice\ntwice\nunique", "other"))
    assert(colLongs(out, "n_dropped") == Seq(0L, 0L))
  }

  test("dedupLines restores original line order, not sort order") {
    val out = DataTable(Dedup.dedupLines(docs(
      1L -> "z\na\nm", 2L -> "q"), "text", "doc_id")).arrange("doc_id")
    assert(colStrings(out, "clean_text") == Seq("z\na\nm", "q"))
  }

  // --------------------------------------------------------- postings

  test("postings applies min/max df cuts and sorts posting lists") {
    // dfs over distinct (token, doc): x=3, y=2, z=1 (in-doc repeat), w=1
    val out = DataTable(Corpus.postings(docs(
      1L -> "x y z z", 2L -> "y x", 3L -> "x w"),
      "text", "doc_id", minDf = 2L, maxDf = 2L)).arrange("token")
    assert(colStrings(out, "token") == Seq("y"))   // x cut high, z/w cut low
    assert(colLongs(out, "df") == Seq(2L))
    assert(colStrings(out, "posting") == Seq("1,2"))
  }

  test("postings: posting ids are numerically sorted and comma-joined") {
    val out = DataTable(Corpus.postings(docs(
      10L -> "t", 2L -> "t", 1L -> "t"), "text", "doc_id", minDf = 1L))
    assert(colStrings(out, "posting") == Seq("1,2,10"))
  }

  test("postings plan is two-phase: collect_list sits above the df cut") {
    // The vocabulary filter must run on the count-only aggregate and the
    // posting-list aggregate must consume the FILTERED join — a plan with
    // Filter as the root (old single-phase shape) builds every stop-token's
    // full list only to discard it. Structural check (not string offsets,
    // which optimizer-inserted isnotnull Filters can flip): locate the
    // Aggregate that computes collect_list and assert its SUBTREE contains
    // both the pairs⋈vocabulary Join and a Filter on the df bounds.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join}
    val plan = Corpus.postings(docs(1L -> "x y", 2L -> "x"),
      "text", "doc_id", minDf = 1L, maxDf = 1L)
      .queryExecution.optimizedPlan
    val listAgg = plan.collectFirst {
      case a: Aggregate
        if a.aggregateExpressions.exists(_.toString.contains("collect_list")) => a
    }
    assert(listAgg.isDefined, s"no collect_list aggregate in:\n$plan")
    val sub = listAgg.get.child
    assert(sub.collectFirst { case j: Join => j }.isDefined,
      s"posting-list aggregate does not consume a join:\n$plan")
    val dfCut = sub.collect { case f: Filter => f }
      .filter(_.condition.toString.contains("df"))
    assert(dfCut.nonEmpty,
      s"no df-bounds Filter below the posting-list aggregate:\n$plan")
  }

  // ---------------------------------------------------------- lmScore

  test("lmScore matches hand-computed micro-nat surprisal") {
    // counts: a=3 b=2 c=1, total=6
    val out = DataTable(Corpus.lmScore(docs(
      1L -> "a a b", 2L -> "b c", 3L -> "a"), "text", "doc_id"))
      .arrange("doc_id")
    def micro(p: Double): Long = math.round(-math.log(p) * 1e6)
    val a = micro(3.0 / 6); val b = micro(2.0 / 6); val c = micro(1.0 / 6)
    assert(colLongs(out, "n_tokens") == Seq(3L, 2L, 1L))
    assert(colLongs(out, "surprisal_micro") ==
      Seq(2 * a + b, b + c, a))
  }

  test("lmScore head/tail hybrid is route-only: results identical for any headVocab") {
    val d = docs(1L -> "the the the the rare", 2L -> "the word", 3L -> "the")
    def run(k: Int) = DataTable(Corpus.lmScore(d, "text", "doc_id", headVocab = k))
      .arrange("doc_id")
    val full = run(65536)  // everything via broadcast head
    val split = run(1)     // only "the" in head; tail joins relationally
    assert(colLongs(full, "surprisal_micro") == colLongs(split, "surprisal_micro"))
    assert(colLongs(full, "n_tokens") == colLongs(split, "n_tokens"))
  }

  test("lmScore plan: head vocabulary joins by broadcast, never a full shuffle of instances on token") {
    val plan = Corpus.lmScore(docs(1L -> "a b", 2L -> "a"), "text", "doc_id")
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast route for the head vocabulary:\n$plan")
  }

  // ---------------------------------------------------- lmScoreBigram

  test("lmScoreBigram matches hand-computed conditional surprisal") {
    // bigrams: doc1 (a,b)(b,a)(a,c), doc2 (a,b) → c2: (a,b)=2 (b,a)=1
    // (a,c)=1; context totals: a=3, b=1 → p(b|a)=2/3, p(a|b)=1, p(c|a)=1/3
    val out = DataTable(Corpus.lmScoreBigram(docs(
      1L -> "a b a c", 2L -> "a b", 3L -> "x"), "text", "doc_id"))
      .arrange("doc_id")
    def micro(p: Double): Long = math.round(-math.log(p) * 1e6)
    assert(colLongs(out, "n_bigrams") == Seq(3L, 1L, 0L))
    assert(colLongs(out, "surprisal2_micro") == Seq(
      micro(2.0 / 3) + micro(1.0) + micro(1.0 / 3), // doc 1
      micro(2.0 / 3),                               // doc 2
      0L))                                          // doc 3: restore path
  }

  test("lmScoreBigram restores single-token and empty docs as (0, 0)") {
    val out = DataTable(Corpus.lmScoreBigram(docs(
      1L -> "only", 2L -> "", 3L -> "two tokens"), "text", "doc_id"))
      .arrange("doc_id")
    assert(colLongs(out, "n_bigrams") == Seq(0L, 0L, 1L))
    assert(colLongs(out, "surprisal2_micro") == Seq(0L, 0L, 0L))
  }

  test("lmScoreBigram head/tail hybrid is route-only: identical for any headVocab") {
    val d = docs(1L -> "the cat the cat the dog", 2L -> "the cat sat", 3L -> "a")
    def run(k: Int) = DataTable(Corpus.lmScoreBigram(d, "text", "doc_id",
      headVocab = k)).arrange("doc_id")
    val full = run(65536) // every bigram rides the broadcast head
    val split = run(1)    // only the hottest bigram in head; tail relational
    assert(colLongs(full, "surprisal2_micro") == colLongs(split, "surprisal2_micro"))
    assert(colLongs(full, "n_bigrams") == colLongs(split, "n_bigrams"))
  }

  test("lmScoreBigram plan: head bigrams join by broadcast") {
    val plan = Corpus.lmScoreBigram(docs(1L -> "a b c", 2L -> "a b"),
      "text", "doc_id").queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast route for the head bigrams:\n$plan")
  }

  // ------------------------------------------------- winnowCandidates

  test("winnowCandidates finds the pair sharing a long verbatim block") {
    // docs 1 and 2 share a 40-char block (>> k+w-1): several common
    // fingerprints; doc 3 is unrelated
    val block = "the quick brown fox jumps over the lazy dog"
    val out = DataTable(Dedup.winnowCandidates(docs(
      1L -> s"intro text $block closing words",
      2L -> s"different opening $block other ending",
      3L -> "completely unrelated content with nothing shared at all"),
      "text", "doc_id", k = 12, w = 8, bucketCap = 64, minShared = 2L))
      .arrange("id_a", "id_b")
    assert(colLongs(out, "id_a") == Seq(1L))
    assert(colLongs(out, "id_b") == Seq(2L))
    assert(colLongs(out, "n_shared").head >= 2L)
  }

  test("winnowCandidates: bucketCap drops boilerplate fingerprints") {
    // the same block in FOUR docs: with bucketCap=2 every shared
    // fingerprint's bucket has 4 members > cap → no candidate pairs
    // (boilerplate policy), while cap=64 reports all six pairs
    val block = "shared boilerplate sentence repeated in every document"
    val four = docs((1L to 4L).map(i => i -> s"doc $i says $block"): _*)
    val capped = Dedup.winnowCandidates(four, "text", "doc_id",
      k = 12, w = 8, bucketCap = 2, minShared = 1L)
    assert(capped.count() == 0L)
    val open = Dedup.winnowCandidates(four, "text", "doc_id",
      k = 12, w = 8, bucketCap = 64, minShared = 2L)
    assert(open.count() == 6L) // C(4,2)
  }

  test("clusterByWinnow chains pairs into min-id components") {
    // docs 1-2 share block X, docs 2-3 share block Y: no 1-3 pair exists,
    // but the closure puts all three in component 1; doc 4 stays alone
    val x = "alpha beta gamma delta epsilon zeta"
    val y = "one two three four five six seven"
    val out = DataTable(Dedup.clusterByWinnow(docs(
      1L -> s"start $x end",
      2L -> s"$x middle $y",
      3L -> s"intro $y outro",
      4L -> "nothing shared with anyone here at all"),
      "text", "doc_id", k = 12, w = 8, bucketCap = 64, minShared = 2L)
      .select(col("doc_id"), col("cluster_id"))).arrange("doc_id")
    assert(colLongs(out, "cluster_id") == Seq(1L, 1L, 1L, 4L))
  }

  test("winnowIncremental screens new docs against the corpus fingerprint set") {
    val block = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = docs(1L -> s"existing doc with $block inside",
      2L -> "another existing document entirely")
    val fresh = docs(10L -> s"new doc copying $block verbatim",
      11L -> "genuinely new content nothing shared")
    val out = DataTable(Dedup.winnowIncremental(fresh, corpus,
      "text", "doc_id", k = 12, w = 8, minShared = 2L)).arrange("doc_id")
    assert(colLongs(out, "doc_id") == Seq(11L)) // the copier is screened
  }

  test("winnowIncremental equals the prebuilt-store production shape") {
    import org.apache.spark.sql.functions.explode
    import graft.functions.TextFunctions.winnowFingerprints
    val block = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = docs(1L -> s"existing $block doc", 2L -> "other corpus text")
    val fresh = docs(10L -> s"copies $block here", 11L -> "clean new text")
    val inline = Dedup.winnowIncremental(fresh, corpus, "text", "doc_id",
      k = 12, w = 8, minShared = 2L).orderBy("doc_id").collect().map(_.getLong(0))
    val store = corpus.select(
      explode(winnowFingerprints(col("text"), 12, 8)).as("stored_fp"))
    val viaStore = Dedup.winnowIncrementalAgainstFps(fresh, "text", "doc_id",
      store, "stored_fp", k = 12, w = 8, minShared = 2L)
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(inline.toSeq == viaStore.toSeq && inline.toSeq == Seq(11L))
  }

  test("winnowIncrementalTiered: scan-local and relational tiers agree") {
    val block = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = docs(1L -> s"existing $block doc", 2L -> "other corpus text")
    val fresh = docs(10L -> s"copies $block here", 11L -> "clean new text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    val fast = Dedup.winnowIncrementalTiered(fresh, corpus, "text", "doc_id",
      k = 12, w = 8, minShared = 2L) // tiny store → kernel tier
    val relational = Dedup.winnowIncrementalTiered(fresh, corpus, "text", "doc_id",
      k = 12, w = 8, minShared = 2L, maxSetFps = 0) // forced fallback
    assert(ids(fast) == Seq(11L))
    assert(ids(fast) == ids(relational))
    // the fast tier's plan is join-free (pure scan + kernel filter)
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"fast tier must not join:\n$plan")
    // maxSetFps = Int.MaxValue means "never fall back": the probe's
    // cap + 1 limit must saturate, not overflow into a negative limit
    val uncapped = Dedup.winnowIncrementalTiered(fresh, corpus, "text",
      "doc_id", k = 12, w = 8, minShared = 2L, maxSetFps = Int.MaxValue)
    assert(ids(uncapped) == Seq(11L))
  }

  test("winnowIncremental counts against the SET, not per corpus doc") {
    // the new doc shares one fingerprint-bearing block with EACH of two
    // different corpus docs; per-doc pair counting would see two weak
    // pairs, the set rule aggregates them and screens the doc
    val x = "first shared boilerplate block here"
    val y = "second shared boilerplate block there"
    val corpus = docs(1L -> s"docs with $x only", 2L -> s"docs with $y only")
    val fresh = docs(10L -> s"$x and also $y")
    val shared = Dedup.winnowIncremental(fresh, corpus, "text", "doc_id",
      k = 12, w = 8, minShared = 3L)
    assert(shared.count() == 0L, "set-level count must screen the doc")
  }

  test("clusterByPairs: driver union-find tier equals distributed components") {
    val x = "alpha beta gamma delta epsilon zeta"
    val y = "one two three four five six seven"
    val corpus = docs(
      1L -> s"start $x end",
      2L -> s"$x middle $y",
      3L -> s"intro $y outro",
      4L -> "nothing shared with anyone here at all")
    val pairs = Dedup.winnowCandidates(corpus, "text", "doc_id",
      k = 12, w = 8, bucketCap = 64, minShared = 2L)
    def labels(cap: Int) = Dedup.clusterByPairs(corpus, pairs, "doc_id", cap)
      .select("doc_id", "cluster_id").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val driver = labels(1 << 20)   // graph fits: union-find tier
    val dist = labels(0)           // forced distributed components
    assert(driver == dist)
    assert(driver == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("boilerplate: top-gram fraction per doc; short docs get one fallback gram") {
    // trigram "a b c" appears 3x (docs 1,2,3); every other gram once.
    // topB=1 keeps exactly "a b c". Doc 2 has exactly 3 tokens -> one
    // full window; doc 4 is below n and contributes its ONE fallback
    // shingle (the MinHash convention), which is not the top gram.
    val out = Corpus.boilerplate(docs(
      1L -> "a b c x y",   // grams: "a b c","b c x","c x y" -> 1/3 boiler
      2L -> "a b c",       // 1/1
      3L -> "q a b c",     // "q a b","a b c" -> 1/2
      4L -> "z z",         // fallback shingle -> 1 gram, 0 boiler
      5L -> "m n o p"),    // 2 grams, 0 boiler
      "text", "doc_id", n = 3, topB = 1)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 3L, 1L, 333333L), (2L, 1L, 1L, 1000000L), (3L, 2L, 1L, 500000L),
      (4L, 1L, 0L, 0L), (5L, 2L, 0L, 0L)))
  }

  test("compressionRatio: repetition compresses, prose doesn't; stream-safe plan") {
    val rep = ("spam " * 200).trim
    val prose = (1 to 200).map(i => s"w${i * 7919 % 1000}x$i").mkString(" ")
    val out = Corpus.compressionRatio(docs(1L -> rep, 2L -> prose),
      "text", "doc_id").orderBy("doc_id").collect()
    val r1 = out(0).getLong(3); val r2 = out(1).getLong(3)
    assert(r1 < 100000L, s"pure repetition must compress hard, got $r1")
    assert(r2 > 300000L, s"high-entropy text must not, got $r2")
    // deterministic across evaluations (fixed zlib level)
    val again = Corpus.compressionRatio(docs(1L -> rep, 2L -> prose),
      "text", "doc_id").orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq == again.map(_.getLong(2)).toSeq)
    // scan-local: no join, no exchange before the projection
    val plan = Corpus.compressionRatio(
      graft.sources.Tables.df(spark, "/root/testdata/sf0.001", "documents"),
      "text", "doc_id").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
  }

  test("boilerplate broadcasts the top-gram list") {
    val plan = Corpus.boilerplate(docs(1L -> "a b c d"), "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"expected broadcast:\n$plan")
  }

  test("keepBestByPairs keeps the best-scored member, not the smallest id") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("score", LongType)))
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 10L), Row(2L, 99L), Row(3L, 50L), // cluster {1,2,3}: best = 2
        Row(4L, 7L), Row(5L, 7L),                 // cluster {4,5}: tie -> 4
        Row(6L, 1L))), schema)                    // singleton survives
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, 2L), Row(2L, 3L), Row(4L, 5L))),
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    val out = Dedup.keepBestByPairs(rows, pairs, "doc_id", "score")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(out == Seq(2L, 4L, 6L))
  }

  test("keepBestByPairs: null scores lose to any non-null member") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("score", LongType)))
    val rows = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, null), Row(2L, 3L))), schema)
    val pairs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, 2L))),
      StructType(Seq(StructField("id_a", LongType), StructField("id_b", LongType))))
    val out = Dedup.keepBestByPairs(rows, pairs, "doc_id", "score")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L), "desc NULLS LAST: the null-scored doc drops")
  }

  test("clusterByPairs driver tier survives deep chain graphs") {
    // the recursion hazard: a 50k-doc chain (i — i+1) built in DESCENDING
    // edge order produces maximum-depth parent chains; a recursive find
    // overflows the default JVM stack here, the iterative walk must not
    val n = 50000
    val ids = spark.range(n).select(col("id").as("doc_id"))
    val pairs = spark.range(n - 1)
      .select((lit(n - 2) - col("id")).as("id_a"),
        (lit(n - 1) - col("id")).as("id_b"))
    val out = Dedup.clusterByPairs(ids, pairs, "doc_id")
    assert(out.filter(col("cluster_id") =!= 0L).count() == 0L,
      "every chained doc must label to the chain minimum")
  }

  test("winnowCandidates honors minShared") {
    val block = "the quick brown fox jumps over the lazy dog"
    val two = docs(1L -> s"a $block b", 2L -> s"c $block d")
    val n = Dedup.winnowCandidates(two, "text", "doc_id",
      k = 12, w = 8, bucketCap = 64, minShared = 1L)
      .collect()(0).getAs[Long]("n_shared")
    assert(n >= 2L)
    // a threshold above the observed share count must filter the pair out
    assert(Dedup.winnowCandidates(two, "text", "doc_id",
      k = 12, w = 8, bucketCap = 64, minShared = n + 1).count() == 0L)
  }

  // ----------------------------------------------------- dsirWeights

  test("dsirWeights: exact micro-nat scores from first principles; scan-local scoring") {
    import graft.functions.TextFunctions.featureHash
    val target = docs(100L -> "aaa aaa aaa")
    val raw = docs(1L -> "aaa aaa", 2L -> "bbb bbb")
    // bucket of each token via the kernel itself (hash48(token) % 64)
    def bucketOf(tok: String): Int = {
      val v = spark.range(1).select(featureHash(lit(tok), 64).as("v"))
        .collect()(0).getSeq[Long](0)
      v.indexWhere(_ == 1L)
    }
    val (ba, bb) = (bucketOf("aaa"), bucketOf("bbb"))
    assume(ba != bb, "test tokens must hash to distinct buckets")
    // target totals {ba: 3}, raw totals {ba: 2, bb: 2}; add-1 smoothing,
    // the lloyd floor(x*1e6 + 0.5) quantization — exactly the operator's
    // documented formula, derived independently here
    val tTot = 3.0 + 64; val rTot = 4.0 + 64
    def llr(t: Long, r: Long): Long =
      math.floor((math.log((t + 1.0) / tTot) - math.log((r + 1.0) / rTot))
        * 1e6 + 0.5).toLong
    val out = Corpus.dsirWeights(raw, target, "text", "doc_id")
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 2 * llr(3, 2), "target-like doc: 2 tokens in ba")
    assert(got(2L) == 2 * llr(0, 2), "off-target doc: 2 tokens in bb")
    assert(got(1L) > got(2L), "target-like must outscore off-target")
    // scoring is a pure projection: the distributions were collected in
    // the two stats passes, so the RETURNED plan must not shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must be scan-local:\n$plan")
  }

  // ------------------------------------------------------- collocations

  test("collocations: hand-computed PMI, min-count cut, bounded top-K") {
    // "a b a b c": bigram slots (a,b) (b,a) (a,b) (b,c) → N12 = 4;
    // unigrams a:2 b:2 c:1 → N1 = 5. minCount=2 keeps only (a,b) n=2:
    // pmi = ln((2/4) / ((2/5)·(2/5)))
    val out = Corpus.collocations(docs(1L -> "a b a b c"), "text",
      minCount = 2L, topK = 10).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getAs[Long]("n") == 2L)
    val exp = math.floor(math.log((2.0 / 4.0) / ((2.0 / 5.0) * (2.0 / 5.0)))
      * 1e6 + 0.5).toLong
    assert(r.getAs[Long]("pmi_micro") == exp)
  }

  test("collocations: topK truncates deterministically on the (pmi, w1, w2) order") {
    // four disjoint repeated pairs, identical structure → identical PMI;
    // topK=2 must keep the lexicographically first two
    val out = Corpus.collocations(
      docs(1L -> "p q", 2L -> "p q", 3L -> "x y", 4L -> "x y",
           5L -> "m n", 6L -> "m n", 7L -> "d e", 8L -> "d e"),
      "text", minCount = 2L, topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(("d", "e"), ("m", "n")), s"got ${out.toSeq}")
  }

  // ------------------------------------------------------- domainKl

  test("domainKl: exact integer numerator from first principles; null domain kept") {
    import graft.functions.TextFunctions.featureHash
    def bucketOf(tok: String): Int = {
      val v = spark.range(1).select(featureHash(lit(tok), 64).as("v"))
        .collect()(0).getSeq[Long](0)
      v.indexWhere(_ == 1L)
    }
    val (ba, bb) = (bucketOf("aaa"), bucketOf("bbb"))
    assume(ba != bb, "test tokens must hash to distinct buckets")
    val df = toDf(spark)(
      "text" -> Seq("aaa aaa", "bbb", "aaa"),
      "source" -> Seq("A", "B", null)).df
    // domain counts: A {ba:2} n=2; B {bb:1} n=1; null {ba:1} n=1.
    // corpus: {ba:3, bb:1}, N=4. Independent derivation of the
    // documented formula:
    def qln(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    def term(c: Long, n: Long, cb: Long): Long =
      (c + 1) * (qln((c + 1.0) / (n + 64.0)) - qln((cb + 1.0) / (4 + 64.0)))
    def expect(counts: Map[Int, Long], n: Long): Long =
      (0 until 64).map { b =>
        val cb = (if (b == ba) 3L else 0L) + (if (b == bb) 1L else 0L)
        term(counts.getOrElse(b, 0L), n, cb)
      }.sum
    val got = Corpus.domainKl(df, "text", "source")
      .collect().map(r => Option(r.getString(0)) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == Set(Some("A"), Some("B"), None))
    assert(got(Some("A"))._1 == 2L && got(Some("B"))._1 == 1L)
    assert(got(Some("A"))._2 == expect(Map(ba -> 2L), 2L))
    assert(got(Some("B"))._2 == expect(Map(bb -> 1L), 1L))
    // the null-safe dense join: the null domain's own counts attach
    assert(got(None)._1 == 1L)
    assert(got(None)._2 == expect(Map(ba -> 1L), 1L))
    // kl_micro is exactly the one division of the exact integers
    assert(got(Some("A"))._3 == expect(Map(ba -> 2L), 2L).toDouble / 66.0)
  }

  // ------------------------------------------------------- repetitionRules

  test("repetitionRules: distinct-word text passes every rule") {
    val out = Corpus.repetitionRules(
      docs(1L -> (0 until 60).map(i => s"w$i").mkString(" ")),
      "text", "doc_id").collect()(0)
    assert(out.getAs[Boolean]("repetition_pass"))
    assert(out.getAs[Long]("n_dup_lines") == 0L)
    assert(out.getAs[Long]("dup_5gram_chars") == 0L)
  }

  test("repetitionRules: duplicate lines and hot n-grams trip their rules") {
    val lineDup = Corpus.repetitionRules(
      docs(1L -> "dup line\ndup line\ndup line\nunique tail"),
      "text", "doc_id").collect()(0)
    // 2 of 4 lines are repeat occurrences (> 30%), and their chars
    // dominate (> 20%)
    assert(!lineDup.getAs[Boolean]("r_dup_line"))
    assert(!lineDup.getAs[Boolean]("r_dup_line_char"))
    assert(!lineDup.getAs[Boolean]("repetition_pass"))

    val hot = Corpus.repetitionRules(
      docs(1L -> ("ab cd " * 30).trim), "text", "doc_id").collect()(0)
    // "ab cd" covers 30·5 of ~179 chars (> 20%) — and the dup-gram
    // family trips too (every 5..10-gram repeats)
    assert(!hot.getAs[Boolean]("r_top_2gram"))
    assert(!hot.getAs[Boolean]("r_dup_5gram"))
    assert(!hot.getAs[Boolean]("repetition_pass"))
    assert(hot.getAs[Long]("top_2gram_chars") == 150L)
  }

  test("repetitionRules kernel equals the interpreted fold spelling") {
    // tricky shapes: empty text, duplicate empty lines, unicode incl.
    // non-BMP (code-point length, not UTF-16 units), heavy repetition,
    // whitespace runs, single token
    val tricky = docs(
      1L -> "",
      2L -> "\n\n",
      3L -> "café 😀 café 😀 café",
      4L -> ("ab cd " * 30).trim,
      5L -> "  tabs\tand \n spaced   out \n lines here  ",
      6L -> "word",
      7L -> "dup line\ndup line\nuniq")
    val real = graft.sources.Tables.df(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
    Seq(tricky, real).foreach { df =>
      val viaKernel = Corpus.repetitionRules(df, "text", "doc_id")
        .orderBy("doc_id").collect().toSeq
      val viaHof = Corpus.repetitionRulesHof(df, "text", "doc_id")
        .orderBy("doc_id").collect().toSeq
      assert(viaKernel == viaHof)
    }
  }

  test("repetitionRules: scan-local plan (no Exchange)") {
    val plan = Corpus.repetitionRules(
      docs(1L -> "some plain text"), "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gate must be scan-local:\n$plan")
  }

  // ------------------------------------------------------- c4Clean

  test("c4Clean: line rules — terminal punct, min words, boilerplate") {
    val out = Corpus.c4Clean(docs(
      1L -> List(
        "This line has enough words and ends well.",   // kept
        "Too short.",                                  // < 5 words
        "this line has five words but no terminal punctuation", // no punct
        "Please enable javascript to view this page.", // boilerplate
        "Quoted lines are fine when they end like \"this.\"" // kept (quote)
      ).mkString("\n")), "text", "doc_id").collect()(0)
    assert(out.getAs[String]("clean_text") ==
      "This line has enough words and ends well.\n" +
        "Quoted lines are fine when they end like \"this.\"")
    assert(out.getAs[Long]("n_kept") == 2L)
    assert(out.getAs[Long]("n_dropped") == 3L)
  }

  test("c4Clean: doc flags — lorem ipsum, braces, sentence minimum") {
    val goodBody = List(
      "The first sentence of this page ends properly.",
      "The second sentence of this page also ends.",
      "The third sentence of this page ends too.").mkString("\n")
    def keepOf(text: String): Boolean =
      Corpus.c4Clean(docs(1L -> text), "text", "doc_id")
        .collect()(0).getAs[Boolean]("c4_keep")
    assert(keepOf(goodBody))
    assert(!keepOf(goodBody + "\nSome Lorem Ipsum filler text appears here."))
    assert(!keepOf(goodBody + "\nfunction() { return 1; }"))
    // fewer than 3 sentence marks in the CLEANED text
    assert(!keepOf("Only one kept sentence survives the line rules here."))
  }

  test("c4Clean: scan-local plan (no Exchange)") {
    val out = Corpus.c4Clean(docs(1L -> "A fine sentence stays right here."),
      "text", "doc_id")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"cleaning must be scan-local:\n$plan")
  }

  // ------------------------------------------------------- gopherRules

  // a doc that passes every Gopher rule: 50+ plain English words with
  // stopword coverage, no symbols, no bullets
  private val cleanDoc: String =
    (("the quick brown fox jumps over and rests with " * 6) +
      "that dogs have been known to be wary of it").trim

  test("gopherRules: a clean document passes every rule") {
    val out = Corpus.gopherRules(docs(1L -> cleanDoc), "text", "doc_id")
      .collect()(0)
    val flags = Seq("r_word_count", "r_word_len", "r_symbol", "r_bullet",
      "r_ellipsis", "r_alpha", "r_stopwords", "gopher_pass")
    flags.foreach { f =>
      assert(out.getAs[Boolean](f), s"$f must pass for the clean doc")
    }
  }

  test("gopherRules: each rule trips on its own violation") {
    def flagsOf(text: String): Map[String, Boolean] = {
      val r = Corpus.gopherRules(docs(1L -> text), "text", "doc_id",
        minWords = 5L).collect()(0)
      Seq("r_word_count", "r_word_len", "r_symbol", "r_bullet",
        "r_ellipsis", "r_alpha", "r_stopwords", "gopher_pass")
        .map(f => f -> r.getAs[Boolean](f)).toMap
    }
    // too short (minWords = 5 to keep the other fixtures small)
    assert(!flagsOf("the cat")("r_word_count"))
    // mean word length > 10 chars
    val long = flagsOf("extraordinarily incomprehensibilities " * 4)
    assert(!long("r_word_len") && !long("gopher_pass"))
    // symbol soup: ≥1 symbol per 10 words ('#' and both ellipsis forms)
    assert(!flagsOf("the cat sat on # mat with … and that ...")("r_symbol"))
    // 10 of 11 lines bullet-started (> 0.9 trips; exactly 0.9 passes —
    // the paper's strict-removal boundary, pinned below)
    assert(!flagsOf(
      (("- the cat and that\n" * 10) + "of dogs with fleas"))("r_bullet"))
    // 1 of 2 lines ellipsis-ended (> 0.3)
    assert(!flagsOf(
      "the cat sat down...\nand that dog have fleas with it")("r_ellipsis"))
    // numeric soup: alphabetic-word fraction ≤ 0.8
    assert(!flagsOf("the cat 1 2 3 4 5 and that 9")("r_alpha"))
    // only one of the eight required stopwords present
    assert(!flagsOf("cats eat the fresh fish daily")("r_stopwords"))
  }

  test("gopherRules: boundary-exact documents pass (strict-removal rule)") {
    def flags(text: String): org.apache.spark.sql.Row =
      Corpus.gopherRules(docs(1L -> text), "text", "doc_id",
        minWords = 1L).collect()(0)
    // exactly 1 symbol per 10 words — ratio 0.1, NOT removed
    assert(flags("w1 w2 w3 w4 w5 w6 w7 w8 w9 #").getAs[Boolean]("r_symbol"))
    // exactly 9 of 10 bullet lines — ratio 0.9, NOT removed
    assert(flags(("- a b\n" * 9) + "c d").getAs[Boolean]("r_bullet"))
    // exactly 3 of 10 ellipsis-ended lines — ratio 0.3, NOT removed
    assert(flags(("x y...\n" * 3) + ("a b\n" * 6) + "c d")
      .getAs[Boolean]("r_ellipsis"))
    // exactly 4 of 5 alphabetic words — ratio 0.8, NOT removed
    assert(flags("ab cd ef gh 42").getAs[Boolean]("r_alpha"))
  }

  test("gopherRules and c4Clean: \\z blocks line-terminator anchor fakes") {
    // Java's default-mode $ also matches BEFORE a final line terminator
    // (\r from CRLF splits, U+2028), RE2's only at end of string; both
    // rules anchor with \z, so terminator-bearing lines behave the same
    // in both engines. rtrim strips only spaces — the \r stays.
    // c4Clean splits on \r?\n (ADVICE r15): the CRLF line's \r is
    // consumed by the split, so a Windows-newline page keeps its
    // terminal-punctuation lines — the reference C4 recipe. A bare
    // trailing \r with NO \n is not a line break: it stays on the line,
    // rtrim (spaces only) keeps it, and the \z anchor drops that line
    // in BOTH engines (the parity this test pins).
    val crlf = "This sentence would end fine.\r\nAnd that one would too.\r"
    val c4 = Corpus.c4Clean(docs(1L -> crlf), "text", "doc_id").collect()(0)
    assert(c4.getAs[Long]("n_kept") == 1L,
      "CRLF line survives; the bare-\\r line drops")
    // 1 of 2 lines ends "…" + U+2028: Java \s does not consume U+2028,
    // so with \z the line is NOT ellipsis-counted (with $, it would be
    // → 0.5 > 0.3 would trip the rule)
    val ls = "the first plain line of it\nthe second then ends…\u2028"
    val g = Corpus.gopherRules(docs(1L -> ls), "text", "doc_id",
      minWords = 1L).collect()(0)
    assert(g.getAs[Boolean]("r_ellipsis"))
    // a trailing \r after the dots IS \s-consumed — counted in BOTH
    // engines alike (1 of 1 line → trips)
    val cr = Corpus.gopherRules(docs(1L -> "it just ends...\r"), "text",
      "doc_id", minWords = 1L).collect()(0)
    assert(!cr.getAs[Boolean]("r_ellipsis"))
  }

  test("gopherRules: scan-local plan (no Exchange)") {
    val out = Corpus.gopherRules(docs(1L -> cleanDoc), "text", "doc_id")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gate must be scan-local:\n$plan")
  }

  test("dsirWeights: null text scores 0, never null (oracle LEFT JOIN parity)") {
    // target is aaa-heavier than raw, so the on-target doc's llr is
    // strictly positive (equal distributions would put it at exactly 0)
    val target = docs(100L -> "aaa aaa aaa")
    val raw = toDf(spark)("doc_id" -> Seq(1L, 2L),
      "text" -> Seq("aaa", null)).df
    val got = Corpus.dsirWeights(raw, target, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.get(1)).toMap
    // featureHash(null) is null — unguarded, doc 2 would emit null and a
    // downstream quantileGate would silently drop it; the operator must
    // instead score it 0 like the DuckDB oracle's COALESCE(SUM, 0)
    assert(got(2L) == 0L, s"null-text doc must score 0, got ${got(2L)}")
    assert(got(1L).asInstanceOf[Long] > 0L, "on-target doc outscores")
  }

  // --------------------------------------------- quality classifier

  test("qualityClassifierScore: all-ones weights recover the token count") {
    // every token lands in SOME bucket, so a uniform unit weight vector
    // scores qc_micro = n_tokens + bias — a bucket-independent identity
    // that checks the whole count-vector dot product by hand
    val d = docs(1L -> "a b c d e", 2L -> "x", 3L -> "")
    val out = Corpus.qualityClassifierScore(
        d, "text", "doc_id", Seq.fill(64)(1L), 10L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 5L + 10L)
    assert(out(2L) == 1L + 10L)
    // "" tokenizes to one empty token (the dsir convention, both engines)
    assert(out(3L) == 1L + 10L)
  }

  test("qualityClassifierScore: targeted bucket weight and null text") {
    import graft.functions.TextFunctions.featureHash
    val bucket = spark.range(1)
      .select(featureHash(lit("spark"), 64).as("v"))
      .collect()(0).getSeq[Long](0).indexWhere(_ == 1L)
    val w = Seq.tabulate(64)(j => if (j == bucket) 1000L else 0L)
    val d = docs(1L -> "spark spark plain", 2L -> "plain only")
      .union(docs(3L -> "x").withColumn("text",
        when(col("doc_id") === 3L, lit(null: String))))
    val out = Corpus.qualityClassifierScore(d, "text", "doc_id", w, -500L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    // "plain"/"only" may collide into the spark bucket — recompute the
    // expected counts through the kernel rather than assuming zero
    def cnt(text: String): Long = spark.range(1)
      .select(featureHash(lit(text), 64).as("v"))
      .collect()(0).getSeq[Long](0)(bucket)
    assert(out(1L) == (cnt("spark spark plain") * 1000L - 500L,
      cnt("spark spark plain") * 1000L - 500L > 0L))
    assert(out(2L) == (cnt("plain only") * 1000L - 500L,
      cnt("plain only") * 1000L - 500L > 0L))
    // null text scores the bare bias (the oracle's LEFT JOIN replay)
    assert(out(3L) == (-500L, false))
  }

  test("qualityClassifierScore: scan-local plan (no Exchange)") {
    val plan = Corpus.qualityClassifierScore(
        docs(1L -> "a"), "text", "doc_id",
        QueriesCorpus.QcWeights, QueriesCorpus.QcBias)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scoring must be scan-local:\n$plan")
  }

  test("trainQualityClassifier is deterministic across runs") {
    val d = docs(
      1L -> "a b c d e f g h", 2L -> "a b", 3L -> "c d e f",
      4L -> "g h a b c", 5L -> "x y z", 6L -> "x")
    def run() = Corpus.trainQualityClassifier(
      d.filter(col("doc_id") <= 3), d.filter(col("doc_id") > 3),
      "text", epochs = 3, lr = 1.0)
    assert(run() == run())
  }

  test("pinned quality-classifier model equals fresh training on the fixture") {
    // the ledger's pinned weights ARE the trained model: re-derive them
    // from the sf0.001 corpus with the pinned config. The distillation
    // label is the Gopher min-word-count gate (>= 50 tokens), exactly
    // linearly separable in hashed count space (n_tokens = sum of the
    // count vector), and training converges to accuracy 1.0 on it —
    // if a driver testdata refresh shifts the corpus, this fails loudly
    // instead of letting the ledger drift from its provenance.
    import graft.functions.TextFunctions.tokens
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val labeled = d.withColumn("__q", size(tokens(col("text"))) >= 50)
    val (w, b) = Corpus.trainQualityClassifier(
      labeled.filter(col("__q")), labeled.filter(!col("__q")),
      "text", epochs = QueriesCorpus.QcEpochs, lr = QueriesCorpus.QcLr)
    assert(w == QueriesCorpus.QcWeights, "pinned weights drifted")
    assert(b == QueriesCorpus.QcBias, "pinned bias drifted")
    // the trained gate fully distills the (separable) rule
    val scored = Corpus.qualityClassifierScore(d, "text", "doc_id", w, b)
      .join(labeled.select(col("doc_id"), col("__q")), Seq("doc_id"))
    assert(scored.filter(col("qc_keep") =!= col("__q")).count() == 0L,
      "trained gate must reach train accuracy 1.0 on the separable label")
  }

  // ----------------------------------------------------------- BPE

  test("bpeApplyMerge: whole-symbol, non-overlapping, boundary-safe") {
    def apply1(seq: String, pair: String): String =
      spark.range(1).select(Corpus.bpeApplyMerge(lit(seq), pair).as("s"))
        .collect()(0).getString(0)
    // consecutive occurrences both merge (exclusive-space trick)
    assert(apply1("a b a b", "a b") == "ab ab")
    // a pair must match whole symbols, never a symbol suffix/prefix
    assert(apply1("xa b", "a b") == "xa b")
    assert(apply1("a bx", "a b") == "a bx")
    // overlapping run merges greedily left-to-right (BPE application)
    assert(apply1("a a a", "a a") == "aa a")
    assert(apply1("c a b d", "a b") == "c ab d")
  }

  test("bpeTrain learns the hand-computed merge sequence and stops early") {
    // hist: "ab"x2, "ac"x1. Round 1 pairs: (a b):2, (b </w>):2,
    // (a c):1, (c </w>):1 — tie broken pair-ASC → "a b". Then
    // "ab </w>":2, then "a c":1 ('a c' < 'c </w>'), then "ac </w>":1,
    // then NO pairs remain → early stop at 4 of 8 requested.
    val d = docs(1L -> "ab ab ac")
    val (vocab, merges) = Corpus.bpeTrain(d, "text", merges = 8)
    assert(merges == Seq("a b" -> 2L, "ab </w>" -> 2L,
      "a c" -> 1L, "ac </w>" -> 1L))
    val seqs = vocab.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(seqs == Map("ab" -> "ab</w>", "ac" -> "ac</w>"))
    // tokenize via the trained lookup: every word is one piece now
    val counts = Corpus.bpeTokenCounts(d, "text", "doc_id", vocab)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 3L))
  }

  test("bpeTrain is deterministic and weights pairs by word frequency") {
    val d = docs(1L -> "aa bb", 2L -> "aa aa bb", 3L -> null)
    def run() = Corpus.bpeTrain(d, "text", merges = 3)._2
    val m = run()
    assert(m == run())
    // "aa" x3 gives both (a a) and (a </w>) count 3 — the ASC
    // tiebreak picks "a </w>" ('<' 0x3C sorts before 'a' 0x61),
    // and the count weights by word frequency (3, not 2)
    assert(m.head == ("a </w>" -> 3L))
  }

  test("bpeTokenCounts: broadcast lookup plan; null text restores as 0") {
    val d = docs(1L -> "ab ab", 2L -> null)
    val (vocab, _) = Corpus.bpeTrain(d, "text", merges = 2)
    val out = Corpus.bpeTokenCounts(d, "text", "doc_id", vocab)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"vocab lookup must broadcast, not shuffle the instances:\n$plan")
    val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) == 0L)
    assert(got(1L) >= 2L)
  }

  test("tfidfTopTerms: hand-computed scores, smoothed idf, term tie-break") {
    val docs = toDf(spark)(
      "doc_id" -> Seq(1, 2, 3),
      "text" -> Seq(
        "apple banana apple",
        "banana cherry",
        "cherry cherry cherry durian")).df
    val out = graft.operators.Bm25.tfidfTopTerms(docs, "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    def micro(tf: Long, df: Long): Long =
      Math.round((tf * (Math.log((3 + 1.0) / (df + 1.0)) + 1.0)) * 1e6)
    // doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    assert(out.filter(_._1 == 1L).toSeq == Seq(
      (1L, "apple", 2L, micro(2, 1), 1L),
      (1L, "banana", 1L, micro(1, 2), 2L)))
    // doc 2: banana and cherry tie exactly (tf=1, df=2) -> term ASC
    assert(out.filter(_._1 == 2L).map(t => (t._2, t._5)).toSeq ==
      Seq(("banana", 1L), ("cherry", 2L)))
    // doc 3: cherry tf=3 dominates durian tf=1 df=1
    assert(out.filter(_._1 == 3L).map(_._2).toSeq == Seq("cherry", "durian"))
  }

  test("tfidfTopTerms plan: rank filter prunes map-side (WindowGroupLimit)") {
    val docs = toDf(spark)(
      "doc_id" -> Seq(1, 2), "text" -> Seq("a b c", "b c d")).df
    val plan = graft.operators.Bm25.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no map-side prune:\n$plan")
  }
}
