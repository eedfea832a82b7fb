package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.api.toDf

/** Property-based verb laws (ScalaCheck upgrade flagged in SURVEY §5):
  * relational invariants that must hold for ANY input frame, not just
  * golden fixtures. Small generated frames — the laws are engine
  * semantics, not scale tests. (Raw ScalaCheck generators with a
  * deterministic seed walk; the scalatest bridge artifact isn't in the
  * offline dependency cache.)
  */
class PropertySuite extends SparkSpec {

  /** Deterministic mini-forAll: n samples from gen, fixed seed chain. */
  private def forAll[A](gen: Gen[A], n: Int = 10)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(produced == n, s"generator exhausted after $attempts attempts")
  }

  private def forAll2[A](gen: Gen[A], n: Int = 6)(f: (A, A) => Unit): Unit =
    forAll(Gen.zip(gen, gen), n) { case (a, b) => f(a, b) }

  private val genRows: Gen[(List[Long], List[String])] = for {
    n <- Gen.choose(1, 12)
    xs <- Gen.listOfN(n, Gen.choose(-20L, 20L))
    gs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
  } yield (xs, gs)

  test("filter(p) and filter(!p) partition the rows") {
    forAll(genRows) { case (xs, gs) =>
      val df = toDf(spark)("x" -> xs, "g" -> gs)
      val p = col("x") >= 0
      val nKeep = df.filter(p).df.count()
      val nDrop = df.filter(!p).df.count()
      assert(nKeep + nDrop == xs.length.toLong)
    }
  }

  test("arrange is a permutation and is idempotent") {
    forAll(genRows) { case (xs, gs) =>
      val df = toDf(spark)("x" -> xs, "g" -> gs)
      val once = colLongs(df.arrange("x", "g"), "x")
      val twice = colLongs(df.arrange("x", "g").arrange("x", "g"), "x")
      assert(once.sorted == xs.sorted)
      assert(once == twice)
    }
  }

  test("gather then spread is the identity on tidy frames") {
    forAll(genRows) { case (xs, _) =>
      // unique id per row, two measure columns
      val df = toDf(spark)(
        "id" -> xs.indices.toList,
        "m1" -> xs,
        "m2" -> xs.map(_ * 2))
      val rt = df.gather(Seq("m1", "m2"), "k", "v")
        .spread("k", "v", values = Seq("m1", "m2"))
        .arrange("id")
      assert(colLongs(rt, "m1") == xs.map(_.toLong))
      assert(colLongs(rt, "m2") == xs.map(_ * 2L))
    }
  }

  test("summarize(sum) equals driver-side sum per group") {
    forAll(genRows) { case (xs, gs) =>
      val df = toDf(spark)("x" -> xs, "g" -> gs)
      val got = df.groupBy("g").summarize("s" -> sum(col("x")))
      val want = gs.zip(xs).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toMap
      val gotMap = colStrings(got, "g").zip(colLongs(got, "s")).toMap
      assert(gotMap == want)
    }
  }

  test("unique row count equals distinct tuple count; setDiff with self is empty") {
    forAll(genRows) { case (xs, gs) =>
      val df = toDf(spark)("x" -> xs, "g" -> gs)
      assert(df.unique().df.count() == xs.zip(gs).distinct.length.toLong)
      assert(df.setDiff(df).df.count() == 0L)
    }
  }

  test("bind_rows row count adds; innerJoin on disjoint keys is empty") {
    forAll2(genRows) { case ((xs1, gs1), (xs2, gs2)) =>
      val a = toDf(spark)("x" -> xs1, "g" -> gs1)
      val b = toDf(spark)("x" -> xs2, "g" -> gs2)
      assert(a.bindRows(b).df.count() == (xs1.length + xs2.length).toLong)
      val bShifted = toDf(spark)("x" -> xs2.map(_ + 1000L), "g" -> gs2)
      assert(a.innerJoin(bShifted, by = Seq("x"), merge = graft.api.CcDrop)
        .df.count() == 0L)
    }
  }

  test("splitAssign partitions any id set for any normalized weights") {
    val genSplit = for {
      n <- Gen.choose(1, 30)
      ids <- Gen.listOfN(n, Gen.choose(0L, 10000L))
      w1 <- Gen.choose(1, 8)
      w2 <- Gen.choose(1, 8)
    } yield (ids.distinct, w1 / 10.0, w2 / 10.0)
    forAll(genSplit) { case (ids, w1, w2) =>
      if (w1 + w2 < 1.0 && ids.nonEmpty) {
        val df = toDf(spark)("id" -> ids).df
        val out = graft.operators.Sampling.splitAssign(df, "id",
          Seq("a" -> w1, "b" -> w2, "c" -> (1.0 - w1 - w2)))
        val got = out.collect().map(r => (r.getLong(0), r.getString(1)))
        assert(got.length == ids.length)               // total
        assert(got.forall(r => Set("a", "b", "c")(r._2))) // exhaustive
        // deterministic: same id always lands in the same split
        val again = graft.operators.Sampling.splitAssign(df, "id",
          Seq("a" -> w1, "b" -> w2, "c" -> (1.0 - w1 - w2)))
          .collect().map(r => (r.getLong(0), r.getString(1)))
        assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
      }
    }
  }

  test("sampling cuts hit the rational millionth for EVERY fraction n/1e6") {
    // guards the advertised 1e-6 rate resolution: cutFor(n/1e6) must be
    // exactly n for all million cuts (floor was off by one for ~11.5k of
    // them — rint holds as long as Mod stays well under 2^26)
    var n = 0L
    while (n <= 1000000L) {
      val cut = graft.operators.Sampling.cutFor(n.toDouble / 1000000.0)
      assert(cut == n, s"cutFor($n/1e6) = $cut")
      n += 1
    }
    // prefix-sum path (splitAssign cumsums before cutting): the ~1e-16
    // cumsum error must stay far below the half-ulp rint absorbs
    val ws = Seq(0.124997, 0.2, 0.3, 0.000001)
    val cuts = ws.scanLeft(0.0)(_ + _).tail.map(graft.operators.Sampling.cutFor)
    assert(cuts == Seq(124997L, 324997L, 624997L, 624998L))
  }

  test("withRollingRange frame membership equals brute force at exact boundaries and ties") {
    // Order values on a lattice of step 5 with preceding=10, so two
    // hazards are the COMMON case: order-value ties (peer rows must all
    // join the frame) and rows landing exactly at orderValue - preceding
    // (the closed lower edge — a half-open frame, or DuckDB disagreeing
    // on RANGE edge inclusion, flips these rows). Brute force is the
    // closed-interval fold over all rows.
    val genTV: Gen[(List[Long], List[Long])] = for {
      n <- Gen.choose(1, 14)
      ts <- Gen.listOfN(n, Gen.choose(0L, 8L).map(_ * 5L))
      vs <- Gen.listOfN(n, Gen.choose(-9L, 9L))
    } yield (ts, vs)
    forAll(genTV, n = 12) { case (ts, vs) =>
      val df = toDf(spark)("t" -> ts, "v" -> vs)
      val r = df.withRollingRange("s", sum(col("v")), col("t"), 10L)
      val rows = ts.zip(vs)
      val want = rows.map { case (t, v) =>
        (t, v, rows.collect { case (t2, v2) if t2 >= t - 10L && t2 <= t => v2 }.sum)
      }.sorted
      // (t, v) duplicates get identical frames, so sorting the full
      // triple makes the comparison deterministic under any tie order
      val got = r.df.select("t", "v", "s").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toList.sorted
      assert(got == want, s"ts=$ts vs=$vs")
    }
  }

  test("weightedHashSample cut at exact .5 boundaries: HALF_UP, engine-agreeing (Sampling.scala:80)") {
    // The per-row cut is round(clamp(weight)*1e6, 0). At weight = n/2e6
    // with odd n the product is exactly x.5 (x.5 is dyadic — exactly
    // representable), so the rounding MODE decides membership. Spark's
    // `round` is HALF_UP; DuckDB's `round` on DOUBLE is half-away-from-
    // zero — identical on the clamped non-negative domain. Off the exact
    // boundary both engines evaluate the SAME IEEE double with the same
    // formula, so the deciding input is structurally identical and the
    // mode never disagrees: parity is by construction, pinned here
    // against the decimal HALF_UP definition for the boundary sweep and
    // its nextUp/nextDown neighborhoods.
    import java.math.{BigDecimal => JBig, RoundingMode}
    val odd = (1L to 99L by 2) ++ Seq(999999L, 1199999L, 1999999L)
    val weights = odd.flatMap { n =>
      val w = n.toDouble / 2000000.0
      Seq(w, Math.nextUp(w), Math.nextDown(w))
    } ++ Seq(0.0, 1.0, -0.25, 1.75) // clamp edges
    val wdf = toDf(spark)(
      "id" -> weights.indices.map(_.toLong),
      "w" -> weights).df
    val got = wdf.select(col("id"),
      round(least(lit(1.0), greatest(lit(0.0), col("w"))) * lit(1000000.0), 0)
        .cast("long").as("cut"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    weights.zipWithIndex.foreach { case (w, i) =>
      val x = math.min(1.0, math.max(0.0, w)) * 1000000.0
      val want = new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()
      assert(got(i.toLong) == want, s"w=$w x=$x: got ${got(i.toLong)}, want $want")
    }
    // exact boundary spot-check: 3.5 → 4 (HALF_UP), one ulp below → 3
    val b = 7.0 / 2000000.0
    assert(got(weights.indexOf(b).toLong) == 4L)
    assert(got(weights.indexOf(Math.nextDown(b)).toLong) == 3L)
    // the oracle must keep replaying the exact same formula text — if
    // this drifts, q_weighted_sample's hash match is luck, not design
    assert(Queries.oracles("q_weighted_sample")
      .contains("round(least(1.0, greatest(0.0, n_chars / 2000.0)) * 1000000, 0)"))
  }

  test("zorder key equals the driver replica for random domains and values") {
    import graft.operators.Layout
    val gen = for {
      lo <- Gen.choose(-1000000L, 1000000L)
      width <- Gen.choose(1L, 1000000L)
      bits <- Gen.choose(2, 12)
      n <- Gen.choose(1, 12)
      vs <- Gen.listOfN(n, Gen.choose(0L, width))
      ws <- Gen.listOfN(n, Gen.choose(0L, width))
    } yield (lo, lo + width, bits, vs.map(_ + lo), ws.map(_ + lo))
    forAll(gen, n = 8) { case (lo, hi, bits, xs, ys) =>
      val df = toDf(spark)("x" -> xs, "y" -> ys).df
      val key = Layout.zorderKey(Seq(
        Layout.quantize(col("x"), lo, hi, bits),
        Layout.quantize(col("y"), lo, hi, bits)), bits)
      val got = df.select(col("x"), col("y"), key.as("z")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def q(v: Long) = (v - lo) * (1L << bits) / (hi - lo + 1)
      val want = xs.zip(ys).map { case (x, y) =>
        val (qx, qy) = (q(x), q(y))
        val z = (0 until bits).map { j =>
          (((qx >> j) & 1L) << (j * 2)) | (((qy >> j) & 1L) << (j * 2 + 1))
        }.foldLeft(0L)(_ | _)
        (x, y, z)
      }.toSet
      assert(got == want, s"domain [$lo,$hi] bits=$bits")
    }
  }

  test("ungrouped whole-column lift equals driver-side arithmetic") {
    // the broadcast-lift rewrite (mutate/filter of x - mean(x) etc.) must
    // agree with computing the scalar on the driver, for any frame
    forAll(genRows) { case (xs, gs) =>
      val df = toDf(spark)("x" -> xs, "g" -> gs)
      val mean = xs.sum.toDouble / xs.length
      val got = colDoubles(df.mutate("d" -> (col("x") - avg(col("x")))).arrange("x", "g", "d"), "d")
      val want = xs.map(_ - mean).sorted // d sorts like x within (x,g) ties collapsing to same d
      assert(got.sorted == want)
      val kept = df.filter(col("x") >= max(col("x"))).df.count()
      assert(kept == xs.count(_ == xs.max).toLong)
    }
  }

  test("connectedComponents equals driver-side union-find on random graphs") {
    val genEdges = for {
      n <- Gen.choose(1, 12)
      as <- Gen.listOfN(n, Gen.choose(0L, 15L))
      bs <- Gen.listOfN(n, Gen.choose(0L, 15L))
    } yield as.zip(bs).filter { case (a, b) => a != b }
    forAll(genEdges, n = 6) { edges =>
      if (edges.nonEmpty) {
        // driver oracle: union-find with min-label roots
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(x => x -> find(x)).toMap
        val pairs = toDf(spark)(
          "id_a" -> edges.map(_._1), "id_b" -> edges.map(_._2)).df
        val got = graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"edges=$edges")
      }
    }
  }

  test("chunkDocuments at stride == chunkTokens reconstructs the token stream") {
    val genDoc = for {
      n <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
    } yield toks
    forAll(genDoc) { toks =>
      val df = toDf(spark)("id" -> Seq(1), "t" -> Seq(toks.mkString(" "))).df
      val chunks = graft.operators.Pack
        .chunkDocuments(df, "id", "t", chunkTokens = 7, stride = 7)
        .orderBy("chunk_id").collect().map(_.getAs[String]("chunk_text"))
      assert(chunks.mkString(" ") == toks.mkString(" "))
    }
  }

  test("WinnowText kernel equals the HOF stages for random unicode text") {
    // the kernel re-implements normalize → code-point k-grams → md5 →
    // window minima natively; any divergence (code-point vs UTF-16
    // slicing, trim/lower/collapse order, window clamping) must surface
    // under adversarial strings: mixed ASCII / 2-byte / astral chars,
    // exotic whitespace, k/w larger than the text
    import graft.functions.TextFunctions._
    val genText = for {
      n <- Gen.choose(0, 30)
      cs <- Gen.listOfN(n, Gen.oneOf(
        Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("\t"),
        Gen.const("\n"), Gen.const("é"), Gen.const("ß"), Gen.const("中"),
        Gen.const("😀"), Gen.const("𝕏")))
      k <- Gen.choose(2, 7)
      w <- Gen.choose(2, 6)
    } yield (cs.mkString, k, w)
    forAll(genText, n = 15) { case (text, k, w) =>
      val df = toDf(spark)("id" -> Seq(1L), "t" -> Seq(text)).df
      val hof = df.select(normalizeText(col("t")).as("n"))
        .select(gramHashes(col("n"), k).as("h"))
        .select(winnowFromHashes(col("h"), w).as("f"))
        .head().getSeq[Long](0)
      val kernel = df.select(winnowFingerprints(col("t"), k, w).as("f"))
        .head().getSeq[Long](0)
      assert(kernel == hof, s"text=${text.map(c => f"\\u$c%04x").mkString} k=$k w=$w")
    }
  }

  test("RepetitionStats kernel equals a driver-side model for random text") {
    // the kernel re-implements line splits, the house tokenizer, all nine
    // gram sizes, and code-point char counts in one pass; any divergence
    // (UTF-16 vs code-point lengths, trailing-empty splits, whole-doc
    // shingles under n, tie rules) must surface under adversarial text
    val genText = for {
      n <- Gen.choose(0, 40)
      cs <- Gen.listOfN(n, Gen.oneOf(
        Gen.oneOf("a", "b", "ab"), Gen.const(" "), Gen.const("\n"),
        Gen.const("\t"), Gen.const("é"), Gen.const("😀"), Gen.const("\r")))
    } yield cs.mkString
    def model(text: String): Seq[Long] = {
      def cp(x: String): Long = x.codePointCount(0, x.length).toLong
      def runs(xs: Seq[String]): Map[String, Int] =
        xs.groupBy(identity).view.mapValues(_.size).toMap
      val lines = text.split("\n", -1).toSeq
      val lr = runs(lines)
      // replicate UTF8String.trim (space-only) + regex-split semantics
      val toks = java.util.regex.Pattern.compile("\\s+")
        .split(text.replaceAll("^ +| +$", ""), -1).toSeq
      def grams(n: Int): Seq[String] =
        if (toks.length < n) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val head = Seq(
        cp(text), lines.length.toLong,
        lr.valuesIterator.collect { case c if c > 1 => (c - 1).toLong }.sum,
        cp(text) - (lines.length - 1),
        lr.collect { case (l, c) if c > 1 => c * cp(l) }.sum)
      val tops = (2 to 4).map { n =>
        // iterator, not Map.map — tuple results would collapse on the
        // count key and drop candidates
        runs(grams(n)).iterator
          .map { case (g, c) => (c.toLong, c * cp(g)) }
          .maxOption(Ordering[(Long, Long)]).map(_._2).getOrElse(0L)
      }
      val dups = (5 to 10).map { n =>
        runs(grams(n)).collect { case (g, c) if c > 1 => c * cp(g) }.sum
      }
      head ++ tops ++ dups
    }
    forAll(genText, n = 15) { text =>
      val got = toDf(spark)("id" -> Seq(1L), "t" -> Seq(text)).df
        .select(org.apache.spark.sql.graftshim.Shim.toColumn(
          org.apache.spark.sql.graftshim.RepetitionStats(
            org.apache.spark.sql.graftshim.Shim.toExpression(col("t"))))
          .as("rs"))
        .head().getSeq[Long](0)
      assert(got == model(text),
        s"text=${text.map(c => f"\\u$c%04x").mkString}")
    }
  }

  test("winnowCandidates equals driver-side fingerprint intersections") {
    // with bucketCap large enough to never cut, the operator's pair
    // counts must equal |fps(a) ∩ fps(b)| for every doc pair — computed
    // here against the kernel's own per-doc fingerprints (the kernel is
    // property-pinned to the HOF stages separately)
    import graft.functions.TextFunctions.winnowFingerprints
    val vocab = Seq("the", "cat", "sat", "mat", "dog", "ran", "far")
    val genCorpus = for {
      n <- Gen.choose(2, 6)
      texts <- Gen.listOfN(n, for {
        m <- Gen.choose(2, 14)
        ws <- Gen.listOfN(m, Gen.oneOf(vocab))
      } yield ws.mkString(" "))
    } yield texts
    forAll(genCorpus, n = 8) { texts =>
      val df = toDf(spark)(
        "doc_id" -> texts.indices.map(_.toLong),
        "text" -> texts).df
      val fps = df.select(col("doc_id"),
        winnowFingerprints(col("text"), 4, 3).as("f"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      val want = (for {
        a <- fps.keys; b <- fps.keys if a < b
        shared = (fps(a) intersect fps(b)).size
        if shared >= 1
      } yield (a, b) -> shared.toLong).toMap
      val got = graft.operators.Dedup.winnowCandidates(df, "text", "doc_id",
        k = 4, w = 3, bucketCap = 10000, minShared = 1L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, s"texts=$texts")
    }
  }

  test("histogram equals driver-side binning for random domains") {
    import graft.operators.Diagnostics
    val gen = for {
      lo <- Gen.choose(-1000L, 1000L)
      width <- Gen.choose(2L, 500L)
      bins <- Gen.choose(1, 20)
      n <- Gen.choose(1, 30)
      vs <- Gen.listOfN(n, Gen.choose(lo - 10L, lo + width + 10L))
    } yield (lo, lo + width, bins, vs)
    forAll(gen, n = 10) { case (lo, hi, bins, vs) =>
      val df = toDf(spark)("v" -> vs).df
      val got = Diagnostics.histogram(df, "v", lo, hi, bins)
        .collect().map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n")).toMap
      val want = vs.filter(v => v >= lo && v < hi)
        .groupBy(v => (v - lo) * bins / (hi - lo)) // Long division = DIV
        .view.mapValues(_.size.toLong).toMap
      assert(got == want, s"lo=$lo hi=$hi bins=$bins vs=$vs")
    }
  }

  test("CSV roundtrip preserves any long/string frame") {
    forAll(genRows) { case (xs, gs) =>
      val df = toDf(spark)("x" -> xs, "g" -> gs)
      val path = "/tmp/graft_prop_csv"
      graft.sources.Csv.writeCsvSingle(df.df, path)
      val back = graft.api.DataTable(graft.sources.Csv.readCsv(spark, path))
      assert(back.df.schema("x").dataType == org.apache.spark.sql.types.LongType)
      assert(colLongs(back.arrange("x", "g"), "x") == colLongs(df.arrange("x", "g"), "x"))
      assert(colStrings(back.arrange("x", "g"), "g") == colStrings(df.arrange("x", "g"), "g"))
    }
  }
}
