package graft

import org.apache.spark.sql.functions._
import graft.api.toDf
import graft.operators.{Pack, Sampling}

/** Deterministic sampling / splitting / packing invariants. */
class SamplingSuite extends SparkSpec {

  private def ids(n: Int) = toDf(spark)("id" -> (0 until n)).df

  // ------------------------------------------------------ mixturePlan

  /** Independent iterative water-filling reference (the textbook
    * fixpoint, NOT the closed form under test): proportional shares,
    * cap violators, redistribute, repeat to convergence. Returns
    * (capped set, remaining budget, uncapped weight sum). */
  private def waterFillRef(caps: Map[String, Long], w: Map[String, Long],
                           budget: Long): (Set[String], Long, Long) = {
    var capped = Set.empty[String]
    var changed = true
    while (changed) {
      changed = false
      val remB = budget - capped.toSeq.map(caps).sum
      val wU = w.filterNot(kv => capped(kv._1)).values.sum
      if (wU > 0) w.keys.filterNot(capped).foreach { d =>
        // d violates its cap at the current water level (λ ≥ cap/w)
        if (remB * w(d) >= caps(d) * wU && !capped(d)) {
          capped += d; changed = true
        }
      }
    }
    val remB = math.max(0L, budget - capped.toSeq.map(caps).sum)
    val wU = w.filterNot(kv => capped(kv._1)).values.sum
    (capped, remB, wU)
  }

  private def planDf(rows: Seq[(String, Long)]) =
    toDf(spark)("d" -> rows.map(_._1), "t" -> rows.map(_._2)).df

  test("mixturePlan matches hand-computed water-filling; total exact") {
    // avail: a=100, b=1000, c=1000; weights 50/25/25%; budget 600, E=1
    // round 1: targets 300/150/150 — a caps at 100
    // round 2: remaining 500 over b,c equally: 250/250 — both fit
    val out = graft.operators.Sampling.mixturePlan(
      planDf(Seq("a" -> 100L, "b" -> 1000L, "c" -> 1000L)), "d", "t",
      Map("a" -> 500000L, "b" -> 250000L, "c" -> 250000L), budget = 600L)
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getAs[Long]("capped"),
        r.getAs[Long]("planned_tokens"))).toSeq
    assert(out == Seq(("a", 1L, 100L), ("b", 0L, 250L), ("c", 0L, 250L)),
      out.toString)
  }

  test("mixturePlan: cascading caps, exact total, closed form == iterative reference") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      val n = 2 + rnd.nextInt(6)
      val avail = (0 until n).map(i => s"d$i" -> (1L + rnd.nextInt(500))).toMap
      val w = (0 until n).map(i => s"d$i" -> (1L + rnd.nextInt(100000))).toMap
      val budget = 1L + rnd.nextInt(2000)
      val caps = avail.map { case (k, v) => k -> v * 2L }
      val got = graft.operators.Sampling.mixturePlan(
        planDf(avail.toSeq.sortBy(_._1)), "d", "t", w, budget, maxEpochs = 2)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("capped"), r.getAs[Long]("planned_tokens"))).toMap
      val (refCapped, _, _) = waterFillRef(caps, w, budget)
      assert(got.filter(_._2._1 == 1L).keySet == refCapped,
        s"trial $trial: capped set diverges from iterative reference " +
          s"(got ${got.filter(_._2._1 == 1L).keySet}, want $refCapped; " +
          s"avail=$avail w=$w budget=$budget)")
      val total = got.values.map(_._2).sum
      val want = math.min(budget, caps.values.sum)
      assert(total == want, s"trial $trial: total $total != $want")
      // capped domains sit exactly at cap; uncapped within cap+1
      got.foreach { case (d, (c, p)) =>
        if (c == 1L) assert(p == caps(d), s"$d at cap")
        else assert(p <= caps(d) + 1, s"$d rounding bound")
      }
    }
  }

  test("executeMixturePlan: crossing-doc fill per domain; over-avail plans take everything once") {
    // domain a: plan 25 over docs of 10+10+10 in hash order -> first
    // two fill 20 (< 25), the CROSSING third is kept (exclusive prefix
    // 20 < 25), total 30; domain b: plan exceeds availability (epochs
    // cap) -> one-pass semantics takes all; domain z absent from plan
    val docs = toDf(spark)(
      "id" -> (1L to 6L),
      "d" -> Seq("a", "a", "a", "b", "b", "z"),
      "t" -> Seq(10L, 10L, 10L, 7L, 7L, 5L)).df
    val plan = toDf(spark)(
      "domain" -> Seq("a", "b"),
      "planned_tokens" -> Seq(25L, 100L)).df
    val out = graft.operators.Sampling.executeMixturePlan(
      docs, "id", "d", "t", plan)
      .collect().map(r => (r.getAs[String]("d"), r.getAs[Long]("id"))).toSeq
    val byDomain = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byDomain == Map("a" -> 3, "b" -> 2), s"got $out")
    // plan total respected within one crossing doc per domain
    val aTokens = 30L // all three kept: 20 exclusive-prefix < 25
    assert(aTokens >= 25L && aTokens < 25L + 10L)
  }

  test("executeMixturePlan composes with mixturePlan: per-domain fills respect planned totals") {
    val rnd = new scala.util.Random(11)
    val docs = toDf(spark)(
      "id" -> (1L to 200L),
      "d" -> (1 to 200).map(i => s"d${i % 4}"),
      "t" -> (1 to 200).map(_ => 5L + rnd.nextInt(50))).df
    val plan = graft.operators.Sampling.mixturePlan(docs, "d", "t",
      Map("d0" -> 400000L, "d1" -> 300000L, "d2" -> 300000L),
      budget = 2000L)
    val got = graft.operators.Sampling.executeMixturePlan(
      docs, "id", "d", "t", plan)
      .groupBy("d").agg(sum("t").as("taken")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("taken")).toMap
    val planned = plan.collect()
      .map(r => r.getString(0) -> r.getAs[Long]("planned_tokens")).toMap
    // d3 has no weight -> planned 0 -> absent from the fill
    assert(!got.contains("d3"))
    got.foreach { case (d, taken) =>
      val p = planned(d)
      val avail = docs.filter(col("d") === d).agg(sum("t")).head.getLong(0)
      if (p >= avail) assert(taken == avail, s"$d one-pass takes all")
      else assert(taken >= p && taken < p + 55L,
        s"$d: taken $taken vs planned $p (crossing-doc bound)")
    }
  }

  test("mixturePlan: budget past all caps -> everything capped (shortfall); zero-weight plans 0") {
    val out = graft.operators.Sampling.mixturePlan(
      planDf(Seq("a" -> 10L, "b" -> 20L, "z" -> 30L)), "d", "t",
      Map("a" -> 600000L, "b" -> 400000L, "zz_absent" -> 1L),
      budget = 1000000L).orderBy("domain").collect()
      .map(r => (r.getString(0), r.getAs[Long]("capped"),
        r.getAs[Long]("planned_tokens"), r.getAs[Long]("epochs_micro"))).toSeq
    // a,b cap at 1 epoch (maxEpochs default 1); z has no weight -> 0
    assert(out == Seq(("a", 1L, 10L, 1000000L), ("b", 1L, 20L, 1000000L),
      ("z", 0L, 0L, 0L)), out.toString)
  }

  test("hashSample is deterministic and nested across fractions") {
    val df = ids(2000)
    val s10 = Sampling.hashSample(df, "id", 0.1).collect().map(_.getLong(0)).toSet
    val s10b = Sampling.hashSample(df, "id", 0.1).collect().map(_.getLong(0)).toSet
    val s20 = Sampling.hashSample(df, "id", 0.2).collect().map(_.getLong(0)).toSet
    assert(s10 == s10b)                      // reproducible
    assert(s10.subsetOf(s20))                // fractions nest (same key space)
    assert(math.abs(s10.size - 200) < 80)    // roughly the asked fraction
    val other = Sampling.hashSample(df, "id", 0.1, seed = 7L)
      .collect().map(_.getLong(0)).toSet
    assert(other != s10)                     // seed changes the sample
  }

  test("splitAssign partitions every row into the named splits") {
    val df = ids(2000)
    val split = Sampling.splitAssign(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000)
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("stratifiedHashSample keeps full strata at default rate") {
    val df = toDf(spark)(
      "id" -> (0 until 1000),
      "g" -> (0 until 1000).map(i => if (i % 2 == 0) "keep" else "thin")).df
    val out = Sampling.stratifiedHashSample(df, "id", "g", Map("thin" -> 0.2))
    val counts = out.groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("keep") == 500)            // default rate 1.0: untouched
    assert(counts("thin") < 200)             // thinned well below half
  }

  test("hashSample keys by entity: same ids selected across tables") {
    // orders and lineitem share the order-key space: sampling each table
    // at the same fraction/seed must select the SAME orders, so sampled
    // lineitems always have their order (referential integrity for free)
    val sf = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .withColumnRenamed("o_orderkey", "k")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "k")
    val so = Sampling.hashSample(orders, "k", 0.2)
      .select("k").collect().map(_.getLong(0)).toSet
    val sl = Sampling.hashSample(lineitem, "k", 0.2)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(sl.nonEmpty)
    assert(sl.subsetOf(so)) // every sampled lineitem's order was sampled
  }

  test("hashShuffle is a deterministic permutation") {
    val df = ids(500)
    val a = Sampling.hashShuffle(df, "id").collect().map(_.getLong(0)).toSeq
    val b = Sampling.hashShuffle(df, "id").collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a.sorted != a)                    // actually permuted
    assert(a.sorted == (0L until 500L).toSeq)
  }

  test("quantileGate keeps the boundary row when the quantile is exact") {
    // values 0..4, q=0.75 → rank (5-1)*0.75 = 3 exactly → threshold 3.0;
    // the row AT the threshold is kept (>=, not >)
    val df = toDf(spark)("id" -> (0 until 5), "v" -> (0 until 5)).df
    val kept = Sampling.quantileGate(df, "v", 0.75)
      .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(kept == Seq(3L, 4L))
  }

  test("quantileGate interpolates between values like quantile_cont") {
    // values 1..8, q=0.75 → rank 7*0.75 = 5.25 → 6 + 0.25*(7-6) = 6.25;
    // 6 falls below the interpolated threshold, 7 and 8 survive
    val df = toDf(spark)("id" -> (1 to 8), "v" -> (1 to 8)).df
    val kept = Sampling.quantileGate(df, "v", 0.75)
      .collect().map(_.getLong(1)).toSet
    assert(kept == Set(7L, 8L))
  }

  test("quantileGate rejects non-integral measures and missing columns") {
    val dbl = toDf(spark)("id" -> Seq(1, 2), "score" -> Seq(0.5, 0.9)).df
    val e1 = intercept[IllegalArgumentException] {
      Sampling.quantileGate(dbl, "score", 0.5)
    }
    assert(e1.getMessage.contains("integral"))
    val e2 = intercept[IllegalArgumentException] {
      Sampling.quantileGate(ids(3), "nope", 0.5)
    }
    assert(e2.getMessage.contains("not in"))
    // case-ambiguous under the default resolver: raise, don't pick first
    val dup = toDf(spark)("Score" -> Seq(1L), "score" -> Seq(2L)).df
    val e3 = intercept[IllegalArgumentException] {
      Sampling.quantileGate(dup, "score", 0.5)
    }
    assert(e3.getMessage.contains("ambiguous"), e3.getMessage)
  }

  test("tokenBudgetSample: crossing doc included, short domains keep all, deterministic") {
    // domain A: 5 docs x 10 tokens, budget 25 -> exactly 3 kept (30 tokens);
    // domain B: 1 doc x 4 tokens, budget 25 -> kept entirely
    val text10 = (0 until 10).map(i => s"w$i").mkString(" ")
    val df = toDf(spark)(
      "doc_id" -> (1L to 6L),
      "dom" -> Seq("A", "A", "A", "A", "A", "B"),
      "text" -> (Seq.fill(5)(text10) :+ "a b c d")).df
      .withColumn("n", graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
    val kept = Sampling.tokenBudgetSample(df, "doc_id", "dom", "n", budget = 25L)
      .collect().map(_.getLong(0)).toSet
    // expected: first 3 of domain A in the (hashBucket, id) order + doc 6
    val order = df.filter(col("dom") === "A")
      .select(col("doc_id"), Sampling.hashBucket(col("doc_id"), "tbudget", 42L).as("h"))
      .collect().map(r => (r.getLong(1), r.getLong(0))).sorted.map(_._2)
    val expected = order.take(3).toSet + 6L
    assert(kept == expected, s"kept=$kept expected=$expected")
    // deterministic across evaluations
    val again = Sampling.tokenBudgetSample(df, "doc_id", "dom", "n", budget = 25L)
      .collect().map(_.getLong(0)).toSet
    assert(again == kept)
    // each selected domain-A total reaches the budget
    val total = df.filter(col("doc_id").isin(order.take(3): _*))
      .agg(sum("n")).collect()(0).getLong(0)
    assert(total >= 25L)
  }

  test("quantileBuckets: boundary-inclusive cuts, null scores stay null") {
    // values 0..7, cuts (0.25, 0.75): thresholds (7·0.25)=1.75 and
    // (7·0.75)=5.25 — interpolated 1.75 / 5.25; so 0,1 → bucket 0,
    // 2..5 → bucket 1, 6,7 → bucket 2
    val df = toDf(spark)("id" -> (0 until 8), "v" -> (0 until 8)).df
      .unionByName(toDf(spark)("id" -> Seq(99), "v" -> Seq(0)).df
        .withColumn("v", lit(null).cast("long")))
    val got = Sampling.quantileBuckets(df, "v", Seq(0.25, 0.75), "b")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else r.getLong(2))).toMap
    assert(got(0L) == 0L && got(1L) == 0L)
    assert((2L to 5L).forall(got(_) == 1L), s"got $got")
    assert(got(6L) == 2L && got(7L) == 2L)
    assert(got(99L) == null, "null score must stamp a null bucket")
  }

  test("quantileBuckets: a value exactly AT a cut lands in the lower bucket") {
    // values 0..4: 0.25-cut threshold = 1.0 exactly → v=1 is bucket 0
    val df = toDf(spark)("id" -> (0 until 5), "v" -> (0 until 5)).df
    val got = Sampling.quantileBuckets(df, "v", Seq(0.25), "b")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 0L, s"boundary row must be <= (got $got)")
    assert(got(2L) == 1L)
  }

  test("quantileBuckets: validation — cuts ordered/in-range, integral measure") {
    val df = toDf(spark)("id" -> (0 until 4), "v" -> (0 until 4)).df
    assert(intercept[IllegalArgumentException] {
      Sampling.quantileBuckets(df, "v", Seq(0.75, 0.25))
    }.getMessage.contains("increasing"))
    assert(intercept[IllegalArgumentException] {
      Sampling.quantileBuckets(df, "v", Seq(0.5, 1.5))
    }.getMessage.contains("(0,1)"))
    val dbl = toDf(spark)("id" -> Seq(1), "v" -> Seq(0.5)).df
    assert(intercept[IllegalArgumentException] {
      Sampling.quantileBuckets(dbl, "v", Seq(0.5))
    }.getMessage.contains("integral"))
  }

  test("quantileBuckets: corpus side never shuffles (threshold broadcasts)") {
    val df = toDf(spark)("id" -> (0 until 64), "v" -> (0 until 64)).df
    val plan = Sampling.quantileBuckets(df, "v", Seq(0.25, 0.75), "b")
      .queryExecution.executedPlan.toString
    // the one aggregate's exchange is on the 1-row threshold side; the
    // stamped corpus must join it by broadcast, not hash-exchange
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"plan:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"), s"plan:\n$plan")
  }

  test("quantileGate handles identifier-hostile column names") {
    val df = toDf(spark)("id" -> (0 until 4)).df
      .withColumn("n chars", col("id") * 10)
    val kept = Sampling.quantileGate(df, "n chars", 0.5)
      .collect().map(_.getLong(1)).toSet
    assert(kept == Set(20L, 30L)) // threshold 15.0
  }

  test("quantileGate resolves the measure like the analyzer (case-insensitive)") {
    // default spark.sql.caseSensitive=false: a differently-cased name
    // must resolve exactly as percentile/filter would resolve it
    val df = toDf(spark)("id" -> (0 until 4), "score" -> (0 until 4)).df
    val kept = Sampling.quantileGate(df, "SCORE", 0.5)
      .collect().map(_.getLong(1)).toSet
    assert(kept == Set(2L, 3L)) // threshold 1.5
  }

  test("quantileGate plan: corpus side never shuffles (broadcast threshold)") {
    // the only exchange is the scalar aggregate's SinglePartition gather;
    // the gated scan must not hash-repartition
    val plan = Sampling.quantileGate(ids(100), "id", 0.75)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus side must stay scan-local:\n$plan")
    assert(plan.contains("Broadcast"), s"threshold must broadcast:\n$plan")
  }

  test("temperatureMixture: tau endpoints — natural at 1, equalized at 0") {
    // skewed domains: a=1000, b=250, c=40
    val df = toDf(spark)(
      "id" -> (0 until 1290),
      "dom" -> ((0 until 1000).map(_ => "a") ++ (0 until 250).map(_ => "b")
        ++ (0 until 40).map(_ => "c"))).df
    val natural = Sampling.temperatureMixture(df, "id", "dom", tau = 1.0)
    assert(natural.count() == 1290L, "tau=1 keeps every row")
    val eq = Sampling.temperatureMixture(df, "id", "dom", tau = 0.0)
      .groupBy("dom").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected count per domain is n_min = 40; hash noise ~ ±2σ ≈ ±13
    assert(eq("c") == 40L, "smallest domain keeps everything")
    assert(math.abs(eq("a") - 40L) < 25 && math.abs(eq("b") - 40L) < 25,
      s"tau=0 equalizes expected counts at n_min: $eq")
  }

  test("temperatureMixture: tau=0.5 flattens monotonically, deterministic") {
    val df = toDf(spark)(
      "id" -> (0 until 1290),
      "dom" -> ((0 until 1000).map(_ => "a") ++ (0 until 250).map(_ => "b")
        ++ (0 until 40).map(_ => "c"))).df
    val got = Sampling.temperatureMixture(df, "id", "dom")
      .groupBy("dom").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected: a = 1000·√(40/1000) = 200, b = 250·√(40/250) = 100, c = 40
    assert(got("c") == 40L)
    assert(math.abs(got("a") - 200L) < 45 && math.abs(got("b") - 100L) < 35,
      s"tau=0.5 expected ≈ (200, 100, 40): $got")
    // shares flattened but natural order preserved (a > b > c still)
    assert(got("a") > got("b") && got("b") > got("c"))
    val again = Sampling.temperatureMixture(df, "id", "dom")
      .collect().map(_.getLong(1)).toSet
    assert(Sampling.temperatureMixture(df, "id", "dom")
      .collect().map(_.getLong(1)).toSet == again, "deterministic replay")
  }

  test("temperatureMixture plan: corpus never shuffles (cuts broadcast)") {
    val df = toDf(spark)(
      "id" -> (0 until 100),
      "dom" -> (0 until 100).map(i => if (i < 80) "a" else "b")).df
    val plan = Sampling.temperatureMixture(df, "id", "dom")
      .queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0, s"per-domain cuts must broadcast onto the scan:\n$plan")
    // the STREAMED (corpus) subtree prints between the join node and its
    // BroadcastExchange build side; the tiny counts agg may shuffle, the
    // corpus must not
    val streamed = plan.substring(joinIdx,
      plan.indexOf("BroadcastExchange", joinIdx))
    assert(!streamed.contains("Exchange hashpartitioning"),
      s"corpus side of the gate must not repartition:\n$plan")
  }

  test("temperatureMixture: null domains neither set the floor nor survive") {
    // 2 null-domain rows must NOT become the smallest domain (which
    // would collapse b's rate to sqrt(2/1000)); they are excluded
    val df = toDf(spark)(
      "id" -> (0 until 1012),
      "dom" -> ((0 until 1000).map(_ => "a") ++ (0 until 10).map(_ => "b")
        ++ Seq(null, null))).df
    val got = Sampling.temperatureMixture(df, "id", "dom", tau = 0.0)
      .groupBy("dom").count()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(!got.contains(None), "null-domain rows must not survive")
    assert(got(Some("b")) == 10L, "smallest REAL domain keeps everything")
    assert(math.abs(got(Some("a")) - 10L) < 15,
      s"tau=0 equalizes at the real min, not the null group's count: $got")
  }

  test("temperatureMixture rejects tau outside [0,1]") {
    val df = ids(10).withColumn("dom", lit("a"))
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df, "id", "dom", tau = 1.5)
    }
  }

  test("chunkDocuments windows with stride overlap and keeps the tail") {
    val df = toDf(spark)(
      "id" -> Seq(1),
      "t" -> Seq((1 to 10).map(i => s"w$i").mkString(" "))).df
    val chunks = Pack.chunkDocuments(df, "id", "t", chunkTokens = 4, stride = 3)
      .orderBy("chunk_id").collect()
      .map(r => (r.getAs[Long]("chunk_id"), r.getAs[Long]("n_tok"),
        r.getAs[String]("chunk_text")))
    // starts at 0,3,6,9 over 10 tokens; window 4; tail shorter
    assert(chunks.toSeq == Seq(
      (0L, 4L, "w1 w2 w3 w4"),
      (1L, 4L, "w4 w5 w6 w7"),
      (2L, 4L, "w7 w8 w9 w10"),
      (3L, 1L, "w10")))
  }

  test("packGreedy: examples fill the budget, ids monotone within shard") {
    val n = 400
    val df = toDf(spark)(
      "id" -> (0 until n),
      "n_tok" -> (0 until n).map(i => 10 + i % 90)).df
    val packed = Pack.packGreedy(df, "id", "n_tok", budget = 256, shards = 4)
      .collect().map(r => (r.getAs[Long]("shard"), r.getLong(0),
        r.getAs[Long]("n_tok"), r.getAs[Long]("example_id")))
    assert(packed.length == n)
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val byId = rows.sortBy(_._2)
      // example ids start at 0 and never decrease along the shard stream
      assert(byId.head._4 == 0L)
      assert(byId.sliding(2).forall { case Array(a, b) => a._4 <= b._4; case _ => true })
      // replay the greedy rule: example = (cum - n) / budget
      var cum = 0L
      byId.foreach { case (_, _, tok, ex) =>
        assert(ex == cum / 256L)
        cum += tok
      }
    }
  }

  test("leakageSafeSplit: no near-dup cluster straddles splits") {
    val docs = graft.sources.Tables.df(spark, "/root/testdata/sf0.001", "documents")
    val out = Sampling.leakageSafeSplit(docs, "text", "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val perCluster = out.groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n"), count(lit(1)).as("sz"))
    assert(perCluster.filter(col("n") =!= 1L).count() == 0L,
      "every cluster must land wholly in one split")
    // the invariant is non-vacuous: real multi-doc clusters exist
    assert(perCluster.filter(col("sz") > 1L).count() > 0L)
    // and a singleton doc splits exactly as the doc-keyed rule would
    val single = out.filter(col("cluster_id") === col("doc_id"))
      .select("doc_id", "split")
    val plain = Sampling.splitAssign(
      docs.join(single.select("doc_id"), Seq("doc_id"), "left_semi"),
      "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split")
    // singletons whose cluster_id == doc_id hash identically either way
    assert(single.exceptAll(plain).count() == 0L)
  }

  test("datasetDiff: added/removed/changed with null-safe fingerprints") {
    val o = toDf(spark)(
      "id" -> Seq(1L, 2L, 3L, 4L, 5L),
      "v" -> Seq[Any]("a", "b", null, "d", null)).df
    val n = toDf(spark)(
      "id" -> Seq(2L, 3L, 4L, 5L, 6L),
      "v" -> Seq[Any]("b", "c", null, null, "f")).df
    val out = graft.operators.Diagnostics.datasetDiff(o, n, "id", "v")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq(
      (1L, "removed"),   // only in old
      (3L, "changed"),   // null -> "c"
      (4L, "changed"),   // "d" -> null
      (6L, "added")))    // 2: same value, 5: null -> null => unchanged
  }

  test("proportionalSample: exact total, Hamilton quotas within 1 of exact share") {
    val df = toDf(spark)(
      "id" -> (0 until 1000),
      "g" -> (0 until 1000).map(i =>
        if (i < 700) "big" else if (i < 930) "mid" else "small")).df
    val out = Sampling.proportionalSample(df, "id", "g", totalN = 97L)
    val counts = out.groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 97L, s"exact total violated: $counts")
    // exact shares: 67.9 / 22.31 / 6.79 — each quota within 1 of exact
    val exact = Map("big" -> 0.7 * 97, "mid" -> 0.23 * 97, "small" -> 0.07 * 97)
    exact.foreach { case (g, e) =>
      assert(math.abs(counts(g) - e) <= 1.0, s"$g quota ${counts(g)} vs $e")
    }
    // deterministic
    val again = Sampling.proportionalSample(df, "id", "g", totalN = 97L)
      .collect().map(_.getLong(1)).toSet
    assert(again == out.collect().map(_.getLong(1)).toSet)
  }

  test("proportionalSample: totalN >= rows returns everything; 0 returns none") {
    val df = toDf(spark)("id" -> (0 until 10), "g" -> Seq.fill(10)("x")).df
    assert(Sampling.proportionalSample(df, "id", "g", 100L).count() == 10L)
    assert(Sampling.proportionalSample(df, "id", "g", 0L).count() == 0L)
  }
}
