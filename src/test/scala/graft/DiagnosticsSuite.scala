package graft

import org.apache.spark.sql.functions._
import graft.api.{toDf, DataTable}
import graft.operators.Diagnostics

/** Key-skew pre-flight report: exact counts/shares, deterministic
  * tie-break, and the bounded plan shape. */
class DiagnosticsSuite extends SparkSpec {

  test("keySkew reports exact counts, shares, and deterministic ranks") {
    // counts: a=4, b=3, c=2, d=1 over 10 rows
    val df = toDf(spark)("k" ->
      Seq("a", "a", "a", "a", "b", "b", "b", "c", "c", "d")).df
    val out = DataTable(Diagnostics.keySkew(df, Seq("k"), topK = 3))
      .arrange("rnk")
    assert(colStrings(out, "k") == Seq("a", "b", "c")) // d cut by topK
    assert(colLongs(out, "n") == Seq(4L, 3L, 2L))
    assert(colDoubles(out, "share") == Seq(0.4, 0.3, 0.2))
    assert(colLongs(out, "rnk") == Seq(1L, 2L, 3L))
  }

  test("keySkew ties rank deterministically by key") {
    val df = toDf(spark)("k" -> Seq("z", "z", "m", "m", "a")).df
    val out = DataTable(Diagnostics.keySkew(df, Seq("k"), topK = 10))
      .arrange("rnk")
    // z and m tie at 2; key ASC breaks the tie: m before z
    assert(colStrings(out, "k") == Seq("m", "z", "a"))
    assert(colLongs(out, "rnk") == Seq(1L, 2L, 3L))
  }

  test("histogram bins with integer edges, half-open domain") {
    // domain [0, 100), 10 bins of width 10: 0→bin0, 9→bin0, 10→bin1,
    // 99→bin9, 100 and -1 dropped (half-open, out-of-domain)
    val df = toDf(spark)("v" -> Seq(0L, 9L, 10L, 55L, 99L, 100L, -1L)).df
    val out = DataTable(Diagnostics.histogram(df, "v", 0L, 100L, 10))
      .arrange("bin")
    assert(colLongs(out, "bin") == Seq(0L, 1L, 5L, 9L))
    assert(colLongs(out, "n") == Seq(2L, 1L, 1L, 1L))
    assert(colDoubles(out, "lo_edge") == Seq(0.0, 10.0, 50.0, 90.0))
    assert(colDoubles(out, "hi_edge") == Seq(10.0, 20.0, 60.0, 100.0))
  }

  test("keySkew handles composite keys") {
    val df = toDf(spark)(
      "a" -> Seq("x", "x", "x", "y", "y"),
      "b" -> Seq(1L, 1L, 2L, 1L, 1L)).df
    val out = DataTable(Diagnostics.keySkew(df, Seq("a", "b"), topK = 2))
      .arrange("rnk")
    // (x,1)=2, (y,1)=2 tie → key order breaks: (x,1) first; (x,2)=1 cut
    assert(colStrings(out, "a") == Seq("x", "y"))
    assert(colLongs(out, "b") == Seq(1L, 1L))
    assert(colLongs(out, "n") == Seq(2L, 2L))
    assert(colDoubles(out, "share") == Seq(0.4, 0.4))
  }

  test("keySkew rejects report-column name collisions with a clear error") {
    val df = toDf(spark)("n" -> Seq(1L, 2L)).df
    val e = intercept[IllegalArgumentException] {
      Diagnostics.keySkew(df, Seq("n"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("histogram handles identifier-hostile measure names") {
    val df = toDf(spark)("id" -> (0L until 10L)).df
      .withColumn("n.chars", col("id") * 10)
    val out = DataTable(Diagnostics.histogram(df, "n.chars", 0L, 100L, 10))
      .arrange("bin")
    assert(colLongs(out, "n").sum == 10L) // dotted name not struct access
  }

  test("histogram handles non-divisible widths exactly") {
    // [0, 7), 2 bins: width 3.5 — bin = x*2 div 7: 0..3→bin0, 4..6→bin1
    val df = toDf(spark)("v" -> (0L until 7L)).df
    val out = DataTable(Diagnostics.histogram(df, "v", 0L, 7L, 2))
      .arrange("bin")
    assert(colLongs(out, "n") == Seq(4L, 3L))
    assert(colDoubles(out, "hi_edge") == Seq(3.5, 7.0))
  }

  test("histogram rejects a non-integral measure (no silent truncation)") {
    val df = toDf(spark)("id" -> (0L until 10L)).df
      .withColumn("score", col("id").cast("double") / 3.0)
    val e = intercept[IllegalArgumentException] {
      Diagnostics.histogram(df, "score", 0L, 10L, 5)
    }
    assert(e.getMessage.contains("integral"))
  }

  test("histogram raises on a case-ambiguous measure instead of picking one") {
    // under the default case-insensitive resolver both fields match —
    // Spark's own column resolution would raise; so must we, instead of
    // silently binning whichever field appears first in the schema
    val df = toDf(spark)("N_chars" -> Seq(1L), "n_chars" -> Seq(2L)).df
    val e = intercept[IllegalArgumentException] {
      Diagnostics.histogram(df, "n_chars", 0L, 10L, 5)
    }
    assert(e.getMessage.contains("ambiguous"), e.getMessage)
  }

  test("histogram rejects a domain whose width * bins overflows Long") {
    val df = toDf(spark)("v" -> Seq(1L, 2L)).df
    val wide = intercept[IllegalArgumentException] {
      Diagnostics.histogram(df, "v", Long.MinValue, Long.MaxValue, 2)
    }
    assert(wide.getMessage.contains("wider than Long.MaxValue"))
    val e = intercept[IllegalArgumentException] {
      Diagnostics.histogram(df, "v", 0L, Long.MaxValue, 4)
    }
    assert(e.getMessage.contains("overflows"))
  }

  test("keySkew plan: top-K is a bounded TakeOrdered, window after the cut") {
    val df = spark.range(1000).select((col("id") % 50).as("k"))
    val plan = Diagnostics.keySkew(df, Seq("k"), topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K must be a bounded TakeOrdered, not a global sort:\n$plan")
  }

  test("countMin: estimate upper-bounds the exact count for every token") {
    val df = toDf(spark)("text" -> Seq(
      "a a a b c", "a b b d e f", "g h a b c c")).df
    val sk = Diagnostics.countMinSketch(df, "text", depth = 3, width = 8)
    // sketch is bounded by depth × width and each row sums to the token count
    val skRows = sk.collect()
    assert(skRows.length <= 3 * 8)
    val perRow = skRows.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perRow.values.toSet == Set(17L)) // 17 tokens total, every row sees all
    val exact = df.select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n_exact"))
    val est = Diagnostics.countMinEstimate(sk, exact, depth = 3, width = 8)
    val joined = exact.join(est, Seq("tok")).collect()
    assert(joined.length == 8) // a..h
    joined.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"CM estimate below exact for ${r.getString(0)}")
    }
  }

  test("countMin: width large enough -> estimates exact; absent token reads 0") {
    val df = toDf(spark)("text" -> Seq("x y z", "x y", "x")).df
    val sk = Diagnostics.countMinSketch(df, "text", depth = 4, width = 4096)
    import spark.implicits._
    val probes = Seq("x", "y", "z", "missing").toDF("tok")
    val est = Diagnostics.countMinEstimate(sk, probes, depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 distinct tokens in 4096 buckets: collisions effectively impossible
    assert(est("x") == 3L && est("y") == 2L && est("z") == 1L)
    assert(est("missing") == 0L) // empty buckets read 0, not a join drop
  }

  test("countMin: sketch probe broadcasts (the sketch is bounded state)") {
    import spark.implicits._
    val df = toDf(spark)("text" -> Seq("a b", "b c")).df
    val sk = Diagnostics.countMinSketch(df, "text", depth = 2, width = 8)
    val plan = Diagnostics
      .countMinEstimate(sk, Seq("a").toDF("tok"), depth = 2, width = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") || plan.contains("BroadcastHashJoin"),
      s"expected broadcast sketch join in:\n$plan")
  }

  test("expectations: row rules count null predicates as FAIL") {
    import graft.operators.Expectations._
    val df = toDf(spark)(
      "id" -> Seq(1L, 2L, 3L),
      "v" -> Seq[Any](5L, null, -2L)).df
    val out = check(df, Seq(
      RowRule("v_positive", col("v") > 0),
      RowRule("v_not_null", col("v").isNotNull)))
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      ("v_not_null", 3L, 2L, 1L),
      ("v_positive", 3L, 1L, 2L))) // null > 0 is null -> FAIL
  }

  test("expectations: uniqueness fails duplicated and null keys") {
    import graft.operators.Expectations._
    val df = toDf(spark)("k" -> Seq[Any](1L, 1L, 2L, null)).df
    val out = check(df, Seq(UniqueRule("k_unique", "k"))).collect()
    val r = out.head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ("k_unique", 4L, 1L, 3L)) // only k=2 passes
  }

  test("expectations: row rules share one corpus scan") {
    import graft.operators.Expectations._
    val docs = graft.sources.Tables.df(spark, "/root/testdata/sf0.001", "documents")
    val plan = check(docs, Seq(
      RowRule("a", col("text").isNotNull),
      RowRule("b", col("n_chars") > 0),
      RowRule("c", col("lang").rlike("^[a-z]{2}$"))))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan for 3 row rules, got $scans:\n$plan")
  }

  test("profile: nulls, distincts, min/max; one aggregate scan") {
    import graft.operators.Diagnostics
    val df = toDf(spark)(
      "k" -> Seq[Any](1L, 2L, 2L, null),
      "s" -> Seq[Any]("b", null, "a", "a")).df
    val out = Diagnostics.profile(df, Seq("k", "s"))
      .orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(out.toSeq == Seq(
      ("k", 4L, 1L, 2L, "1", "2"),
      ("s", 4L, 1L, 2L, "a", "b")))
    val docs = graft.sources.Tables.df(spark, "/root/testdata/sf0.001", "documents")
    val plan = Diagnostics.profile(docs, Seq("doc_id", "lang", "n_chars"))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan for 3 profiled columns, got $scans")
  }

  test("winsorize clamps to the interpolated cuts; nulls stay null") {
    import graft.operators.Sampling
    // values 0..8: p25 = 2.0, p75 = 6.0 exactly
    val df = toDf(spark)("id" -> (0 until 9), "v" -> (0 until 9)).df
      .unionByName(toDf(spark)("id" -> Seq(99), "v" -> Seq(0)).df
        .withColumn("v", lit(null).cast("long")))
    val got = Sampling.winsorize(df, "v", 0.25, 0.75)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) null else r.getDouble(2))).toMap
    assert(got(0L) == 2.0 && got(1L) == 2.0 && got(2L) == 2.0)
    assert(got(4L) == 4.0)
    assert(got(6L) == 6.0 && got(7L) == 6.0 && got(8L) == 6.0)
    assert(got(99L) == null)
  }

  test("expectations: duplicate rule names are rejected") {
    import graft.operators.Expectations._
    val df = toDf(spark)("k" -> Seq(1L)).df
    intercept[IllegalArgumentException] {
      check(df, Seq(RowRule("x", col("k") > 0), UniqueRule("x", "k")))
    }
  }
}
