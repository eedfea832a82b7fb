package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.toDf

/** Expression-surface parity for the reference's `f{}` formula DSL
  * (SURVEY §2.9): every construct the DSL provides, expressed as native
  * `Column` operations, with golden results mirroring the reference's
  * semantics (README.org:141-204, formula.nim heuristics).
  */
class FormulaSuite extends SparkSpec {

  private def frame = toDf(spark)(
    "x" -> Seq(1, 2, 3, 4),
    "y" -> Seq(10.0, 20.0, 30.0, 40.0),
    "s" -> Seq("a", "b", "a", "c"),
    "b" -> Seq(true, false, true, false))

  test("infix arithmetic + - * / mod (formula.nim:366-368)") {
    val r = frame.transmute(
      "add" -> (col("x") + col("y")),
      "sub" -> (col("y") - col("x")),
      "mul" -> (col("x") * col("x")),
      "div" -> (col("y") / col("x")),
      "md" -> (col("x") % 3)).arrangeBy(col("add"))
    assert(colDoubles(r, "add") == Seq(11.0, 22.0, 33.0, 44.0))
    assert(colDoubles(r, "div") == Seq(10.0, 10.0, 10.0, 10.0))
    assert(colLongs(r, "md") == Seq(1L, 2L, 0L, 1L))
  }

  test("comparison and logic ops (> < >= <= == != and or not)") {
    val r = frame.filter(col("x") > 1 && col("x") <= 3 || !col("b")).arrange("x")
    assert(colLongs(r, "x") == Seq(2L, 3L, 4L))
    val eq = frame.filter(col("s") === "a").arrange("x")
    assert(colLongs(eq, "x") == Seq(1L, 3L))
    val ne = frame.filter(col("s") =!= "a" && col("x") =!= 4).arrange("x")
    assert(colLongs(ne, "x") == Seq(2L))
  }

  test("in / notin -> isin (formula.nim heuristic ops)") {
    val r = frame.filter(col("s").isin("a", "c")).arrange("x")
    assert(colLongs(r, "x") == Seq(1L, 3L, 4L))
    val n = frame.filter(!col("s").isin("a", "c"))
    assert(colLongs(n, "x") == Seq(2L))
  }

  test("string & -> concat, $ -> cast string (README.org:162-204)") {
    val r = frame.transmute("t" -> concat(col("s"), lit("_"), col("x").cast(StringType)))
      .arrangeBy(col("t"))
    assert(colStrings(r, "t") == Seq("a_1", "a_3", "b_2", "c_4"))
  }

  test("if/elif/else -> when/otherwise (formula.nim:263-277; testDf.nim:1935)") {
    val r = frame.transmute("cls" ->
      when(col("x") < 2, lit("low"))
        .when(col("x") < 4, lit("mid"))
        .otherwise(lit("high")))
    assert(colStrings(r, "cls").sorted == Seq("high", "low", "mid", "mid"))
  }

  test("type-hint cast f{int -> float} (formula.nim:1271-1292)") {
    val r = frame.transmute("xf" -> col("x").cast(DoubleType))
    assert(r.df.schema.head.dataType == DoubleType)
    assert(colDoubles(r.arrangeBy(col("xf")), "xf") == Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("local-scope capture -> lit (testDf.nim:1896)") {
    val factor = 2.5
    val r = frame.transmute("scaled" -> (col("y") * lit(factor))).arrangeBy(col("scaled"))
    assert(colDoubles(r, "scaled") == Seq(25.0, 50.0, 75.0, 100.0))
  }

  test("reduce inside map: x / sum(x) (formulaExp.nim:438-485 lift; testDf.nim:2036)") {
    val r = frame.groupBy("s")
      .mutate("share" -> (col("y") / sum(col("y"))))
      .ungroup.arrange("x")
    assertAllClose(colDoubles(r, "share"), Seq(0.25, 1.0, 0.75, 1.0))
  }

  test("constant formula f{1 + 2} broadcasts (testDf.nim:1477)") {
    val r = frame.transmute("three" -> (lit(1) + lit(2)))
    assert(colLongs(r, "three") == Seq(3L, 3L, 3L, 3L))
  }

  test("nonexistent-key formula -> constant string column (testDf.nim:1475)") {
    val r = frame.transmute("k" -> lit("nonExistant"))
    assert(colStrings(r, "k").toSet == Set("nonExistant"))
  }

  test("element-wise function application (parseInt analog; testDf.nim:972-987)") {
    val df = toDf(spark)("z" -> Seq("1", "22", "333"))
    val r = df.transmute("n" -> col("z").cast(LongType)).arrangeBy(col("n"))
    assert(colLongs(r, "n") == Seq(1L, 22L, 333L))
  }

  test("whole-column reduce in summarize context (mean; testDf.nim:1211)") {
    val r = frame.summarize(
      "m" -> avg(col("y")), "mx" -> max(col("x")), "n" -> count(lit(1)))
    assert(colDoubles(r, "m") == Seq(25.0))
    assert(colLongs(r, "mx") == Seq(4L))
  }
}
