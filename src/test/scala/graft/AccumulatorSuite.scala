package graft

import org.apache.spark.sql.functions._
import graft.api.toDf
import graft.functions.Accumulators

/** Custom Aggregator/udaf surface mirroring the reference's accumulator
  * formula tests (`testsFormula.nim:451-496`), plus the new small verbs
  * (addRow, filterToIdx, toHtml/toOrgTable).
  */
class AccumulatorSuite extends SparkSpec {

  test("custom reduction += (testsFormula.nim:452-464 'Bsum')") {
    val df = toDf(spark)("B" -> Seq(1, 2))
    val r = df.summarize("Bsum" -> Accumulators.foldLong(0L)(_ + _)(col("B")))
    assert(colLongs(r, "Bsum") == Seq(3L))
  }

  test("custom reduction *= (testsFormula.nim:466-476 'Bprod')") {
    val df = toDf(spark)("B" -> Seq(1, 2))
    val r = df.summarize("Bprod" -> Accumulators.productLong(col("B")))
    assert(colLongs(r, "Bprod") == Seq(2L))
  }

  test("custom reduction distributes over groups (formula: block per subgroup)") {
    val df = toDf(spark)("g" -> Seq("a", "a", "b", "b", "b"), "x" -> Seq(2, 3, 1, 2, 4))
    val r = df.groupBy("g").summarize("prod" -> Accumulators.productLong(col("x")))
    assert(colStrings(r, "g") == Seq("a", "b"))
    assert(colLongs(r, "prod") == Seq(6L, 8L))
  }

  test("declarative product pinned identical to the Aggregator fold") {
    // Scale path (ProductLong DeclarativeAggregate) vs general mechanism
    // (Aggregator+udaf): same groups, same products — including a value
    // pair that overflows Long (both wrap, non-ANSI Multiply == Scala *).
    val df = toDf(spark)(
      "g" -> Seq("a", "a", "b", "b", "c", "c"),
      "x" -> Seq(3L, 5L, Long.MaxValue, 2L, -4L, 7L))
    val fast = df.groupBy("g").summarize("p" -> Accumulators.productLong(col("x")))
    val fold = df.groupBy("g").summarize("p" -> Accumulators.productLongFold(col("x")))
    assert(colLongs(fast, "p") == colLongs(fold, "p"))
    assert(colLongs(fast, "p") == Seq(15L, -2L, -28L))
  }

  test("product null semantics: declarative skips (SQL), primitive fold reads 0") {
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(3L)), ("a", None), ("a", Some(5L))).toDF("g", "x")
    val decl = df.groupBy("g").agg(Accumulators.productLong(col("x")).as("p"))
      .collect().head.getLong(1)
    val fold = df.groupBy("g").agg(Accumulators.productLongFold(col("x")).as("p"))
      .collect().head.getLong(1)
    assert(decl == 15L) // nulls skipped, like DuckDB product()
    assert(fold == 0L)  // primitive encoder reads null as 0 — documented
  }

  test("product of an all-null group (and empty input) is NULL like SQL aggregates") {
    import org.apache.spark.sql.functions.{col, lit}
    val s = spark
    import s.implicits._
    val df = Seq(("a", Some(3L)), ("b", None), ("b", None)).toDF("g", "x")
    val rows = df.groupBy("g").agg(Accumulators.productLong(col("x")).as("p"))
      .orderBy("g").collect()
    assert(rows(0).getLong(1) == 3L)
    assert(rows(1).isNullAt(1)) // no non-null input -> NULL, not identity 1
    val empty = df.filter(lit(false))
      .agg(Accumulators.productLong(col("x")).as("p")).collect().head
    assert(empty.isNullAt(0))
  }

  test("declarative product plans as HashAggregate, not ObjectHashAggregate") {
    val df = toDf(spark)("g" -> Seq("a", "b"), "x" -> Seq(2L, 3L))
    val plan = df.groupBy("g").summarize("p" -> Accumulators.productLong(col("x")))
      .df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"))
    assert(!plan.contains("ObjectHashAggregate"))
  }

  test("weighted mean with 2-field buffer (Aggregator[IN,BUF,OUT])") {
    val df = toDf(spark)("v" -> Seq(1.0, 3.0), "w" -> Seq(1.0, 3.0))
    val r = df.summarize("wm" -> Accumulators.weightedMean(col("v"), col("w")))
    assertAllClose(colDoubles(r, "wm"), Seq(2.5))
  }

  test("addRow appends coerced row (dataframe.nim:762-821)") {
    val df = toDf(spark)("x" -> Seq(1, 2), "s" -> Seq("a", "b"))
    val r = df.addRow(3, "c").arrange("x")
    assert(colLongs(r, "x") == Seq(1L, 2L, 3L))
    assert(colStrings(r, "s") == Seq("a", "b", "c"))
  }

  test("filterToIdx selects rows by position under order (dataframe.nim:1299-1319)") {
    val df = toDf(spark)("x" -> Seq(30, 10, 50, 20, 40))
    val r = df.filterToIdx(Seq(0, 2, 4), Seq(col("x")))
    assert(colLongs(r.arrange("x"), "x") == Seq(10L, 30L, 50L))
  }

  test("toHtml/toOrgTable render header and rows (io.nim:866-939)") {
    val df = toDf(spark)("x" -> Seq(1), "s" -> Seq("a<b"))
    val html = df.toHtml()
    assert(html.contains("<th>x</th>") && html.contains("<td>a&lt;b</td>"))
    val org = df.toOrgTable()
    assert(org.linesIterator.next() == "| x | s |")
    assert(org.contains("| 1 | a<b |"))
  }

  test("showBrowser writes a standalone page and survives headless (io.nim:895-917)") {
    val df = toDf(spark)("x" -> Seq(1), "s" -> Seq("a<b"))
    val dir = java.nio.file.Files.createTempDirectory("graft-browser").toString
    val path = df.showBrowser(fname = "t.html", dir = dir, title = "spec")
    val page = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(page.startsWith("<!DOCTYPE html>"))
    assert(page.contains("<td>a&lt;b</td>") && page.contains("spec</title>"))
  }
}
