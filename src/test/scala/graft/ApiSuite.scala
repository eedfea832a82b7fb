package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.{toDf, DataTable, FormulaName}

/** Tests for the groups iterator, row/slice accessors, pretty printer,
  * and lisp-style formula naming (SURVEY §2.2, §2.5, §2.9). */
class ApiSuite extends SparkSpec {

  test("groupsLocal yields ascending key order with sub-tables (groups iterator, dataframe.nim:1178-1240)") {
    val df = toDf(spark)(
      "g" -> Seq("b", "a", "b", "a", "c"),
      "v" -> Seq(1, 2, 3, 4, 5)).groupBy("g")
    val gs = df.groupsLocal
    assert(gs.map(_._1) == Seq(Seq("g" -> "a"), Seq("g" -> "b"), Seq("g" -> "c")))
    assert(colLongs(gs(0)._2.arrange("v"), "v") == Seq(2L, 4L))
    assert(colLongs(gs(2)._2, "v") == Seq(5L))
  }

  test("groupsLocal on two keys (testDf.nim:887-906 subgroup iteration)") {
    val df = toDf(spark)(
      "g1" -> Seq("a", "a", "b"), "g2" -> Seq(1, 2, 1), "v" -> Seq(10, 20, 30))
      .groupBy("g1").groupByAdd("g2")
    val gs = df.groupsLocal
    assert(gs.length == 3)
    assert(gs.map(_._1.map(_._2)) == Seq(Seq("a", 1L), Seq("a", 2L), Seq("b", 1L)))
  }

  test("mapGroupsRows: distributed per-group custom logic") {
    val df = toDf(spark)(
      "g" -> Seq("a", "a", "b", "b", "b"),
      "v" -> Seq(1, 2, 10, 20, 30)).groupBy("g")
    val out = df.mapGroupsRows(StructType(Seq(
      StructField("g", StringType), StructField("span", LongType)))) { (key, rows) =>
      val vs = rows.map(_.getAs[Long]("v")).toSeq
      Iterator(Row(key.getString(0), vs.max - vs.min))
    }.arrange("g")
    assert(colLongs(out, "span") == Seq(1L, 20L))
  }

  test("slice/rowAt under explicit order (df[a..b], dataframe.nim:153-262)") {
    val df = toDf(spark)("x" -> Seq(30, 10, 50, 20, 40))
    val s = df.slice(1, 3, Seq(col("x")))
    assert(colLongs(s.arrange("x"), "x") == Seq(20L, 30L, 40L))
    assert(df.rowAt(0, Seq(col("x"))).getLong(0) == 10L)
    assert(df.rowAt(4, Seq(col("x"))).getLong(0) == 50L)
  }

  test("construction with scalar broadcasts constants (testDf.nim:1729-1744)") {
    val df = toDf(spark)(
      "x" -> Seq(1, 2, 3), "y" -> Seq(5, 6, 7), "z" -> "foo", "alpha" -> 2.5)
    assert(df.df.count() == 3)
    assert(colLongs(df.arrange("x"), "x") == Seq(1L, 2L, 3L))
    assert(colStrings(df, "z").toSet == Set("foo"))
    assert(colDoubles(df, "alpha").toSet == Set(2.5))
    // the reference's `df["beta"] = 123` constant assignment — here a
    // lit() mutate; still one value everywhere at full length
    val withBeta = df.mutate("beta" -> lit(123))
    assert(colLongs(withBeta, "beta") == Seq(123L, 123L, 123L))
  }

  test("slicing a frame with a constant column keeps it aligned (testDf.nim:2072-2082)") {
    // Energy cycles 0..24 twice; Type is a scalar-broadcast constant.
    // Slice rows 24..26 under the construction order: the constant must
    // survive the slice at every row, like the reference's colConstant.
    val energy = (0 to 24) ++ (0 to 24)
    val df = toDf(spark)(
      "rowid" -> energy.indices.toSeq,
      "Energy" -> energy.toSeq,
      "Counts" -> energy.toSeq,
      "Type" -> "background")
    val s = df.slice(24, 26, Seq(col("rowid")))
    assert(s.df.count() == 3)
    assert(colLongs(s.arrange("rowid"), "Energy") == Seq(24L, 0L, 1L))
    assert(colStrings(s, "Type") == Seq("background", "background", "background"))
  }

  test("pretty prints shape, names, dtype row (dataframe.nim:823-874)") {
    val df = toDf(spark)("x" -> Seq(1, 2), "y" -> Seq(1.5, 2.5), "s" -> Seq("ab", "cd"))
    val p = df.pretty(5)
    val lines = p.linesIterator.toSeq
    assert(lines.head == "DataTable with 3 columns and 2 rows:")
    assert(lines(1).trim.split("\\s+").toSeq == Seq("Idx", "x", "y", "s"))
    assert(lines(2).trim.split("\\s+").toSeq == Seq("dtype:", "int", "float", "string"))
    assert(lines.length == 5)
  }

  test("lisp-style auto naming matches reference (formulaNameMacro.nim:92-95; testDf.nim:1468-1470)") {
    assert(FormulaName.lispName(lit(-1.0) * col("hwy")) == "(* -1.0 hwy)")
    assert(FormulaName.lispName(col("x") + col("y")) == "(+ x y)")
    assert(FormulaName.lispName(col("x") + col("y") * col("z")) == "(+ x (* y z))")
    assert(FormulaName.lispName(max(col("x"))) == "(max x)")
  }

  test("transmuteAuto names the produced column (testDf.nim:1468 dfNeg)") {
    val df = toDf(spark)("hwy" -> Seq(1.0, 2.0))
    val r = df.transmuteAuto(lit(-1.0) * col("hwy"))
    assert(r.columns == Seq("(* -1.0 hwy)"))
    // refer to the generated name positionally (it contains dots/parens
    // that col() would re-parse)
    assert(r.df.collect().map(_.getDouble(0)).toSet == Set(-1.0, -2.0))
  }
}
