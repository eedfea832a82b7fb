package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.{toDf, DataTable, ValueColumn => V}

/** Tagged-variant Value column tests mirroring the reference's Value
  * semantics (`value.nim`; testDf.nim object-column blocks). */
class ValueSuite extends SparkSpec {

  test("toValue wraps typed columns; nulls become VNull (value.nim:4-25)") {
    val df = toDf(spark)("x" -> Seq[Any](1, 2, null)).df
      .withColumn("v", V.toValue(col("x"), LongType))
    val tags = df.select(col("v.tag")).collect().map(_.getInt(0)).toSeq
    assert(tags == Seq(V.TagInt, V.TagInt, V.TagNull))
  }

  test("VNull == VNull is true; int/float compare numerically (value.nim:410-442)") {
    val df = spark.sql("SELECT 1 AS one")
    def v(c: org.apache.spark.sql.Column, t: DataType) = V.toValue(c, t)
    val r = df.select(
      V.valueEq(V.vnull, V.vnull).as("nn"),
      V.valueEq(v(lit(3), LongType), v(lit(3.0), DoubleType)).as("if_eq"),
      V.valueEq(v(lit(3), LongType), v(lit(3.5), DoubleType)).as("if_ne"),
      V.valueEq(v(lit("3"), StringType), v(lit(3), LongType)).as("str_num"),
      V.valueEq(v(lit("a"), StringType), v(lit("a"), StringType)).as("ss")).head()
    assert(r.getBoolean(0))       // VNull == VNull
    assert(r.getBoolean(1))       // 3 == 3.0 across kinds
    assert(!r.getBoolean(2))      // 3 != 3.5
    assert(!r.getBoolean(3))      // string "3" != int 3 (different kinds)
    assert(r.getBoolean(4))
  }

  test("mixed bind_rows via promote keeps type tags (dataframe.nim:978-996)") {
    val a = toDf(spark)("k" -> Seq(1, 2), "x" -> Seq(10, 20)).df
    val b = toDf(spark)("k" -> Seq(3, 4), "x" -> Seq("ten", "twenty")).df
    val merged = V.promote(a, Seq("x"))
      .unionByName(V.promote(b, Seq("x")))
    assert(merged.schema("x").dataType == V.ValueType)
    val tags = merged.orderBy("k").select(col("x.tag")).collect().map(_.getInt(0)).toSeq
    assert(tags == Seq(V.TagInt, V.TagInt, V.TagString, V.TagString))
    // stringified view reads both kinds
    val strs = merged.orderBy("k").select(V.asString(col("x"))).collect().map(_.getString(0)).toSeq
    assert(strs == Seq("10", "20", "ten", "twenty"))
  }

  test("sortKey orders null, numerics, lexicals (value.nim:464-503, documented key divergence)") {
    val a = toDf(spark)("k" -> Seq(1, 2, 3), "x" -> Seq(5, 1, 9)).df
    val b = toDf(spark)("k" -> Seq(4, 5), "x" -> Seq("b", "a")).df
    val merged = V.promote(a, Seq("x")).unionByName(V.promote(b, Seq("x")))
      .unionByName(toDf(spark)("k" -> Seq(6)).df.withColumn("x", V.vnull)
        .select("k", "x"))
    val ks = merged.orderBy(V.sortKey(col("x")), col("k"))
      .select("k").collect().map(_.getLong(0)).toSeq
    assert(ks == Seq(6L, 2L, 1L, 3L, 5L, 4L)) // null, 1, 5, 9, "a", "b"
  }

  test("toNative demotes single-kind Value columns, raises on mixed (testDf.nim:1571-1608)") {
    val ints = toDf(spark)("x" -> Seq(1, 2, 3)).df
    val intsV = V.promote(ints, Seq("x"))
    val back = V.toNative(intsV, "x")
    assert(back.schema("x").dataType == LongType)
    assert(back.orderBy("x").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))

    val mixed = V.promote(toDf(spark)("x" -> Seq(1, 2)).df, Seq("x"))
      .unionByName(V.promote(toDf(spark)("x" -> Seq("a")).df, Seq("x")))
    intercept[IllegalArgumentException] { V.toNative(mixed, "x") }
  }

  test("Value columns group and join like any column") {
    val df = V.promote(toDf(spark)("x" -> Seq(1, 1, 2), "n" -> Seq(1, 1, 1)).df, Seq("x"))
    val counts = df.groupBy("x").count().orderBy(V.sortKey(col("x")))
      .select("count").collect().map(_.getLong(0)).toSeq
    assert(counts == Seq(2L, 1L))
  }
}
