package graft

import org.apache.spark.sql.functions._
import graft.api.toDf
import graft.operators.Sessionize

/** Sessionization and salted-join tests (beyond-reference operators). */
class SessionSuite extends SparkSpec {

  test("withSessionId splits on gaps per user") {
    val df = toDf(spark)(
      "user" -> Seq(1, 1, 1, 1, 2, 2),
      "t" -> Seq(0L, 10L, 100L, 105L, 0L, 200L),
      "id" -> Seq(1, 2, 3, 4, 5, 6))
    val r = graft.api.DataTable(
      Sessionize.withSessionId(df.df, "user", "t", gapTicks = 50L, tieBreak = col("id")))
      .arrange("user", "t")
    assert(colLongs(r, "session_id") == Seq(0L, 0L, 1L, 1L, 0L, 1L))
  }

  test("sessionStats aggregates count and span") {
    val df = toDf(spark)(
      "user" -> Seq(1, 1, 1),
      "t" -> Seq(0L, 10L, 1000L),
      "id" -> Seq(1, 2, 3))
    val r = graft.api.DataTable(
      Sessionize.sessionStats(df.df, "user", "t", gapTicks = 100L,
        tieBreak = col("id"), ticksPerSecond = 10.0))
      .arrange("user", "session_id")
    assert(colLongs(r, "n_events") == Seq(2L, 1L))
    assert(colDoubles(r, "span_s") == Seq(1.0, 0.0))
  }

  test("innerJoinSalted returns exactly the plain join result") {
    val l = toDf(spark)(
      "k" -> Seq("a", "a", "a", "b"), "x" -> Seq(1, 2, 3, 4))
    val r = toDf(spark)("k" -> Seq("a", "b"), "y" -> Seq(10, 20))
    val plain = l.innerJoin(r, by = Seq("k")).arrange("x")
    val salted = l.innerJoinSalted(r, by = Seq("k"), saltBuckets = 4).arrange("x")
    assert(salted.df.columns.sorted.sameElements(plain.df.columns.sorted))
    assert(colLongs(salted, "x") == colLongs(plain, "x"))
    assert(colLongs(salted, "y") == colLongs(plain, "y"))
  }
}
