package graft

import org.apache.spark.sql.functions._
import graft.api.toDf
import graft.operators.AsOf

/** As-of join edge semantics: inclusive equal-ts match, right-tie
  * resolution, and left-join nulls when no prior row exists. */
class AsOfSuite extends SparkSpec {

  test("joinAsOf picks greatest right ts <= left ts; inclusive; null when none") {
    val left = toDf(spark)(
      "k" -> Seq("a", "a", "a", "b"),
      "lts" -> Seq(5, 10, 20, 1),
      "lid" -> Seq(1, 2, 3, 4)).df
    val right = toDf(spark)(
      "k" -> Seq("a", "a", "a"),
      "rts" -> Seq(3, 10, 15),
      "pay" -> Seq(30, 100, 150)).df
    val r = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts", Seq("pay"))
      .orderBy("lid")
      .collect().map(x => (x.getLong(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Long]))).toSeq
    assert(r == Seq(
      (1L, Some(3L), Some(30L)),    // lts=5  -> rts=3
      (2L, Some(10L), Some(100L)),  // lts=10 -> rts=10 (inclusive)
      (3L, Some(15L), Some(150L)),  // lts=20 -> rts=15
      (4L, None, None)))            // key b: no right rows at all
  }

  test("joinAsOf resolves right-ts ties by greatest tiebreak") {
    val left = toDf(spark)("k" -> Seq("a"), "lts" -> Seq(10), "lid" -> Seq(1)).df
    val right = toDf(spark)(
      "k" -> Seq("a", "a"),
      "rts" -> Seq(7, 7),
      "pay" -> Seq(70, 71)).df
    val r = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts", Seq("pay"),
      rightTieBreak = col("pay"))
      .head()
    assert(r.getAs[Long]("asof_pay") == 71L)
  }
}
