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

  test("joinAsOf matches a brute-force reference on pseudo-random data") {
    // deterministic pseudo-random workload (fixed seed): 3 keys, dense
    // timestamp collisions to stress ties and empty keys
    val rnd = new scala.util.Random(20260812L)
    val leftRows = (0 until 300).map(i =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(50).toLong, i.toLong))
    val rightRows = (0 until 200).map(i =>
      (s"k${rnd.nextInt(3)}", rnd.nextInt(50).toLong, 1000L + i))
    val left = toDf(spark)(
      "k" -> leftRows.map(_._1), "lts" -> leftRows.map(_._2),
      "lid" -> leftRows.map(_._3)).df
    val right = toDf(spark)(
      "k" -> rightRows.map(_._1), "rts" -> rightRows.map(_._2),
      "pay" -> rightRows.map(_._3)).df
    val got = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts", Seq("pay"),
      rightTieBreak = col("pay"))
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("lid"),
        Option(r.getAs[Any]("asof_pay")).map(_.asInstanceOf[Long]))).toSet
    val want = leftRows.map { case (k, lts, lid) =>
      val candidates = rightRows.filter(r => r._1 == k && r._2 <= lts)
      val best = if (candidates.isEmpty) None
        else Some(candidates.maxBy(r => (r._2, r._3))._3) // latest ts, then max tiebreak
      (k, lid, best)
    }.toSet
    assert(got == want)
  }

  test("forward direction picks smallest right ts >= left ts; inclusive") {
    val left = toDf(spark)(
      "k" -> Seq("a", "a", "a", "b"),
      "lts" -> Seq(5, 10, 20, 1),
      "lid" -> Seq(1, 2, 3, 4)).df
    val right = toDf(spark)(
      "k" -> Seq("a", "a", "a"),
      "rts" -> Seq(3, 10, 15),
      "pay" -> Seq(30, 100, 150)).df
    val r = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts", Seq("pay"),
      direction = "forward")
      .orderBy("lid")
      .collect().map(x => (x.getLong(2),
        Option(x.get(3)).map(_.asInstanceOf[Long]),
        Option(x.get(4)).map(_.asInstanceOf[Long]))).toSeq
    assert(r == Seq(
      (1L, Some(10L), Some(100L)),  // lts=5  -> next rts=10
      (2L, Some(10L), Some(100L)),  // lts=10 -> rts=10 (inclusive)
      (3L, None, None),             // lts=20: nothing after
      (4L, None, None)))
  }

  test("forward matches a brute-force reference, greatest tiebreak on ties") {
    val rnd = new scala.util.Random(20260813L)
    val leftRows = (0 until 300).map(i =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(50).toLong, i.toLong))
    val rightRows = (0 until 200).map(i =>
      (s"k${rnd.nextInt(3)}", rnd.nextInt(50).toLong, 1000L + i))
    val left = toDf(spark)(
      "k" -> leftRows.map(_._1), "lts" -> leftRows.map(_._2),
      "lid" -> leftRows.map(_._3)).df
    val right = toDf(spark)(
      "k" -> rightRows.map(_._1), "rts" -> rightRows.map(_._2),
      "pay" -> rightRows.map(_._3)).df
    val got = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts", Seq("pay"),
      rightTieBreak = col("pay"), direction = "forward")
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("lid"),
        Option(r.getAs[Any]("asof_pay")).map(_.asInstanceOf[Long]))).toSet
    val want = leftRows.map { case (k, lts, lid) =>
      val candidates = rightRows.filter(r => r._1 == k && r._2 >= lts)
      val best = if (candidates.isEmpty) None
        else Some(candidates.minBy(r => (r._2, -r._3))._3) // earliest ts, max tiebreak
      (k, lid, best)
    }.toSet
    assert(got == want)
  }

  test("tolerance nulls matches farther than the bound, both directions") {
    val left = toDf(spark)(
      "k" -> Seq("a", "a"), "lts" -> Seq(10, 30), "lid" -> Seq(1, 2)).df
    val right = toDf(spark)(
      "k" -> Seq("a", "a"), "rts" -> Seq(7, 35), "pay" -> Seq(70, 350)).df
    val back = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts", Seq("pay"),
      tolerance = Some(3L)).orderBy("lid").collect()
      .map(x => Option(x.get(4)).map(_.asInstanceOf[Long])).toSeq
    assert(back == Seq(Some(70L), None)) // 10-7=3 ok; 30-7=23 too stale
    val fwd = AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts", Seq("pay"),
      direction = "forward", tolerance = Some(5L)).orderBy("lid").collect()
      .map(x => Option(x.get(4)).map(_.asInstanceOf[Long])).toSeq
    assert(fwd == Seq(None, Some(350L))) // 35-10=25 too far; 35-30=5 ok
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

  test("joinAsOf rejects a payload column literally named ts") {
    // regression: the internal match struct used to name its time field
    // "ts", so a payload column "ts" silently made getField("ts")
    // ambiguous; it would also collide with the carried asof_ts output
    // column, so it is rejected up front with a clear message
    val left = toDf(spark)("k" -> Seq("a"), "lts" -> Seq(10), "lid" -> Seq(1)).df
    val right = toDf(spark)(
      "k" -> Seq("a"), "rts" -> Seq(7), "ts" -> Seq(777)).df
    val e = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(left, right, Seq("k"), "lts", "rts", Seq("ts"))
    }
    assert(e.getMessage.contains("rename"))
  }
}
