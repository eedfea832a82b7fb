package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Blocklist

/** Blocklist filtering: broadcast anti/semi join semantics, the
  * NULL-key-kept contract, the blockCol rename path, and the plan shape
  * that makes it 100×-safe (map-side BroadcastHashJoin — the corpus side
  * never shuffles). */
class BlocklistSuite extends SparkSpec {

  private def corpus = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("source", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "good.com"), Row(2L, "spam.com"), Row(3L, "ok.org"),
        Row(4L, null), Row(5L, "spam.com"), Row(6L, "bad.net")),
      schema)
  }

  private def deny = {
    val schema = StructType(Seq(StructField("source", StringType)))
    spark.createDataFrame(
      java.util.Arrays.asList(Row("spam.com"), Row("bad.net"), Row(null)),
      schema)
  }

  test("filterBlocklist drops listed keys, keeps the rest") {
    val kept = Blocklist.filterBlocklist(corpus, deny, "source")
      .orderBy("id").select("id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 3L, 4L))
  }

  test("NULL corpus key is KEPT by the anti join (the sane dirty-data answer, unlike NOT IN)") {
    val kept = Blocklist.filterBlocklist(corpus, deny, "source")
      .filter(col("source").isNull).select("id").collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(4L))
    // and a NULL in the deny list (present above) does not nuke every row,
    // which is exactly what `source NOT IN (SELECT ...)` would do
    assert(Blocklist.filterBlocklist(corpus, deny, "source").count() == 3L)
  }

  test("matchBlocklist is the exact complement on non-null keys") {
    val blocked = Blocklist.matchBlocklist(corpus, deny, "source")
      .orderBy("id").select("id").collect().map(_.getLong(0)).toSeq
    assert(blocked == Seq(2L, 5L, 6L))
  }

  test("blockCol rename path joins on the renamed key") {
    val denyRenamed = deny.withColumnRenamed("source", "domain")
    val kept = Blocklist.filterBlocklist(corpus, denyRenamed, "source", "domain")
      .orderBy("id").select("id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 3L, 4L))
  }

  test("plan: broadcast LeftAnti / LeftSemi hash join — corpus side never shuffles") {
    val anti = Blocklist.filterBlocklist(corpus, deny, "source")
      .queryExecution.executedPlan.toString
    assert(anti.contains("BroadcastHashJoin"), s"anti plan:\n$anti")
    assert(anti.contains("LeftAnti"), s"anti plan:\n$anti")
    assert(!anti.contains("SortMergeJoin"), s"anti plan:\n$anti")
    val semi = Blocklist.matchBlocklist(corpus, deny, "source")
      .queryExecution.executedPlan.toString
    assert(semi.contains("BroadcastHashJoin") && semi.contains("LeftSemi"),
      s"semi plan:\n$semi")
  }
}
