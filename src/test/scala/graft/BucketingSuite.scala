package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.sources.{Bucketing, Tables}

/** Bucketed co-located joins: two tables bucketed on the join key must
  * join with ZERO shuffle exchanges — the storage-layout capability
  * that deletes (not just tunes) the dominant cost of repeated
  * large-large joins at 100 TB. */
class BucketingSuite extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("join of co-bucketed tables plans no shuffle and matches plain join") {
    val orders = Tables.df(spark, sfDir, "orders")
    val lineitem = Tables.df(spark, sfDir, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    // a fresh JVM has an empty in-memory catalog but the warehouse dir
    // persists on disk — drop both the table and any orphaned location
    Seq("graft_orders_b", "graft_lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Bucketing.writeBucketed(orders, "graft_orders_b", "o_orderkey", buckets = 4)
    Bucketing.writeBucketed(lineitem, "graft_lineitem_b", "o_orderkey", buckets = 4)

    val joined = Bucketing.read(spark, "graft_orders_b")
      .join(Bucketing.read(spark, "graft_lineitem_b"), Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("l_quantity"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty,
      s"expected a shuffle-free co-located join, found ${shuffles.length} exchanges")

    val plain = orders.join(lineitem, Seq("o_orderkey"))
      .select(col("o_orderkey"), col("o_totalprice"), col("l_quantity"))
    assert(joined.count() == plain.count())

    // bucketed grouped aggregation on the bucket key: also shuffle-free
    val agg = Bucketing.read(spark, "graft_lineitem_b")
      .groupBy("o_orderkey").agg(sum("l_quantity").as("q"))
    val aggShuffles = agg.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(aggShuffles.isEmpty, "bucketed groupBy should not shuffle")
  }
}
