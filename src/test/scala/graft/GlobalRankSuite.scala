package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** Two-pass global rank: value parity with the naive single-partition
  * window (which is the semantics, just not an acceptable plan), tie
  * behavior across range-partition boundaries, empty input, and the plan
  * shape that makes it 100×-safe — range partitioning, never a
  * SinglePartition exchange, per-partition share bounded by the shuffle
  * fan-out instead of a partition-key's cardinality. */
class GlobalRankSuite extends SparkSpec {

  import spark.implicits._

  /** 400 rows over 7 input partitions with heavy ties (values 0..9 repeat
    * 40× each) — every tie group is larger than a naive even split, so any
    * tie straddling a range boundary would corrupt rank/dense_rank. */
  private def tied = spark.range(400)
    .select((col("id") % 10).as("v"), col("id").as("rid"))
    .repartition(7)

  /** Unique values — exercises the rank==dense_rank==row position case. */
  private def uniq = spark.range(1000)
    .select(((col("id") * 379) % 10007).as("v"), col("id").as("rid"))
    .repartition(5)

  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.orderBy(col("v"))
    df.withColumn("e_rnk", rank().over(w).cast("long"))
      .withColumn("e_drnk", dense_rank().over(w).cast("long"))
      .withColumn("e_prnk", percent_rank().over(w))
      .withColumn("e_cdist", cume_dist().over(w))
  }

  private def checkParity(df: org.apache.spark.sql.DataFrame): Unit = {
    val got = GlobalRank.withGlobalRanks(df, Seq(col("v")))
    val both = got.join(naive(df), "rid").collect()
    assert(both.length == df.count())
    both.foreach { r =>
      assert(r.getAs[Long]("rnk") == r.getAs[Long]("e_rnk"), s"rank: $r")
      assert(r.getAs[Long]("drnk") == r.getAs[Long]("e_drnk"), s"dense: $r")
      // exact ==, not epsilon: both sides are the same division of the
      // same exact integers — the operator's bit-exactness contract
      assert(r.getAs[Double]("prnk") == r.getAs[Double]("e_prnk"), s"pct: $r")
      assert(r.getAs[Double]("cdist") == r.getAs[Double]("e_cdist"), s"cume: $r")
    }
  }

  test("parity with single-partition window on tie-heavy data") {
    checkParity(tied)
  }

  test("parity with single-partition window on unique keys") {
    checkParity(uniq)
  }

  test("single-row and empty inputs") {
    val one = Seq((42L, 0L)).toDF("v", "rid")
    val r = GlobalRank.withGlobalRanks(one, Seq(col("v"))).collect()(0)
    assert(r.getAs[Long]("rnk") == 1L && r.getAs[Long]("drnk") == 1L)
    // SQL defines percent_rank of a 1-row frame as 0.0 (not 0/0)
    assert(r.getAs[Double]("prnk") == 0.0 && r.getAs[Double]("cdist") == 1.0)

    val empty = spark.emptyDataFrame.withColumn("v", lit(0L))
    val e = GlobalRank.withGlobalRanks(empty, Seq(col("v")))
    assert(e.count() == 0L)
    assert(e.columns.toSeq == Seq("v", "rnk", "drnk", "prnk", "cdist"))
  }

  test("plan: range-partitioned, no SinglePartition exchange anywhere") {
    val plan = GlobalRank.withGlobalRanks(uniq, Seq(col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), s"plan:\n$plan")
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
  }

  test("per-partition share is bounded by the range fan-out, not by key cardinality") {
    // the pass the operator actually runs: range-partition on the order
    // key. Explicit fan-out — on KB-sized test data AQE (correctly)
    // coalesces the default fan-out to one partition, which would test
    // the coalescer, not the range split
    val sizes = uniq.repartitionByRange(8, col("v"))
      .groupBy(spark_partition_id()).count()
      .collect().map(_.getLong(1))
    assert(sizes.length > 1, s"expected >1 range partitions, got ${sizes.toSeq}")
    val total = sizes.sum.toDouble
    // even split would be total/n; allow 4x sampling skew
    assert(sizes.max <= 4 * total / sizes.length,
      s"skewed range split: ${sizes.toSeq}")
  }
}
