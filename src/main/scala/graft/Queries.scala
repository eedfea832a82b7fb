package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.Tables

/** The driver-verified query inventory: one entry per operator from
  * SURVEY.md §2, each expressed through the graft verb layer, plus a DuckDB
  * oracle where SQL-expressible.
  *
  * Oracle-parity rules used throughout (floats are only bit-stable when the
  * arithmetic is order-insensitive):
  *   - sums over integral-valued doubles (l_quantity) are exact in any order;
  *   - money sums go through `round(x*100) → long` so the reduction is exact
  *     integer arithmetic, then one final division (same IEEE op both sides);
  *   - per-row arithmetic (no reduction) is bit-identical given the same
  *     parquet input, so raw expressions are safe outside aggregates;
  *   - every query ends in a total ORDER BY so row order is deterministic.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  private def lineitem(s: SparkSession, dir: String) = Tables(s, dir, "lineitem")
  private def orders(s: SparkSession, dir: String) = Tables(s, dir, "orders")
  private def customer(s: SparkSession, dir: String) = Tables(s, dir, "customer")
  private def part(s: SparkSession, dir: String) = Tables(s, dir, "part")
  private def supplier(s: SparkSession, dir: String) = Tables(s, dir, "supplier")
  private def nation(s: SparkSession, dir: String) = Tables(s, dir, "nation")
  private def region(s: SparkSession, dir: String) = Tables(s, dir, "region")

  /** Exact money sum: per-row round to cents (identical double → identical
    * cents both engines), integer-sum (order-insensitive), one division. */
  private def moneySum(c: org.apache.spark.sql.Column) =
    sum(round(c * lit(100.0), 0).cast("long")) / lit(100.0)

  val all: Map[String, Q] = Map(

    // select + rename (dataframe.nim:1403-1443)
    "q_select" -> ((s: SparkSession, dir: String) =>
      part(s, dir)
        .selectCols(col("p_partkey"), col("p_name"), col("p_retailprice").as("retail"))
        .arrange("p_partkey").df),

    // filter: AND of predicates (dataframe.nim:1280-1385)
    "q_filter" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .filter(col("l_quantity") < 10, col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .arrange("l_orderkey", "l_linenumber").df),

    // mutate: computed columns (dataframe.nim:1674-1767)
    "q_mutate" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .mutate(
          "disc_price" -> col("l_extendedprice") * (lit(1.0) - col("l_discount")),
          "charge" -> (col("l_extendedprice") * (lit(1.0) - col("l_discount"))) * (lit(1.0) + col("l_tax")))
        .select("l_orderkey", "l_linenumber", "disc_price", "charge")
        .arrange("l_orderkey", "l_linenumber").df),

    // transmute: keep only computed columns (dataframe.nim:1777-1819)
    "q_transmute" -> ((s: SparkSession, dir: String) =>
      orders(s, dir)
        .transmute(
          "okey" -> col("o_orderkey"),
          "price_bucket" -> floor(col("o_totalprice") / lit(10000.0)))
        .arrange("okey").df),

    // grouped summarize (dataframe.nim:2037-2101) — TPC-H Q1 shape
    "q_summarize" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .summarize(
          "sum_qty" -> sum(col("l_quantity")),
          "avg_qty" -> sum(col("l_quantity")) / count(lit(1)),
          "sum_base" -> moneySum(col("l_extendedprice")),
          "sum_disc_price" -> moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          "n_rows" -> count(lit(1)),
          "n_orders" -> countDistinct(col("l_orderkey")))
        .df),

    // ungrouped summarize → single row (dataframe.nim:2056-2071)
    "q_summarize_scalar" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .summarize(
          "min_qty" -> min(col("l_quantity")),
          "max_qty" -> max(col("l_quantity")),
          "n" -> count(lit(1)))
        .df),

    // count verb (dataframe.nim:2103-2138)
    "q_count" -> ((s: SparkSession, dir: String) =>
      orders(s, dir).countRows(Seq("o_orderpriority")).df),

    // grouped mutate: aggregate inside a mapping formula → window rewrite
    // (dataframe.nim:1708-1722; formulaExp.nim:438-485)
    "q_grouped_mutate" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .groupBy("l_returnflag")
        .mutate("dev" -> (col("l_quantity") - avg(col("l_quantity"))))
        .ungroup
        .select("l_orderkey", "l_linenumber", "l_returnflag", "dev")
        .arrange("l_orderkey", "l_linenumber").df),

    // grouped filter: whole-group predicate (dataframe.nim:1373-1385)
    "q_grouped_filter" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .groupBy("l_orderkey")
        .filter(col("l_quantity") === max(col("l_quantity")))
        .ungroup
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .arrange("l_orderkey", "l_linenumber").df),

    // arrange multi-key + head → distributed top-k (dataframe.nim:1529-1657)
    "q_arrange_head" -> ((s: SparkSession, dir: String) =>
      orders(s, dir)
        .arrangeBy(col("o_totalprice").desc, col("o_orderkey"))
        .head(100)
        .select("o_orderkey", "o_totalprice").df)
  )

  val oracles: Map[String, String] = Map(

    "q_select" ->
      """SELECT p_partkey, p_name, p_retailprice AS retail
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity < 10 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_mutate" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS disc_price,
        |  (l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS charge
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_transmute" ->
      """SELECT o_orderkey AS okey,
        |  FLOOR(o_totalprice / 10000.0) AS price_bucket
        |FROM orders ORDER BY okey""".stripMargin,

    "q_summarize" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  SUM(l_quantity) / COUNT(*) AS avg_qty,
        |  SUM(CAST(ROUND(l_extendedprice * 100.0, 0) AS BIGINT)) / 100.0 AS sum_base,
        |  SUM(CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 100.0, 0) AS BIGINT)) / 100.0 AS sum_disc_price,
        |  COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_summarize_scalar" ->
      """SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        |  COUNT(*) AS n
        |FROM lineitem""".stripMargin,

    "q_count" ->
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_grouped_mutate" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  l_quantity - (SUM(l_quantity) OVER (PARTITION BY l_returnflag))
        |               / (COUNT(*) OVER (PARTITION BY l_returnflag)) AS dev
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_grouped_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    MAX(l_quantity) OVER (PARTITION BY l_orderkey) AS mq
        |  FROM lineitem) WHERE l_quantity = mq
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_arrange_head" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin
  )
}
