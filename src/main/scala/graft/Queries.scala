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

  lazy val all: Map[String, Q] = core ++ relational

  private val core: Map[String, Q] = Map(

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

  /** Joins / set ops / reshape / windows (SURVEY.md §2.4, §2.7, §2.8). */
  private val relational: Map[String, Q] = Map(

    // equi inner join, small side broadcast (dataframe.nim:1885-1992)
    "q_inner_join" -> ((s: SparkSession, dir: String) =>
      orders(s, dir)
        .innerJoin(
          customer(s, dir).rename("o_custkey" -> "c_custkey"),
          by = Seq("o_custkey"), broadcastRight = true)
        .selectCols(col("o_orderkey"), col("o_totalprice"),
          col("c_name"), col("c_mktsegment"))
        .arrange("o_orderkey").df),

    // colliding non-key columns → _left/_right (CommonColumnMerge ccRename,
    // dataframe.nim:1857-1883)
    "q_join_common_cols" -> ((s: SparkSession, dir: String) => {
      val l = orders(s, dir).select("o_orderkey", "o_totalprice")
      val r = orders(s, dir).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_totalprice")
      l.innerJoin(r, by = Seq("o_orderkey"), merge = CcRename)
        .arrange("o_orderkey").df
    }),

    // multi-way join + grouped agg (TPC-H Q3/Q5 shape; the reference folds
    // innerJoin varargs, dataframe.nim:1994-2005)
    "q_multi_join" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .rename("o_orderkey" -> "l_orderkey")
        .innerJoin(orders(s, dir).select("o_orderkey", "o_custkey"),
          by = Seq("o_orderkey"))
        .rename("c_custkey" -> "o_custkey")
        .innerJoin(customer(s, dir).select("c_custkey", "c_mktsegment"),
          by = Seq("c_custkey"), broadcastRight = true)
        .groupBy("c_mktsegment")
        .summarize(
          "revenue" -> moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          "n_items" -> count(lit(1)))
        .df),

    // semi / anti joins (beyond-reference; SURVEY.md §2.4 extension row)
    "q_semi_join" -> ((s: SparkSession, dir: String) =>
      customer(s, dir).rename("o_custkey" -> "c_custkey")
        .join(orders(s, dir), by = Seq("o_custkey"), how = "left_semi")
        .selectCols(col("o_custkey").as("c_custkey"), col("c_name"))
        .arrange("c_custkey").df),

    "q_anti_join" -> ((s: SparkSession, dir: String) =>
      customer(s, dir).rename("o_custkey" -> "c_custkey")
        .join(orders(s, dir), by = Seq("o_custkey"), how = "left_anti")
        .selectCols(col("o_custkey").as("c_custkey"), col("c_name"))
        .arrange("c_custkey").df),

    // bind_rows by name with null fill + provenance id (dataframe.nim:926-1040)
    "q_bind_rows" -> ((s: SparkSession, dir: String) => {
      val a = customer(s, dir).select("c_custkey", "c_name")
      val b = customer(s, dir).filter(col("c_acctbal") > 5000)
        .select("c_custkey", "c_acctbal")
      a.bindRows(Seq("a" -> a, "b" -> b), idCol = "src")
        .arrange("src", "c_custkey").df
    }),

    // setDiff (dataframe.nim:2140-2195)
    "q_setdiff" -> ((s: SparkSession, dir: String) => {
      val base = orders(s, dir).select("o_orderkey", "o_orderstatus", "o_totalprice")
      val f = base.filter(col("o_orderstatus") === "F")
      base.setDiff(f).arrange("o_orderkey").df
    }),

    // intersect (beyond-reference; SURVEY.md §2.7)
    "q_intersect" -> ((s: SparkSession, dir: String) => {
      val big = orders(s, dir).filter(col("o_totalprice") > 100000).select("o_orderkey")
      val open = orders(s, dir).filter(col("o_orderstatus") === "O").select("o_orderkey")
      big.intersect(open).arrange("o_orderkey").df
    }),

    // unique keep-first under explicit order (dataframe.nim:2370-2422)
    "q_unique_first" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        // (l_orderkey, l_linenumber) is not unique in the synthetic data —
        // the keep-first order must be total for a deterministic result.
        .uniqueFirstBy(Seq("l_orderkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .arrange("l_orderkey").df),

    // distinct on projected columns (unique, dataframe.nim:2347-2368)
    "q_distinct" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .select("l_returnflag", "l_linestatus")
        .unique()
        .arrange("l_returnflag", "l_linestatus").df),

    // gather: wide→long (dataframe.nim:2205-2259)
    "q_gather" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax")
        .gather(Seq("l_quantity", "l_discount", "l_tax"), "measure", "value")
        .arrange("l_orderkey", "l_linenumber", "measure").df),

    // spread: long→wide via pivot with pinned values (dataframe.nim:2261-2345)
    "q_spread" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .countRows(Seq("l_returnflag", "l_linestatus"))
        .spread("l_linestatus", "n", values = Seq("F", "O"))
        .df),

    // lag over explicit order, partitioned per user (column.nim:1177-1213)
    "q_lag" -> ((s: SparkSession, dir: String) =>
      Tables(s, dir, "events")
        .withLag("prev_value", col("value"), 1,
          order = Seq(col("ts"), col("event_id")), partitionBy = Seq("user_id"))
        .select("event_id", "user_id", "value", "prev_value")
        .arrange("event_id").df),

    // masked update df[cond, k] = v (dataframe.nim:344-370)
    "q_masked_update" -> ((s: SparkSession, dir: String) =>
      orders(s, dir)
        .maskedUpdate(col("o_totalprice") > 50000, "o_orderpriority", lit("HIGH"))
        .select("o_orderkey", "o_orderpriority")
        .arrange("o_orderkey").df),

    // drop_null after ragged concat (dataframe.nim:2424-2465)
    "q_drop_null" -> ((s: SparkSession, dir: String) => {
      val a = customer(s, dir).select("c_custkey", "c_name")
      val b = customer(s, dir).filter(col("c_acctbal") > 5000)
        .select("c_custkey", "c_acctbal")
      a.bindRows(Seq("a" -> a, "b" -> b), idCol = "src")
        .dropNull("c_acctbal")
        .arrange("src", "c_custkey").df
    }),

    // colMin/colMax ignoring ±Inf (dataframe.nim:886-924)
    "q_colminmax" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .summarize(
          "min_price" -> min(when(!(col("l_extendedprice") === Double.PositiveInfinity ||
            col("l_extendedprice") === Double.NegativeInfinity), col("l_extendedprice"))),
          "max_price" -> max(when(!(col("l_extendedprice") === Double.PositiveInfinity ||
            col("l_extendedprice") === Double.NegativeInfinity), col("l_extendedprice"))))
        .df),

    // tail under explicit order (dataframe.nim:2197-2203)
    "q_tail" -> ((s: SparkSession, dir: String) =>
      orders(s, dir)
        .tailBy(10, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .arrange("o_orderkey").df),

    // deterministic shuffle + sample (dataframe.nim:2497-2521) — rows-only
    // check: RNG differs across engines by design.
    "q_sample" -> ((s: SparkSession, dir: String) =>
      orders(s, dir).randomHead(100, seed = 42).select("o_orderkey").df)
  )

  lazy val oracles: Map[String, String] = coreOracles ++ relationalOracles

  private val coreOracles: Map[String, String] = Map(

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

  private val relationalOracles: Map[String, String] = Map(

    "q_inner_join" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_common_cols" ->
      """SELECT a.o_orderkey,
        |  a.o_totalprice AS o_totalprice_left,
        |  b.o_totalprice AS o_totalprice_right
        |FROM orders a
        |JOIN (SELECT o_orderkey, o_totalprice FROM orders
        |      WHERE o_orderstatus = 'F') b USING (o_orderkey)
        |ORDER BY a.o_orderkey""".stripMargin,

    "q_multi_join" ->
      """SELECT c_mktsegment,
        |  SUM(CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 100.0, 0) AS BIGINT)) / 100.0 AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_bind_rows" ->
      """SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal, 'a' AS src
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, CAST(NULL AS VARCHAR), c_acctbal, 'b'
        |FROM customer WHERE c_acctbal > 5000
        |ORDER BY src, c_custkey""".stripMargin,

    "q_setdiff" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |EXCEPT
        |SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin,

    "q_intersect" ->
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
        |INTERSECT
        |SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,

    "q_unique_first" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_quantity, l_extendedprice) AS rn
        |  FROM lineitem) WHERE rn = 1
        |ORDER BY l_orderkey""".stripMargin,

    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_gather" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,

    "q_spread" ->
      """SELECT l_returnflag,
        |  MAX(CASE WHEN l_linestatus = 'F' THEN n END) AS "F",
        |  MAX(CASE WHEN l_linestatus = 'O' THEN n END) AS "O"
        |FROM (SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |      FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_lag" ->
      """SELECT event_id, user_id, value,
        |  LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |FROM events ORDER BY event_id""".stripMargin,

    "q_masked_update" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 50000 THEN 'HIGH' ELSE o_orderpriority END
        |    AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_drop_null" ->
      """SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, c_acctbal, 'b' AS src
        |FROM customer WHERE c_acctbal > 5000
        |ORDER BY src, c_custkey""".stripMargin,

    "q_colminmax" ->
      """SELECT
        |  MIN(CASE WHEN NOT isinf(l_extendedprice) THEN l_extendedprice END) AS min_price,
        |  MAX(CASE WHEN NOT isinf(l_extendedprice) THEN l_extendedprice END) AS max_price
        |FROM lineitem""".stripMargin,

    "q_tail" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey DESC LIMIT 10""".stripMargin
  )
}
