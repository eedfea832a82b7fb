package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.Tables
import graft.Queries._
import graft.functions.TextFunctions._
import graft.operators.{Blocklist, Bm25, Corpus, Dedup, Diagnostics, Layout, Multimodal, Outliers, Pack, RangeJoin, Sampling, Similarity}

/** Core verb surface: select/filter/mutate/summarize family, slicing,
  * reshape, grouped modes, and the CSV roundtrip.
  *
  * One ledger family of [[Queries.all]] (oracle-parity rules documented
  * there); assembled and key-set-ratcheted by SparkEntry/EntrySuite. */
private[graft] object QueriesVerbs {

  val queries: Map[String, Q] = Map(


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


    // transmute: keep only computed columns (dataframe.nim:1777-1819).
    // floor() is LONG in Spark but DOUBLE in DuckDB — cast to double so the
    // hash compare sees the same physical type on both sides.
    "q_transmute" -> ((s: SparkSession, dir: String) =>
      orders(s, dir)
        .transmute(
          "okey" -> col("o_orderkey"),
          "price_bucket" -> floor(col("o_totalprice") / lit(10000.0)).cast("double"))
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
        // (l_orderkey, l_linenumber) is not unique in the synthetic data:
        // the order must be total for a deterministic hash compare. The
        // final tiebreaker is the raw l_quantity, not the derived float —
        // cross-engine fp rounding must never decide row order.
        .arrangeBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "dev").df),


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
        .select("o_orderkey", "o_totalprice").df),


    // CSV write → read with reference inference (io.nim:465-605, 807-826):
    // the round trip must reproduce the typed table exactly (ints → long,
    // floats → double via exact Double.toString round-trip, strings kept)
    "q_csv_roundtrip" -> ((s: SparkSession, dir: String) => {
      val tmp = roundtripDir("csv", dir)
      // parallel writer (directory of parts) — the cluster-scale shape;
      // readCsv globs the directory back
      graft.sources.Csv.writeCsv(customer(s, dir).df, tmp)
      val back = graft.sources.Csv.readCsv(s, tmp)
      graft.api.DataTable(back)
        .selectCols(col("c_custkey"), col("c_name"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
        .arrange("c_custkey").df
    }),


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


    // dropNaN on a derived NaN column (dataframe.nim:2467-2493)
    "q_dropnan" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .mutate("maybe_nan" ->
          when(col("l_discount") === 0.0, lit(Double.NaN)).otherwise(col("l_discount")))
        .dropNaN("maybe_nan")
        .select("l_orderkey", "l_linenumber", "maybe_nan")
        .arrange("l_orderkey", "l_linenumber", "maybe_nan").df),


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


    // row slice df[a..b] under explicit order (dataframe.nim:153-262)
    "q_slice" -> ((s: SparkSession, dir: String) =>
      orders(s, dir)
        .slice(100, 199, Seq(col("o_orderkey")))
        .select("o_orderkey", "o_totalprice")
        .arrange("o_orderkey").df),


    // relocate: column reordering (dataframe.nim:1476-1527)
    "q_relocate" -> ((s: SparkSession, dir: String) =>
      part(s, dir)
        .select("p_partkey", "p_name", "p_retailprice", "p_brand")
        .relocateAfter("p_retailprice", "p_partkey")
        .relocateBefore("p_brand", "p_name")
        .arrange("p_partkey").df),


    // distinct on projected columns (unique, dataframe.nim:2347-2368)
    "q_distinct" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .select("l_returnflag", "l_linestatus")
        .unique()
        .arrange("l_returnflag", "l_linestatus").df),


    // unique keep-first under explicit order (dataframe.nim:2370-2422)
    "q_unique_first" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        // (l_orderkey, l_linenumber) is not unique in the synthetic data —
        // the keep-first order must be total for a deterministic result.
        .uniqueFirstBy(Seq("l_orderkey"),
          col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .arrange("l_orderkey").df),


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


    // distributed per-group custom logic (groups iterator analogue,
    // dataframe.nim:1178-1240): quantity span per order via mapGroupsRows
    "q_group_span" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        // project BEFORE grouping: mapGroups serializes whole rows into
        // the per-group iterator — two columns, not sixteen
        .select("l_orderkey", "l_quantity")
        .groupBy("l_orderkey")
        .mapGroupsRows(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("l_orderkey",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("qty_span",
            org.apache.spark.sql.types.DoubleType)))) { (key, rows) =>
          var mn = Double.MaxValue
          var mx = Double.MinValue
          rows.foreach { r =>
            val q = r.getAs[Double]("l_quantity")
            if (q < mn) mn = q
            if (q > mx) mx = q
          }
          Iterator(org.apache.spark.sql.Row(key.getLong(0), mx - mn))
        }
        .arrange("l_orderkey").df),


    // JSON property extraction from the events props column
    "q_props_extract" -> ((s: SparkSession, dir: String) =>
      Tables(s, dir, "events")
        .selectCols(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
        .arrange("event_id").df),


    // tagged-variant Value column (value.nim:4-25): a genuinely
    // mixed-type column (int cents on even keys, priority string on odd)
    // carried as struct<tag,...>, projected back out via tag + stringify
    "q_value_mixed" -> ((s: SparkSession, dir: String) => {
      import graft.api.{ValueColumn => V}
      import org.apache.spark.sql.types.{LongType, StringType}
      orders(s, dir)
        .selectCols(col("o_orderkey"),
          when(col("o_orderkey") % 2 === 0,
            V.toValue(round(col("o_totalprice") * 100.0, 0).cast("long"), LongType))
            .otherwise(V.toValue(col("o_orderpriority"), StringType)).as("v"))
        .selectCols(col("o_orderkey"),
          col("v.tag").cast("long").as("vtag"),
          V.asString(col("v")).as("vstr"))
        .arrange("o_orderkey").df
    }),


    // custom Aggregator/udaf reduction (the reference's formula: block
    // with `var res; res *= x`, testsFormula.nim:466-476): integer product
    // per group — exact in any partition order
    "q_custom_agg" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .groupBy("l_orderkey")
        .summarize("prod_ln" ->
          graft.functions.Accumulators.productLong(col("l_linenumber").cast("long"))
            .cast("double"))
        .df),


    // arg-min/arg-max aggregates (beyond-reference): the customer on the
    // lowest/highest order key per status — min_by/max_by carry a payload
    // column to the extremum. o_orderkey is unique, so the pick is total.
    "q_argminmax" -> ((s: SparkSession, dir: String) =>
      orders(s, dir)
        .groupBy("o_orderstatus")
        .summarize(
          "first_cust" -> min_by(col("o_custkey"), col("o_orderkey")),
          "last_cust" -> max_by(col("o_custkey"), col("o_orderkey")),
          "min_key" -> min(col("o_orderkey")),
          "max_key" -> max(col("o_orderkey")))
        .arrange("o_orderstatus").df),


      // CUBE counterpart of q_quality_rollup: subtotals for EVERY key
      // subset — (source,lang), (source), (lang), () — in one
      // partially-aggregated pass; grouping_id disambiguates which keys
      // were aggregated away. countRows exercises the GroupingMode
      // dispatch shared with summarize. Integer counts — exact anywhere.
      "q_cube" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(Tables.df(s, dir, "documents"))
          .cubeBy("source", "lang")
          .summarize(
            "n_docs" -> count(lit(1)),
            "sum_chars" -> sum(col("n_chars")),
            "gid" -> grouping_id())
          .arrange("gid", "source", "lang").df),


      // explicit GROUPING SETS: by-source and by-lang marginals with NO
      // (source, lang) detail level and NO grand total — a shape neither
      // rollup nor cube can express; still ONE Expand + partial-agg pass
      // (plan-asserted in VerbSuite). gid says which marginal a row is.
      "q_grouping_sets" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(Tables.df(s, dir, "documents"))
          .groupingSetsBy(Seq(Seq("source"), Seq("lang")), "source", "lang")
          .summarize(
            "n_docs" -> count(lit(1)),
            "sum_chars" -> sum(col("n_chars")),
            "gid" -> grouping_id())
          .arrange("gid", "source", "lang").df),


      // per-source quality dashboard: ROLLUP grouping emits detail rows,
      // per-source subtotals, and a grand total in ONE partially-aggregated
      // pass (no per-level union of scans); grouping_id disambiguates the
      // levels. Integer-only aggregates — exact in any reduction order.
      "q_quality_rollup" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(Tables.df(s, dir, "documents"))
          .rollupBy("source", "lang")
          .summarize(
            "n_docs" -> count(lit(1)),
            "sum_chars" -> sum(col("n_chars")),
            "max_chars" -> max(col("n_chars")),
            "n_short" -> sum(when(col("n_chars") < lit(200), lit(1L)).otherwise(lit(0L))),
            "gid" -> grouping_id())
          .arrange("gid", "source", "lang").df)
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
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""".stripMargin,


    "q_grouped_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    MAX(l_quantity) OVER (PARTITION BY l_orderkey) AS mq
        |  FROM lineitem) WHERE l_quantity = mq
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,


    "q_arrange_head" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,


    "q_csv_roundtrip" ->
      """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |  c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,


    "q_masked_update" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 50000 THEN 'HIGH' ELSE o_orderpriority END
        |    AS o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin,


    "q_drop_null" ->
      """SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name, c_acctbal, 'b' AS src
        |FROM customer WHERE c_acctbal > 5000
        |ORDER BY src, c_custkey""".stripMargin,


    "q_dropnan" ->
      """SELECT l_orderkey, l_linenumber, l_discount AS maybe_nan
        |FROM lineitem WHERE l_discount <> 0.0
        |ORDER BY l_orderkey, l_linenumber, maybe_nan""".stripMargin,


    "q_colminmax" ->
      """SELECT
        |  MIN(CASE WHEN NOT isinf(l_extendedprice) THEN l_extendedprice END) AS min_price,
        |  MAX(CASE WHEN NOT isinf(l_extendedprice) THEN l_extendedprice END) AS max_price
        |FROM lineitem""".stripMargin,


    "q_tail" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  ORDER BY o_orderkey DESC LIMIT 10)
        |ORDER BY o_orderkey""".stripMargin,


    "q_slice" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 100 OFFSET 100""".stripMargin,


    "q_relocate" ->
      """SELECT p_partkey, p_retailprice, p_brand, p_name
        |FROM part ORDER BY p_partkey""".stripMargin,


    "q_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,


    "q_unique_first" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_quantity, l_extendedprice) AS rn
        |  FROM lineitem) WHERE rn = 1
        |ORDER BY l_orderkey""".stripMargin,


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


    "q_group_span" ->
      """SELECT l_orderkey, MAX(l_quantity) - MIN(l_quantity) AS qty_span
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,


    "q_props_extract" ->
      """SELECT event_id, json_extract(props, '$.k')::BIGINT AS prop_k
        |FROM events ORDER BY event_id""".stripMargin,


    "q_value_mixed" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 3 END AS vtag,
        |  CASE WHEN o_orderkey % 2 = 0
        |       THEN CAST(CAST(ROUND(o_totalprice * 100.0, 0) AS BIGINT) AS VARCHAR)
        |       ELSE o_orderpriority END AS vstr
        |FROM orders ORDER BY o_orderkey""".stripMargin,


    "q_custom_agg" ->
      """SELECT l_orderkey, product(l_linenumber) AS prod_ln
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,


    "q_argminmax" ->
      """SELECT o_orderstatus,
        |  arg_min(o_custkey, o_orderkey) AS first_cust,
        |  arg_max(o_custkey, o_orderkey) AS last_cust,
        |  MIN(o_orderkey) AS min_key,
        |  MAX(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,


    "q_cube" ->
      """SELECT source, lang, COUNT(*)::BIGINT AS n_docs,
        |  SUM(n_chars)::BIGINT AS sum_chars,
        |  GROUPING(source, lang)::BIGINT AS gid
        |FROM documents GROUP BY CUBE(source, lang)
        |ORDER BY gid, source NULLS FIRST, lang NULLS FIRST""".stripMargin,


    "q_grouping_sets" ->
      """SELECT source, lang, COUNT(*)::BIGINT AS n_docs,
        |  SUM(n_chars)::BIGINT AS sum_chars,
        |  GROUPING(source, lang)::BIGINT AS gid
        |FROM documents GROUP BY GROUPING SETS ((source), (lang))
        |ORDER BY gid, source NULLS FIRST, lang NULLS FIRST""".stripMargin,


    "q_quality_rollup" ->
      """SELECT source, lang, COUNT(*)::BIGINT AS n_docs,
        |  SUM(n_chars)::BIGINT AS sum_chars,
        |  MAX(n_chars)::BIGINT AS max_chars,
        |  SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END)::BIGINT AS n_short,
        |  GROUPING(source, lang)::BIGINT AS gid
        |FROM documents GROUP BY ROLLUP(source, lang)
        |ORDER BY gid, source NULLS FIRST, lang NULLS FIRST""".stripMargin
  )
}
