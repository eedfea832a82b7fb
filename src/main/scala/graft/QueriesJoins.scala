package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.Tables
import graft.Queries._
import graft.functions.TextFunctions._
import graft.operators.{Blocklist, Bm25, Corpus, Dedup, Diagnostics, Layout, Multimodal, Outliers, Pack, RangeJoin, Sampling, Similarity}

/** Join and set-operation surface: equi/semi/anti/full/common-column
  * joins, as-of and range joins, the salted-skew variant, and the
  * bind/setdiff/intersect/multiset family.
  *
  * One ledger family of [[Queries.all]] (oracle-parity rules documented
  * there); assembled and key-set-ratcheted by SparkEntry/EntrySuite. */
private[graft] object QueriesJoins {

  val queries: Map[String, Q] = Map(


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


    // full outer join — the one join type where null-fill happens on BOTH
    // sides (engines diverge exactly there). Every synthetic custkey has
    // orders, so the customer side is cut to c_custkey <= 500 AND every
    // 5th key is shifted +1000000 (disjoint from all o_custkey) to force
    // BOTH unmatched populations: orders with custkey > 500 or a shifted
    // key (left-only, null c_name) and the shifted customers (right-only,
    // null o_orderkey). USING-key semantics coalesce the key — same in
    // Spark (join on Seq) and SQL COALESCE. No broadcast: Spark can't
    // BroadcastHashJoin a full outer's stream side, and at scale both
    // sides are big anyway — sort-merge on the key is the right plan.
    "q_full_join" -> ((s: SparkSession, dir: String) =>
      orders(s, dir).select("o_custkey", "o_orderkey", "o_totalprice")
        .join(customer(s, dir)
                .rename("o_custkey" -> "c_custkey")
                .filter(col("o_custkey") <= 500)
                .selectCols(
                  when(col("o_custkey") % 5 === 0, col("o_custkey") + 1000000)
                    .otherwise(col("o_custkey")).as("o_custkey"),
                  col("c_name")),
          by = Seq("o_custkey"), how = "full")
        .selectCols(col("o_custkey").as("custkey"), col("o_orderkey"),
          col("o_totalprice"), col("c_name"))
        .arrange("custkey", "o_orderkey").df),


    // ccLeft join merge mode: keep left's collided columns (dataframe.nim:1857-1883)
    "q_join_ccleft" -> ((s: SparkSession, dir: String) => {
      val l = orders(s, dir).select("o_orderkey", "o_totalprice")
      val r = orders(s, dir).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_totalprice")
      l.innerJoin(r, by = Seq("o_orderkey"), merge = CcLeft)
        .arrange("o_orderkey").df
    }),


    // skew-safe salted join: result must be IDENTICAL to the plain join
    // (the salt only reshapes the shuffle), so it shares q_inner_join's
    // oracle shape
    "q_join_salted" -> ((s: SparkSession, dir: String) =>
      orders(s, dir)
        .innerJoinSalted(
          customer(s, dir).rename("o_custkey" -> "c_custkey"),
          by = Seq("o_custkey"), saltBuckets = 8)
        .selectCols(col("o_orderkey"), col("o_totalprice"),
          col("c_name"), col("c_mktsegment"))
        .arrange("o_orderkey").df),


    // dimension chain join: region -> nation -> supplier, broadcast both
    // small sides (TPC-H Q5 shape over the unused dimension tables)
    "q_region_suppliers" -> ((s: SparkSession, dir: String) =>
      supplier(s, dir)
        .rename("n_nationkey" -> "s_nationkey")
        .innerJoin(nation(s, dir), by = Seq("n_nationkey"), broadcastRight = true)
        .rename("r_regionkey" -> "n_regionkey")
        .innerJoin(region(s, dir), by = Seq("r_regionkey"), broadcastRight = true)
        .groupBy("r_name")
        .summarize(
          "n_suppliers" -> count(lit(1)),
          "acct_total" -> moneySum(col("s_acctbal")))
        .df),


    // gap-based sessionization (30-minute gap) — the batch twin of the
    // streaming session_window; integer arithmetic in MICROS (DuckDB's
    // native timestamp resolution — nanos would truncate on the oracle
    // side), exact oracle
    // as-of join: each purchase gets the user's most recent prior view —
    // the point-in-time lookup Spark lacks as an operator; implemented as
    // union + one window (no inequality-join explosion); DuckDB's native
    // ASOF JOIN is the oracle
    "q_asof_join" -> ((s: SparkSession, dir: String) => {
      val ev = Tables.eventsUs(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("event_id")).as("view_event_id"))
      graft.api.DataTable(
        graft.operators.AsOf.joinAsOf(purchases, views, Seq("user_id"),
          leftTs = "ts_us", rightTs = "ts_us", payload = Seq("view_event_id")))
        .arrange("event_id").df
    }),


    // forward as-of with tolerance: each purchase matched to the NEXT
    // view within 1 hour (pandas merge_asof direction='forward'); the
    // DuckDB oracle reuses native backward ASOF on negated timestamps
    "q_asof_forward" -> ((s: SparkSession, dir: String) => {
      val ev = Tables.eventsUs(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts_us"))
        .agg(max(col("event_id")).as("view_event_id"))
      graft.api.DataTable(
        graft.operators.AsOf.joinAsOf(purchases, views, Seq("user_id"),
          leftTs = "ts_us", rightTs = "ts_us",
          payload = Seq("view_event_id"),
          direction = "forward", tolerance = Some(3600000000L)))
        .arrange("event_id").df
    }),


      // banded interval join WITHOUT an equi-key: events into 20 fixed
      // 6-hour windows placed every 36 hours from the first event; the
      // bin rewrite keeps it a hash join (never a nested-loop cartesian)
      "q_range_join" -> ((s: SparkSession, dir: String) => {
        val ev = Tables.eventsUs(s, dir)
          .select(col("event_id"), col("user_id"),
            col("ts_us").as("t_us"))
        val t0 = ev.agg(min(col("t_us")).as("t0"))
        val windows = s.range(20).toDF("window_id")
          .crossJoin(broadcast(t0))
          .select(col("window_id"),
            (col("t0") + col("window_id") * lit(129600000000L)).as("w_start"),
            (col("t0") + col("window_id") * lit(129600000000L) +
              lit(21600000000L)).as("w_end"))
        graft.api.DataTable(
          RangeJoin.intervalJoin(ev, "t_us", windows, "w_start", "w_end",
            binWidth = 3600000000L)
            .groupBy("window_id")
            .agg(count(lit(1)).as("n_events"),
              countDistinct(col("user_id")).as("n_users")))
          .arrange("window_id").df
      }),


    // attribution interval join — the BATCH execution of the
    // stream-stream join transform (streaming/Streaming.scala
    // attributionJoin; streaming twin parity-pinned in StreamingSuite):
    // purchases paired with the same user's clicks from the trailing
    // 30 min. Batch plan: hash join on user_id + range filter.
    "q_attribution" -> ((s: SparkSession, dir: String) =>
      graft.api.DataTable(
        graft.streaming.Streaming.attributionJoin(Tables.df(s, dir, "events")))
        .arrange("user_id", "click_id", "purchase_id").df),


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


    // symmetric set difference (dataframe.nim:2140-2195)
    "q_setdiff_sym" -> ((s: SparkSession, dir: String) => {
      val base = orders(s, dir).select("o_orderkey", "o_totalprice")
      val a = base.filter(col("o_totalprice") > 50000)
      val b = base.filter(col("o_orderstatus") === "F")
      a.setDiff(b, symmetric = true).arrange("o_orderkey").df
    }),


    // intersect (beyond-reference; SURVEY.md §2.7)
    "q_intersect" -> ((s: SparkSession, dir: String) => {
      val big = orders(s, dir).filter(col("o_totalprice") > 100000).select("o_orderkey")
      val open = orders(s, dir).filter(col("o_orderstatus") === "O").select("o_orderkey")
      big.intersect(open).arrange("o_orderkey").df
    }),


    // multiset set ops (beyond-reference; SQL EXCEPT ALL / INTERSECT ALL):
    // per-row MULTIPLICITY arithmetic — o_custkey repeats across orders,
    // so the result keeps max(0, m-n) / min(m, n) copies per key. Plan is
    // one count-aggregate per side + a replicate generate, never an m×n
    // self-join of duplicates (which explodes on boilerplate-heavy data).
    "q_except_all" -> ((s: SparkSession, dir: String) => {
      val all = orders(s, dir).select("o_custkey")
      val big = orders(s, dir).filter(col("o_totalprice") > 150000).select("o_custkey")
      all.setDiffAll(big).arrange("o_custkey").df
    }),


    "q_intersect_all" -> ((s: SparkSession, dir: String) => {
      val a = orders(s, dir).filter(col("o_totalprice") > 100000).select("o_custkey")
      val b = orders(s, dir).filter(col("o_orderstatus") === "O").select("o_custkey")
      a.intersectAll(b).arrange("o_custkey").df
    })
  )

  val oracles: Map[String, String] = Map(


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


    "q_full_join" ->
      """SELECT COALESCE(o_custkey, c_custkey) AS custkey,
        |  o_orderkey, o_totalprice, c_name
        |FROM orders
        |FULL JOIN (SELECT CASE WHEN c_custkey % 5 = 0
        |                       THEN c_custkey + 1000000
        |                       ELSE c_custkey END AS c_custkey,
        |                  c_name
        |           FROM customer WHERE c_custkey <= 500) c
        |  ON o_custkey = c_custkey
        |ORDER BY custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin,


    "q_join_ccleft" ->
      """SELECT a.o_orderkey, a.o_totalprice
        |FROM orders a
        |JOIN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') b
        |  USING (o_orderkey)
        |ORDER BY a.o_orderkey""".stripMargin,


    "q_join_salted" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,


    "q_region_suppliers" ->
      """SELECT r_name,
        |  COUNT(*) AS n_suppliers,
        |  SUM(CAST(ROUND(s_acctbal * 100.0, 0) AS BIGINT)) / 100.0 AS acct_total
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,


    "q_asof_join" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS view_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.ts_us,
        |       r.ts_us AS asof_ts, r.view_event_id AS asof_view_event_id
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
        |ORDER BY l.event_id""".stripMargin,


    "q_asof_forward" ->
      """WITH l AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
        |    -epoch_us(ts) AS nts
        |  FROM events WHERE event_type = 'purchase'),
        |r AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, -epoch_us(ts) AS nts,
        |    max(event_id) AS view_event_id
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2, 3),
        |j AS (
        |  SELECT l.event_id, l.user_id, l.ts_us,
        |    r.ts_us AS m_ts, r.view_event_id AS m_id
        |  FROM l ASOF LEFT JOIN r
        |    ON l.user_id = r.user_id AND l.nts >= r.nts)
        |SELECT event_id, user_id, ts_us,
        |  CASE WHEN m_ts - ts_us <= 3600000000 THEN m_ts END AS asof_ts,
        |  CASE WHEN m_ts - ts_us <= 3600000000 THEN m_id END
        |    AS asof_view_event_id
        |FROM j ORDER BY event_id""".stripMargin,


    "q_range_join" ->
      """WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events),
        |m AS (SELECT min(t_us) AS t0 FROM t),
        |w AS (SELECT i AS window_id,
        |        t0 + i * 129600000000 AS ws,
        |        t0 + i * 129600000000 + 21600000000 AS we
        |      FROM m CROSS JOIN unnest(range(0, 20)) AS u(i))
        |SELECT window_id, COUNT(*)::BIGINT AS n_events,
        |  COUNT(DISTINCT user_id)::BIGINT AS n_users
        |FROM t JOIN w ON t.t_us >= w.ws AND t.t_us < w.we
        |GROUP BY window_id ORDER BY window_id""".stripMargin,


    "q_attribution" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'click') c
        |JOIN (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND c.us <= p.us AND c.us > p.us - 1800000000
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,


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


    "q_setdiff_sym" ->
      """WITH a AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 50000),
        |b AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F')
        |SELECT * FROM (
        |  (SELECT * FROM a EXCEPT SELECT * FROM b)
        |  UNION ALL
        |  (SELECT * FROM b EXCEPT SELECT * FROM a))
        |ORDER BY o_orderkey""".stripMargin,


    "q_intersect" ->
      """SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
        |INTERSECT
        |SELECT o_orderkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,


    "q_except_all" ->
      """SELECT o_custkey FROM orders
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |ORDER BY o_custkey""".stripMargin,


    "q_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin
  )
}
