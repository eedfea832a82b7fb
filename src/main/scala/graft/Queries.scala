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

  /** Scratch dir for a roundtrip query, unique per (format, sf dir, JVM):
    * a fixed path would let a concurrent Verify (sf0.01) and Bench
    * (sf0.1) overwrite each other's roundtrip mid-read. Registered for
    * recursive deletion at JVM exit (the read side is lazy, so the dir
    * must outlive the query's last action — exit is the earliest safe
    * point) to stop /tmp accumulating one dir per bench/verify run. */
  private val scratchDirs =
    java.util.Collections.synchronizedSet(new java.util.LinkedHashSet[String]())
  private lazy val scratchCleanupHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      scratchDirs.forEach { d =>
        // belt-and-braces: never walk outside our own scratch namespace
        if (d.startsWith("/tmp/graft_")) {
          val p = java.nio.file.Paths.get(d)
          if (java.nio.file.Files.exists(p)) {
            val walk = java.nio.file.Files.walk(p)
            try walk.sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.deleteIfExists(f))
            finally walk.close()
          }
        }
      }
    }))
  }
  private def roundtripDir(fmt: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val pid = ProcessHandle.current().pid()
    val dir = s"/tmp/graft_${fmt}_roundtrip_${tag}_$pid"
    scratchCleanupHook
    scratchDirs.add(dir)
    dir
  }

  lazy val all: Map[String, Q] = core ++ relational ++ pipeline

  /** Synthetic PII appended by q_pii_redact: the generated corpus contains
    * no emails/URLs, so without this the redaction regexes would be
    * oracle-checked only on non-matching text. No single quotes (the same
    * literal is spliced into the DuckDB SQL). */
  private val PiiTail =
    " reach a.b+c@mail-host.example.com and bob@x.io via https://ex.com/a?b=1#c or http://t.co/xyz done"

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
    })
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

    // shuffle + sample-head (dataframe.nim:2497-2521), demoed through the
    // deterministic hashShuffle total order (Sampling.scala) instead of
    // the reference's process-local RNG so the head-100 replays exactly
    // in DuckDB and the row is hash-checked like every other query.
    // (RNG randomHead/shuffleRows stay suite-covered — ApiSuite.)
    "q_sample" -> ((s: SparkSession, dir: String) =>
      graft.api.DataTable(
        graft.operators.Sampling.hashShuffle(orders(s, dir).df, "o_orderkey")
          .limit(100)
          .select(col("o_orderkey")))
        .arrange("o_orderkey").df),

    // lead over explicit order (column.nim:1177-1213; the lag twin)
    "q_lead" -> ((s: SparkSession, dir: String) =>
      Tables(s, dir, "events")
        .withLead("next_value", col("value"), 1,
          order = Seq(col("ts"), col("event_id")), partitionBy = Seq("user_id"))
        .select("event_id", "user_id", "value", "next_value")
        .arrange("event_id").df),

    // rolling trailing-frame aggregate (beyond-reference): per-user sum of
    // the last 3 events under a total (ts, event_id) order. Cents-exact
    // per the money house rule so the 3-element frame sums identically in
    // any engine; state bounded by the frame, one shuffle on user_id.
    "q_rolling" -> ((s: SparkSession, dir: String) =>
      Tables(s, dir, "events")
        .withRolling("roll_cents",
          sum(round(col("value") * 100.0, 0).cast("long")), 3,
          uniqueOrder = Seq(col("ts"), col("event_id")),
          partitionBy = Seq("user_id"))
        .select("event_id", "user_id", "roll_cents")
        .arrange("event_id").df),

    // attribution interval join — the BATCH execution of the
    // stream-stream join transform (streaming/Streaming.scala
    // attributionJoin; streaming twin parity-pinned in StreamingSuite):
    // purchases paired with the same user's clicks from the trailing
    // 30 min. Batch plan: hash join on user_id + range filter.
    "q_attribution" -> ((s: SparkSession, dir: String) =>
      graft.api.DataTable(
        graft.streaming.Streaming.attributionJoin(Tables.df(s, dir, "events")))
        .arrange("user_id", "click_id", "purchase_id").df),

    // time-based trailing frame (RANGE, not ROWS): cents within the
    // user's trailing hour by clock — frames shrink over gaps and need
    // no tie-break (RANGE includes all order-value peers). Micros on
    // both engines (ts div 1000 ↔ epoch_us, the established mapping).
    "q_rolling_time" -> ((s: SparkSession, dir: String) =>
      graft.api.DataTable(
        Tables.df(s, dir, "events").withColumn("ts_us", expr("ts div 1000")))
        .withRollingRange("hour_cents",
          sum(round(col("value") * 100.0, 0).cast("long")),
          col("ts_us"), 3600L * 1000000L,
          partitionBy = Seq("user_id"))
        .select("event_id", "user_id", "hour_cents")
        .arrange("event_id").df),

    // running (cumulative) aggregate — the prefix twin of q_rolling:
    // per-user cumulative cents and event count under the same total
    // order. Integer-exact prefix sums replay bit-identically.
    "q_running" -> ((s: SparkSession, dir: String) =>
      Tables(s, dir, "events")
        .withRunning("cum_cents",
          sum(round(col("value") * 100.0, 0).cast("long")),
          uniqueOrder = Seq(col("ts"), col("event_id")),
          partitionBy = Seq("user_id"))
        .withRunning("cum_n", count(lit(1)),
          uniqueOrder = Seq(col("ts"), col("event_id")),
          partitionBy = Seq("user_id"))
        .select("event_id", "user_id", "cum_cents", "cum_n")
        .arrange("event_id").df),

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

    // window rank family (beyond-reference; no distributed analogue of the
    // reference's sort+zip-index ranking). rank/dense_rank/percent_rank/
    // cume_dist over a tie-bearing order are tie-stable; ntile takes the
    // unique (quantity, orderkey, linenumber) order. percent_rank/cume_dist
    // are single divisions of exact ints — bit-identical cross-engine.
    // Partition key is l_partkey (high cardinality) so window parallelism
    // scales with the data — a 3-value key like l_returnflag would funnel
    // the whole table into 3 sort tasks at any cluster size. For ranks
    // over the WHOLE table (no partition key at all) see q_global_rank.
    "q_window_ranks" -> ((s: SparkSession, dir: String) =>
      graft.api.DataTable(
        lineitem(s, dir)
          .withRanks(Seq(col("l_quantity")), partitionBy = Seq("l_partkey"))
          .withNtile("tile", 10,
            Seq(col("l_quantity"), col("l_orderkey"), col("l_linenumber")),
            partitionBy = Seq("l_partkey"))
          .df.select(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey"), col("l_quantity"),
            col("rnk").cast("long").as("rnk"),
            col("drnk").cast("long").as("drnk"),
            col("prnk"), col("cdist"),
            col("tile").cast("long").as("tile")))
        // (l_orderkey, l_linenumber) is NOT unique in the synthetic
        // lineitem — extend to the unique (ok, ln, pk, qty) so row order
        // is total and both engines emit identical sequences
        .arrange("l_orderkey", "l_linenumber", "l_partkey", "l_quantity").df),

    // whole-table rank family WITHOUT a single-partition window: the
    // two-pass range-partition pattern (GlobalRank.withGlobalRanks) —
    // local ranks per range partition + broadcast offsets. rank/dense_rank
    // are exact integers; percent_rank/cume_dist are single divisions of
    // exact integers, so the doubles replay bit-identically in DuckDB's
    // one-partition window even though the Spark plan never has one.
    "q_global_rank" -> ((s: SparkSession, dir: String) =>
      graft.api.DataTable(
        graft.operators.GlobalRank.withGlobalRanks(
          lineitem(s, dir).df, Seq(col("l_quantity")))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("rnk").cast("long").as("rnk"),
            col("drnk").cast("long").as("drnk"),
            col("prnk"), col("cdist")))
        // ties on (ok, ln) exist; adding l_quantity makes every projected
        // column identical within any remaining tie, so order is immaterial
        .arrange("l_orderkey", "l_linenumber", "l_quantity").df),

    // whole-table lag/lead WITHOUT a single-partition window: the
    // GlobalRank two-pass pattern applied to shifts (GlobalShift —
    // per-range-partition window shifts + broadcast boundary strips,
    // replacing DataTable.withLag's documented small-data-only global
    // funnel). Shifts are positional, so the order is the UNIQUE 4-key
    // total order; values are exact copies (no arithmetic), hash-exact.
    "q_global_lag" -> ((s: SparkSession, dir: String) => {
      val ord = Seq(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_quantity"))
      graft.api.DataTable(
        graft.operators.GlobalShift.withGlobalLead(
          graft.operators.GlobalShift.withGlobalLag(
            lineitem(s, dir).df, "prev_qty", col("l_quantity"), 2, ord),
          "next_price", col("l_extendedprice"), 3, ord)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
            col("l_quantity"), col("prev_qty"), col("next_price")))
        .arrange("l_orderkey", "l_linenumber", "l_partkey", "l_quantity").df
    }),

    // dropNaN on a derived NaN column (dataframe.nim:2467-2493)
    "q_dropnan" -> ((s: SparkSession, dir: String) =>
      lineitem(s, dir)
        .mutate("maybe_nan" ->
          when(col("l_discount") === 0.0, lit(Double.NaN)).otherwise(col("l_discount")))
        .dropNaN("maybe_nan")
        .select("l_orderkey", "l_linenumber", "maybe_nan")
        .arrange("l_orderkey", "l_linenumber", "maybe_nan").df),

    // relocate: column reordering (dataframe.nim:1476-1527)
    "q_relocate" -> ((s: SparkSession, dir: String) =>
      part(s, dir)
        .select("p_partkey", "p_name", "p_retailprice", "p_brand")
        .relocateAfter("p_retailprice", "p_partkey")
        .relocateBefore("p_brand", "p_name")
        .arrange("p_partkey").df),

    // symmetric set difference (dataframe.nim:2140-2195)
    "q_setdiff_sym" -> ((s: SparkSession, dir: String) => {
      val base = orders(s, dir).select("o_orderkey", "o_totalprice")
      val a = base.filter(col("o_totalprice") > 50000)
      val b = base.filter(col("o_orderstatus") === "F")
      a.setDiff(b, symmetric = true).arrange("o_orderkey").df
    }),

    // ccLeft join merge mode: keep left's collided columns (dataframe.nim:1857-1883)
    "q_join_ccleft" -> ((s: SparkSession, dir: String) => {
      val l = orders(s, dir).select("o_orderkey", "o_totalprice")
      val r = orders(s, dir).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_totalprice")
      l.innerJoin(r, by = Seq("o_orderkey"), merge = CcLeft)
        .arrange("o_orderkey").df
    }),

    // row slice df[a..b] under explicit order (dataframe.nim:153-262)
    "q_slice" -> ((s: SparkSession, dir: String) =>
      orders(s, dir)
        .slice(100, 199, Seq(col("o_orderkey")))
        .select("o_orderkey", "o_totalprice")
        .arrange("o_orderkey").df),

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

    // gap-based sessionization (30-minute gap) — the batch twin of the
    // streaming session_window; integer arithmetic in MICROS (DuckDB's
    // native timestamp resolution — nanos would truncate on the oracle
    // side), exact oracle
    // as-of join: each purchase gets the user's most recent prior view —
    // the point-in-time lookup Spark lacks as an operator; implemented as
    // union + one window (no inequality-join explosion); DuckDB's native
    // ASOF JOIN is the oracle
    "q_asof_join" -> ((s: SparkSession, dir: String) => {
      val ev = Tables.df(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))
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
      val ev = Tables.df(s, dir, "events").withColumn("ts_us", expr("ts div 1000"))
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

    "q_sessionize" -> ((s: SparkSession, dir: String) =>
      graft.api.DataTable(
        graft.operators.Sessionize.sessionStats(
          Tables.df(s, dir, "events").withColumn("ts_us", expr("ts div 1000")),
          "user_id", "ts_us",
          gapTicks = 30L * 60 * 1000000L, tieBreak = col("event_id"),
          ticksPerSecond = 1e6))
        .arrange("user_id", "session_id").df),

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

    // JSON property extraction from the events props column
    "q_props_extract" -> ((s: SparkSession, dir: String) =>
      Tables(s, dir, "events")
        .selectCols(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
        .arrange("event_id").df),

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
        .df)
  )

  lazy val oracles: Map[String, String] = coreOracles ++ relationalOracles ++ pipelineOracles

  /** Training-data pipeline operators over documents/embeddings/events
    * (dedup, similarity search, text analysis, multimodal, streaming-batch
    * parity). All hashes are md5-derived (TextFunctions.hash48 /
    * VectorFunctions.hashPlanes), so even the LSH pipelines replay
    * bit-exactly in DuckDB — see [[OracleSql]]. */
  private val pipeline: Map[String, Q] = {
    import graft.functions.TextFunctions._
    import graft.operators.{Blocklist, Bm25, Corpus, Dedup, Diagnostics, Layout, Multimodal, Outliers, Pack, RangeJoin, Sampling, Similarity}
    Map(

      // deterministic hash sampling: reproducible 10% of the corpus,
      // scan-local predicate (no RNG, no shuffle) — exact oracle
      "q_sample_hash" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.hashSample(Tables.df(s, dir, "documents"), "doc_id", 0.1)
            .select(col("doc_id")))
          .arrange("doc_id").df),

      // deterministic train/val/test split assignment (80/10/10)
      "q_split" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.splitAssign(Tables.df(s, dir, "documents"), "doc_id",
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
            .select(col("doc_id"), col("split")))
          .arrange("doc_id").df),

      // stratified rebalancing: per-language keep rates (corpus mixing)
      "q_mixture" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.stratifiedHashSample(Tables.df(s, dir, "documents"),
            "doc_id", "lang", Map("en" -> 0.5, "zh" -> 0.8))
            .select(col("doc_id"), col("lang")))
          .arrange("doc_id").df),

      // context-window chunking: 32-token windows every 24 tokens
      // (overlap 8); chunk text checked via md5 fingerprint
      "q_chunk" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Pack.chunkDocuments(
            Tables.df(s, dir, "documents").filter(col("doc_id") < 100),
            "doc_id", "text", chunkTokens = 32, stride = 24)
            .select(col("doc_id"), col("chunk_id"), col("n_tok"),
              md5(col("chunk_text").cast("binary")).as("chunk_fp")))
          .arrange("doc_id", "chunk_id").df),

      // sequence packing: shard-parallel greedy fill of 256-token
      // training examples (window cumsum per shard)
      "q_pack" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Pack.packGreedy(
            Tables.df(s, dir, "documents")
              .withColumn("n_tok", tokenCount(col("text"))),
            "doc_id", "n_tok", budget = 256, shards = 8)
            .select(col("doc_id"), col("shard"), col("example_id")))
          .arrange("doc_id").df),

      // token counting: whitespace + BPE-ish regex
      "q_token_count" -> ((s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .selectCols(col("doc_id"),
            tokenCount(col("text")).cast("long").as("n_tokens"),
            bpeTokenCount(col("text")).cast("long").as("n_bpe"))
          .arrange("doc_id").df),

      // cross-document line dedup (boilerplate removal). The synthetic
      // corpus is single-line word soup, so multi-line docs are
      // synthesized first: a newline every 8 tokens — aligned 8-token
      // chunks DO repeat across documents (the near-dup population), so
      // the frequent-"line" strip path is genuinely exercised. Both
      // engines build the lines with identical integer slicing.
      "q_line_dedup" -> ((s: SparkSession, dir: String) => {
        val ml = Tables.df(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("__ts"))
          .select(col("doc_id"),
            array_join(
              transform(
                sequence(lit(0), ((size(col("__ts")) - 1) / lit(8)).cast("int")),
                i => array_join(slice(col("__ts"), i * 8 + 1, lit(8)), " ")),
              "\n").as("text"))
        graft.api.DataTable(
          Dedup.dedupLines(ml, "text", "doc_id", minDocFreq = 2))
          .arrange("doc_id").df
      }),

      // inverted index: posting lists for the mid-frequency vocabulary.
      // df in [3, 395]: at sf0.01 both cuts bite (4 stop-tokens sit above
      // 395, the synthetic vocabulary's rare token stays in) — the
      // bounds are corpus-absolute by design, like a real stopword cut
      "q_postings" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Corpus.postings(Tables.df(s, dir, "documents"),
            "text", "doc_id", minDf = 3L, maxDf = 395L))
          .arrange("token").df),

      // unigram-LM surprisal quality signal (micro-nat integer sums;
      // per-value ln parity only — see Corpus.lmScore scaladoc)
      "q_lm_score" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Corpus.lmScore(Tables.df(s, dir, "documents"), "text", "doc_id"))
          .arrange("doc_id").df),

      // bigram conditional surprisal (second-order LM quality signal;
      // same micro-nat replay contract)
      "q_lm_bigram" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Corpus.lmScoreBigram(Tables.df(s, dir, "documents"), "text", "doc_id"))
          .arrange("doc_id").df),

      // winnowing fingerprints (MOSS): k=5 char grams, window w=4 — ONE
      // codegen'd kernel call per row (WinnowText), aliased so the
      // stringify projection reads the computed array
      "q_winnow" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .select(col("doc_id"), winnowFingerprints(col("text"), 5, 4).as("__fps"))
            .select(col("doc_id"),
              size(col("__fps")).cast("long").as("n_fp"),
              array_join(transform(col("__fps"), x => x.cast("string")), ",")
                .as("fps")))
          .arrange("doc_id").df),

      // winnowing near-dup candidate pairs (MOSS): docs sharing >= 4
      // fingerprints at k=12/w=8 — every shared substring of >= 19 chars
      // forces a shared fingerprint, so surviving pairs carry long
      // verbatim blocks (3.5k pairs at sf0.01; param sweep in PLANS.md)
      "q_winnow_pairs" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.winnowCandidates(Tables.df(s, dir, "documents"),
            "text", "doc_id", k = 12, w = 8, bucketCap = 64, minShared = 4L))
          .arrange("id_a", "id_b").df),

      // ingest-time winnow screen: new batch (doc_id >= 400) vs the
      // existing corpus fingerprint set. Set-level counting is far more
      // aggressive than pairwise (the synthetic corpus shares heavy
      // boilerplate — new-doc hit counts run 6..112, median 40), so the
      // threshold sits at the median: ~half screened, ~half survive
      "q_winnow_incr" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.df(s, dir, "documents")
        graft.api.DataTable(
          Dedup.winnowIncremental(
            docs.filter(col("doc_id") >= 400),
            docs.filter(col("doc_id") < 400),
            "text", "doc_id", k = 12, w = 8, minShared = 40L))
          .arrange("doc_id").df
      }),

      // the same screen through the SCAN-LOCAL tier (kernel fingerprints
      // + plan-embedded sorted store, no join/shuffle — the streaming
      // shape) — hash-checked against the IDENTICAL oracle as
      // q_winnow_incr, so the kernel path is verified end-to-end
      "q_winnow_incr_scan" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.df(s, dir, "documents")
        graft.api.DataTable(
          Dedup.winnowIncrementalTiered(
            docs.filter(col("doc_id") >= 400),
            docs.filter(col("doc_id") < 400),
            "text", "doc_id", k = 12, w = 8, minShared = 40L))
          .arrange("doc_id").df
      }),

      // winnow copied-span clusters: connected components over the winnow
      // pair graph (same parameters as q_winnow_pairs); every doc labeled
      // with the min id of its quote/boilerplate family
      "q_winnow_cluster" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.clusterByWinnow(Tables.df(s, dir, "documents"),
            "text", "doc_id", k = 12, w = 8, bucketCap = 64, minShared = 4L)
            .select(col("doc_id"), col("cluster_id")))
          .arrange("doc_id").df),

      // global-quantile quality gate: top quartile of the corpus by size
      "q_quantile_gate" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.quantileGate(
            Tables.df(s, dir, "documents").select("doc_id", "n_chars"),
            "n_chars", 0.75))
          .arrange("doc_id").df),

      // quality scoring: length/stopword/punctuation stats; ratios are
      // computed once and the composite score reads the aliased columns
      "q_quality" -> ((s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .selectCols(col("doc_id"),
            length(col("text")).cast("long").as("n_chars_m"),
            meanTokenLen(col("text")).as("mean_tok_len"),
            stopwordRatio(col("text"), StopwordsEn).as("stop_ratio"),
            punctRatio(col("text")).as("punct_ratio"))
          .selectCols(col("doc_id"), col("n_chars_m"), col("mean_tok_len"),
            col("stop_ratio"), col("punct_ratio"),
            qualityFromParts(col("stop_ratio"), col("mean_tok_len"), col("punct_ratio"))
              .as("quality"))
          .arrange("doc_id").df),

      // language-ID heuristic by stopword hits, fixed tie order. Counts
      // are computed ONCE in their own projection, and the guess reads
      // the aliased columns — CollapseProject keeps non-cheap expressions
      // referenced multiple times in a separate stage, so the token array
      // is scanned 4x per row, not ~16x.
      "q_lang_id" -> ((s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .selectCols(col("doc_id"),
            stopwordCount(col("text"), StopwordsEn).cast("long").as("s_en"),
            stopwordCount(col("text"), StopwordsDe).cast("long").as("s_de"),
            stopwordCount(col("text"), StopwordsEs).cast("long").as("s_es"),
            stopwordCount(col("text"), StopwordsFr).cast("long").as("s_fr"))
          .selectCols(col("doc_id"), col("s_en"), col("s_de"), col("s_es"), col("s_fr"),
            langGuessFromCounts(col("s_en"), col("s_de"), col("s_es"), col("s_fr"))
              .as("lang_guess"))
          .arrange("doc_id").df),

      // corpus vocabulary: top-50 tokens by frequency (canonical
      // explode -> partial-agg wordcount; deterministic tiebreak)
      "q_vocab" -> ((s: SparkSession, dir: String) =>
        Tables.df(s, dir, "documents")
          .select(explode(tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("token"))
          .limit(50)),

      // feature-hashing embeddings: dim-64 count vector per doc, checked
      // through exact scalar projections (nnz / l2sq / argmax bucket)
      "q_feature_hash" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .withColumn("__v", featureHash(col("text"), 64))
            .select(col("doc_id"),
              size(filter(col("__v"), x => x > 0)).cast("long").as("nnz"),
              aggregate(col("__v"), lit(0L), (acc, x) => acc + x * x).as("l2sq"),
              array_position(col("__v"), array_max(col("__v"))).as("top_bucket")))
          .arrange("doc_id").df),

      // exact percentiles of an integer measure per language (corpus
      // length profile; interpolated like SQL percentile_cont)
      "q_percentiles" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .groupBy(col("lang"))
            .agg(expr("percentile(n_chars, array(0.25D, 0.5D, 0.75D, 0.9D))").as("p"))
            .select(col("lang"), col("p")(0).as("p25"), col("p")(1).as("p50"),
              col("p")(2).as("p75"), col("p")(3).as("p90")))
          .arrange("lang").df),

      // lexical-diversity / repetition quality signals
      "q_diversity" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .withColumn("__toks", tokens(col("text")))
            .select(col("doc_id"),
              typeTokenRatioFromTokens(col("__toks")).as("ttr"),
              topTokenRatioFromTokens(col("__toks")).as("top_tok_ratio")))
          .arrange("doc_id").df),

      // document fingerprinting (md5 of normalized text)
      "q_fingerprint" -> ((s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .selectCols(col("doc_id"), fingerprint(col("text")).as("fp"))
          .arrange("doc_id").df),

      // PII scrubbing: the synthetic corpus carries no PII, so the query
      // injects emails/URLs in-expression — both engines then run the
      // same regexes over non-trivial matches (redaction actually fires)
      "q_pii_redact" -> ((s: SparkSession, dir: String) =>
        Tables(s, dir, "documents")
          .selectCols(col("doc_id"),
            redactPii(concat(col("text"), lit(PiiTail))).as("redacted"))
          .arrange("doc_id").df),

      // exact dedup: deterministic survivor per fingerprint + dup count
      "q_dedup_exact" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.exact(Tables.df(s, dir, "documents"), "text", "doc_id")
            .select(col("doc_id"), col("fp"), col("n_dups")))
          .arrange("doc_id").df),

      // exact token-set Jaccard over a bounded window of docs
      "q_token_jaccard" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.tokenJaccardPairs(
            Tables.df(s, dir, "documents").filter(col("doc_id") < 40),
            "text", "doc_id", minJaccard = 0.3))
          .arrange("id_a", "id_b").df),

      // exact char-5-gram Jaccard over a bounded window of docs
      // (0.25: char-5-gram similarity tops out near 0.28 on this corpus, so
      // the former 0.3 cut returned an empty — vacuously green — result)
      "q_ngram_jaccard" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.ngramJaccardPairs(
            Tables.df(s, dir, "documents").filter(col("doc_id") < 40),
            "text", "doc_id", n = 5, minJaccard = 0.25))
          .arrange("id_a", "id_b").df),

      // edit-distance similarity join over normalized 32-char prefixes
      // (gram-prefilter + levenshtein verify; oracle replays the filter)
      "q_edit_pairs" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.editDistancePairs(
            Tables.df(s, dir, "documents").filter(col("doc_id") < 60)
              .withColumn("prefix",
                substring(normalizeText(col("text")), 1, 32)),
            "prefix", "doc_id", maxDist = 16))
          .arrange("id_a", "id_b").df),

      // MinHash-LSH near-dup candidates (exact oracle: md5-derived hashes)
      "q_minhash_pairs" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.minhashCandidates(Tables.df(s, dir, "documents"),
            "text", "doc_id", minEstJaccard = 0.3))
          .arrange("id_a", "id_b").df),

      // end-to-end near-dup removal: corpus in, cleaned corpus out
      // (greedy larger-id-loses policy over MinHash candidates)
      "q_dedup_near" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.dedupByMinhash(Tables.df(s, dir, "documents"),
            "text", "doc_id", minEstJaccard = 0.5)
            .select(col("doc_id")))
          .arrange("doc_id").df),

      // transitive near-dup clustering: connected components over the
      // MinHash candidate graph; every doc labeled with the min id of its
      // component (iterative min-label propagation; recursive-CTE oracle)
      "q_dedup_cluster" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.clusterByMinhash(Tables.df(s, dir, "documents"),
            "text", "doc_id", minEstJaccard = 0.5)
            .select(col("doc_id"), col("cluster_id")))
          .arrange("doc_id").df),

      // SimHash near-dup candidates (exact oracle: md5-derived hashes)
      "q_simhash_pairs" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.simhashCandidates(Tables.df(s, dir, "documents"),
            "text", "doc_id", maxHamming = 8))
          .arrange("id_a", "id_b").df),

      // embedding near-dup pairs via hyperplane LSH (exact oracle:
      // md5-derived planes replayed as literal constants in the SQL)
      "q_embed_dedup" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.embeddingCandidates(Tables.df(s, dir, "embeddings"),
            // random synthetic embeddings cluster near cosine 0 — a low
            // threshold keeps the candidate path exercised in the gate;
            // 6 planes = 64 buckets bounds the in-bucket quadratic cost
            "embedding", "vec_id", dim = 64, numPlanes = 6, minCosine = 0.2))
          .arrange("id_a", "id_b").df),

      // k-means centroid builder (2 Lloyd rounds, quantized-sum means,
      // cosine cells) — the production path for IVF cell assignment
      "q_kmeans_assign" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Similarity.kmeansAssign(Tables.df(s, dir, "embeddings"),
            "embedding", "vec_id", k = 8, iters = 2))
          .arrange("vec_id").df),

      // brute-force cosine top-k (the ANN baseline; exact oracle)
      "q_ann_cosine" -> ((s: SparkSession, dir: String) => {
        val emb = Tables.df(s, dir, "embeddings")
        graft.api.DataTable(
          Similarity.bruteForceTopK(
            corpus = emb, queries = emb.filter(col("vec_id") === 0),
            vecCol = "embedding", idCol = "vec_id", queryIdCol = "vec_id", k = 10)
            .withColumn("rank", col("rank").cast("long")))
          .arrange("rank").df
      }),

      // IVF-style ANN: centroid cells assigned by pure projection (no
      // shuffle), nprobe=2. Centroids are TRAINED — 2 Lloyd rounds from
      // the deterministic vec_id < 8 seeds (Similarity.kmeansCentroids,
      // the same quantized-mean builder q_kmeans_assign pins), so the
      // index is the real production shape and the oracle replays the
      // training relationally; exact oracle.
      "q_ann_ivf" -> ((s: SparkSession, dir: String) => {
        val emb = Tables.df(s, dir, "embeddings")
        val cents = Similarity.kmeansCentroids(emb, "embedding", "vec_id",
          k = 8, iters = 2)
        graft.api.DataTable(
          Similarity.ivfTopK(
            corpus = emb, queries = emb.filter(col("vec_id") < 4),
            centroids = cents,
            vecCol = "embedding", idCol = "vec_id", queryIdCol = "vec_id", k = 10)
            .withColumn("rank", col("rank").cast("long")))
          .arrange("query_id", "rank").df
      }),

      // LSH-bucketed ANN (the scale path; exact oracle like q_embed_dedup)
      "q_ann_lsh" -> ((s: SparkSession, dir: String) => {
        val emb = Tables.df(s, dir, "embeddings")
        graft.api.DataTable(
          Similarity.lshTopK(
            corpus = emb, queries = emb.filter(col("vec_id") < 4),
            vecCol = "embedding", idCol = "vec_id", queryIdCol = "vec_id",
            k = 10, dim = 64, numPlanes = 8, probeBits = 1)
            .withColumn("rank", col("rank").cast("long")))
          .arrange("query_id", "rank").df
      }),

      // multimodal blob plumbing (stub decode; features deterministic)
      "q_multimodal" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Multimodal.documentBlobFeatures(s, Tables.df(s, dir, "documents"))
            .select(col("doc_id"), col("n_bytes"),
              col("width").cast("long").as("width"),
              col("height").cast("long").as("height"),
              col("mean_byte")))
          .arrange("doc_id").df),

      // hourly windowed aggregate over events: the SAME transform the
      // streaming surface runs (graft.streaming.Streaming.hourlyRollup —
      // withWatermark is a no-op in batch, so batch/stream parity holds
      // by construction; exact oracle via cent-scaled sums)
      "q_events_hourly" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          graft.streaming.Streaming.hourlyRollup(Tables.events(s, dir)))
          .arrange("hour", "event_type").df),

      // batch twin of the streaming MinHash near-dup dedup: arrival ts is
      // doc_id-derived, so first-arrival bucket claiming == min-doc-id
      // claiming and the whole band/claim pipeline replays in DuckDB
      "q_stream_dedup_twin" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          graft.streaming.Streaming.streamingNearDedup(
            Tables.df(s, dir, "documents").withColumn("ts_utc",
              expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,doc_id)")),
            "text", "doc_id")
            .select("doc_id"))
          .arrange("doc_id").df),

      // batch twin of the flatMapGroupsWithState sessionizer: on a batch
      // Dataset timeouts don't exist and the open session flushes at end
      // of group, so the emitted sessions are exactly the gap rule's —
      // lag + running-sum replays them in DuckDB (same 30-min gap)
      "q_stream_sessions" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          graft.streaming.Streaming.statefulSessions(
            Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000")),
            gapUs = 30L * 60 * 1000000L).toDF()
            .select(col("user_id"), col("session_start_us"),
              col("n_events"), col("dur_us")))
          .arrange("user_id", "session_start_us").df),

      // balanced per-stratum sample: exactly 25 docs per language by
      // deterministic hash rank (WindowGroupLimit prunes map-side)
      "q_stratified" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.stratifiedTopN(Tables.df(s, dir, "documents"),
            "doc_id", "lang", n = 25)
            .select(col("doc_id"), col("lang")))
          .arrange("doc_id").df),

      // benchmark decontamination: drop training docs sharing any word
      // 5-gram with a held-out 20% benchmark slice (GPT-3-style exact
      // n-gram overlap filter; hash48 shingles replay in DuckDB)
      "q_decontam" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.df(s, dir, "documents")
        val isBench =
          Sampling.hashBucket(col("doc_id"), "bench", 7L) < lit(200000L)
        graft.api.DataTable(
          Dedup.decontaminate(docs.filter(!isBench), docs.filter(isBench),
            "text", "doc_id", n = 5)
            .select(col("doc_id")))
          .arrange("doc_id").df
      }),

      // banded interval join WITHOUT an equi-key: events into 20 fixed
      // 6-hour windows placed every 36 hours from the first event; the
      // bin rewrite keeps it a hash join (never a nested-loop cartesian)
      "q_range_join" -> ((s: SparkSession, dir: String) => {
        val ev = Tables.df(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            expr("ts div 1000").as("t_us"))
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

      // BM25 relevance of every document for a fixed term query
      // (micro-scaled BIGINT scores; oracle mirrors every float op)
      "q_bm25" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Bm25.score(Tables.df(s, dir, "documents"), "doc_id", "text",
            Bm25Terms))
          .arrange("doc_id").df),

      // ANN evaluation: recall@10 of BOTH approximate indexes — the
      // multi-probe LSH buckets and the trained-centroid IVF (the same
      // Lloyd-built index q_ann_ivf serves) — against brute-force ground
      // truth, per query (integer counts — exact)
      "q_ann_recall" -> ((s: SparkSession, dir: String) => {
        val emb = Tables.df(s, dir, "embeddings")
        val qs = emb.filter(col("vec_id") < 4)
        val truth = Similarity.bruteForceTopK(
          corpus = emb, queries = qs,
          vecCol = "embedding", idCol = "vec_id", queryIdCol = "vec_id",
          k = 10).select(col("query_id"), col("vec_id"))
        val lsh = Similarity.lshTopK(
          corpus = emb, queries = qs,
          vecCol = "embedding", idCol = "vec_id", queryIdCol = "vec_id",
          k = 10, dim = 64, numPlanes = 8, probeBits = 1)
          .select(col("query_id"), col("vec_id"), lit(1L).as("__lhit"))
        val ivf = Similarity.ivfTopK(
          corpus = emb, queries = qs,
          centroids = Similarity.kmeansCentroids(emb, "embedding", "vec_id",
            k = 8, iters = 2),
          vecCol = "embedding", idCol = "vec_id", queryIdCol = "vec_id", k = 10)
          .select(col("query_id"), col("vec_id"), lit(1L).as("__ihit"))
        graft.api.DataTable(
          truth.join(lsh, Seq("query_id", "vec_id"), "left")
            .join(ivf, Seq("query_id", "vec_id"), "left")
            .groupBy("query_id")
            .agg(count(lit(1)).as("n_true"),
              sum(coalesce(col("__lhit"), lit(0L))).as("n_hit_lsh"),
              sum(coalesce(col("__ihit"), lit(0L))).as("n_hit_ivf")))
          .arrange("query_id").df
      }),

      // Gopher/C4-style repetition signals in exact integer form: word
      // 2-gram totals, distinct counts, and the top 2-gram's frequency —
      // one compiled kernel pass per row (build, sort, sweep), not the
      // interpreted HOF fold
      "q_repetition" -> ((s: SparkSession, dir: String) => {
        import org.apache.spark.sql.graftshim.{NgramStats, Shim}
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .select(col("doc_id"),
              Shim.toColumn(NgramStats(
                Shim.toExpression(col("text")), 2)).as("__st"))
            .select(col("doc_id"),
              col("__st").getItem(0).as("n_2gram"),
              col("__st").getItem(1).as("n_distinct_2gram"),
              col("__st").getItem(2).as("top_2gram_n")))
          .arrange("doc_id").df
      }),

      // JSONL interchange roundtrip: parallel write of a directory of
      // part files, schema-explicit distributed read-back (no inference
      // pass), identity vs the source table
      "q_jsonl_roundtrip" -> ((s: SparkSession, dir: String) => {
        val tmp = roundtripDir("jsonl", dir)
        val src = Tables.df(s, dir, "documents")
        graft.sources.Jsonl.writeJsonl(src, tmp)
        val back = graft.sources.Jsonl.readJsonl(s, tmp, Some(src.schema))
        graft.api.DataTable(
          back.select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"), md5(col("text").cast("binary")).as("text_fp")))
          .arrange("doc_id").df
      }),

      // cross-document exact substring duplication: per doc, how many
      // of its word-5-gram windows appear in any OTHER document
      "q_substring_dup" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Dedup.substringDupStats(Tables.df(s, dir, "documents"),
            "text", "doc_id", n = 5))
          .arrange("doc_id").df),

      // per-domain corpus accounting (web-curation staple): URLs
      // synthesized from source/lang/doc_id, host + path split out with
      // parse_url (codegen'd), rolled up per host — the shape of a
      // crawl-mix report or domain blocklist join
      "q_domains" -> ((s: SparkSession, dir: String) => {
        val url = concat(lit("https://"), col("source"),
          lit(".example.com/"), col("lang"), lit("/"), col("doc_id"))
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .select(col("doc_id"), col("n_chars"), url.as("__u"))
            .select(col("doc_id"), col("n_chars"),
              parse_url(col("__u"), lit("HOST")).as("host"),
              parse_url(col("__u"), lit("PATH")).as("path"))
            .groupBy(col("host"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_chars")).as("sum_chars"),
              min(col("path")).as("first_path")))
          .arrange("host").df
      }),

      // Unicode NFC canonical composition (the cross-source dedup
      // precondition): decomposed sequences injected in-expression so
      // the normalizer provably fires; both engines run the same
      // Unicode algorithm (java.text.Normalizer / nfc_normalize)
      "q_nfc" -> ((s: SparkSession, dir: String) => {
        import org.apache.spark.sql.graftshim.{NfcNormalize, Shim}
        // DECOMPOSED combining marks (e+U+0301, i+U+0308, A+U+030A):
        // the engine must compose them; the oracle injects the same
        // sequence via chr() and both land on the composed forms
        val injected = concat(
          lit("café naïve Å "), col("text"))
        val norm = Shim.toColumn(NfcNormalize(Shim.toExpression(injected)))
        graft.api.DataTable(
          Tables.df(s, dir, "documents")
            .select(col("doc_id"), norm.as("__n"))
            .select(col("doc_id"),
              md5(col("__n").cast("binary")).as("norm_fp"),
              length(col("__n")).as("n_chars_norm")))
          .arrange("doc_id").df
      }),

      // incremental (ingestion-time) exact dedup: new batch (doc_id >=
      // 400) against the historical corpus (doc_id < 400) — drop already-
      // known fingerprints, keep-first within the batch
      "q_dedup_incr" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.df(s, dir, "documents")
        graft.api.DataTable(
          Dedup.exactIncremental(
            docs.filter(col("doc_id") >= 400),
            docs.filter(col("doc_id") < 400), "text", "doc_id")
            .select(col("doc_id"), col("fp")))
          .arrange("doc_id").df
      }),

      // ORC interchange roundtrip (predicate/partition behavior shared
      // with the parquet sink; identity vs the source table)
      "q_orc_roundtrip" -> ((s: SparkSession, dir: String) => {
        val tmp = roundtripDir("orc", dir)
        val src = Tables.df(s, dir, "documents")
        graft.sources.Sinks.writeOrc(src, tmp)
        graft.api.DataTable(
          graft.sources.Sinks.readOrc(s, tmp)
            .select(col("doc_id"), col("lang"), col("source"),
              col("n_chars"), md5(col("text").cast("binary")).as("text_fp")))
          .arrange("doc_id").df
      }),

      // hourly distinct users — exact countDistinct in batch (two-phase
      // partial agg); the streaming twin trades to HLL (StreamingSuite)
      "q_hourly_uniques" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          graft.streaming.Streaming.hourlyUniques(Tables.events(s, dir)))
          .arrange("hour").df),

      // Z-order (Morton) layout key over (l_partkey, l_suppkey): 8-bit
      // quantize lanes from a one-row min/max stats aggregate, bits
      // interleaved — pure integer arithmetic, so DuckDB replays the key
      // bit-exactly (same subtract/scale/div/shift/or both engines)
      "q_zorder" -> ((s: SparkSession, dir: String) => {
        val li = lineitem(s, dir).df
        val st = li.agg(
          min(col("l_partkey")), max(col("l_partkey")),
          min(col("l_suppkey")), max(col("l_suppkey"))).head()
        val bits = 8
        val key = Layout.zorderKey(Seq(
          Layout.quantize(col("l_partkey"), st.getLong(0), st.getLong(1), bits),
          Layout.quantize(col("l_suppkey"), st.getLong(2), st.getLong(3), bits)),
          bits)
        graft.api.DataTable(
          li.select(col("l_orderkey"), col("l_linenumber"), key.as("zkey")))
          .arrange("l_orderkey", "l_linenumber").df
      }),

      // quality-weighted deterministic sampling: keep-probability rises
      // with document length (clamped [0,1]); per-row cut vs hash bucket,
      // zero shuffle, exactly replayed by the DuckDB oracle
      "q_weighted_sample" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Sampling.weightedHashSample(Tables.df(s, dir, "documents"),
            "doc_id", col("n_chars") / lit(2000.0))
            .select(col("doc_id"), col("n_chars")))
          .arrange("doc_id").df),

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
          .arrange("gid", "source", "lang").df),

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

      // blocklist gate: drop every document from a deny-listed source. The
      // deny-list is derived from the data itself (sources that ever
      // emitted a sub-60-char fragment — "spam-ridden domains"), so DuckDB
      // replays both the list and the anti-join exactly. Plan: the list is
      // dimension-sized → broadcast LeftAnti, corpus never shuffles.
      "q_blocklist" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.df(s, dir, "documents")
        val deny = docs.filter(col("n_chars") < 60).select("source").distinct()
        graft.api.DataTable(
          Blocklist.filterBlocklist(docs, deny, "source")
            .select("doc_id", "source", "n_chars"))
          .arrange("doc_id").df
      }),

      // the audit complement of q_blocklist: rows that ARE blocked
      // (LeftSemi twin, same broadcast shape) — what the curation report
      // shows before dropping them.
      "q_blocklist_audit" -> ((s: SparkSession, dir: String) => {
        val docs = Tables.df(s, dir, "documents")
        val deny = docs.filter(col("n_chars") < 60).select("source").distinct()
        graft.api.DataTable(
          Blocklist.matchBlocklist(docs, deny, "source")
            .select("doc_id", "source", "n_chars"))
          .arrange("doc_id").df
      }),

      // per-(source,lang) z-score outlier screen over integer n_chars:
      // exact decimal sums → fixed IEEE derivation, so z is bit-identical
      // cross-engine (the operator's exactness contract, oracle-proven);
      // singleton (source,lang) groups exist in the data and exercise the
      // degenerate-group z=0 guard on both engines.
      "q_outliers" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Outliers.zscoreOutliers(Tables.df(s, dir, "documents"),
            col("n_chars"), Seq("source", "lang"), threshold = 1.5)
            .select("doc_id", "source", "lang", "n_chars", "z"))
          .arrange("doc_id").df),

      // key-skew pre-flight: the 20 heaviest l_suppkey values with exact
      // counts + corpus share — the decide-salting-vs-broadcast report
      "q_key_skew" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Diagnostics.keySkew(Tables.df(s, dir, "lineitem"),
            Seq("l_suppkey"), topK = 20))
          .arrange("rnk").df),

      // exact fixed-width histogram of document lengths — all-integer
      // binning so the edges replay bit-identically in DuckDB
      "q_histogram" -> ((s: SparkSession, dir: String) =>
        graft.api.DataTable(
          Diagnostics.histogram(Tables.df(s, dir, "documents"),
            "n_chars", lo = 0L, hi = 600L, bins = 24))
          .arrange("bin").df)
    )
  }

  /** Query terms for q_bm25 — spliced into both engines. */
  private val Bm25Terms = Seq("vector", "stream", "merge", "window")

  private val pipelineOracles: Map[String, String] = Map(

    // generated from the same constants the Spark plans embed — OracleSql
    "q_minhash_pairs" -> OracleSql.minhashPairs(),
    "q_dedup_near" -> OracleSql.minhashSurvivors(),
    "q_dedup_cluster" -> OracleSql.minhashClusters(),
    "q_stream_dedup_twin" -> OracleSql.streamNearDedupSurvivors(),

    "q_stream_sessions" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t_us FROM events),
        |s AS (SELECT user_id, t_us,
        |    CASE WHEN lag(t_us) OVER w IS NULL
        |         OR t_us - lag(t_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
        |  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY t_us)),
        |g AS (SELECT user_id, t_us, SUM(new_s) OVER (PARTITION BY user_id
        |    ORDER BY t_us ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM s)
        |SELECT user_id, MIN(t_us) AS session_start_us,
        |  COUNT(*)::BIGINT AS n_events, (MAX(t_us) - MIN(t_us)) AS dur_us
        |FROM g GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin,

    "q_vocab" ->
      """SELECT token, COUNT(*)::BIGINT AS n
        |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |      FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin,

    "q_feature_hash" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_transform(string_split_regex(trim(text), '\s+'),
        |      tk -> ('0x' || substring(md5(tk), 1, 12))::BIGINT % 64) AS hs
        |  FROM documents),
        |v AS (
        |  SELECT doc_id,
        |    list_transform(range(0, 64), j -> len(list_filter(hs, h -> h = j))) AS v
        |  FROM t)
        |SELECT doc_id,
        |  len(list_filter(v, x -> x > 0))::BIGINT AS nnz,
        |  list_aggregate(list_transform(v, x -> x * x), 'sum')::BIGINT AS l2sq,
        |  list_position(v, list_max(v))::BIGINT AS top_bucket
        |FROM v ORDER BY doc_id""".stripMargin,

    "q_percentiles" ->
      """SELECT lang,
        |  quantile_cont(n_chars, 0.25) AS p25,
        |  quantile_cont(n_chars, 0.5) AS p50,
        |  quantile_cont(n_chars, 0.75) AS p75,
        |  quantile_cont(n_chars, 0.9) AS p90
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_edit_pairs" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    substring(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 32) AS s
        |  FROM documents WHERE doc_id < 60),
        |g AS (
        |  SELECT doc_id, s, unnest(list_distinct(
        |    CASE WHEN length(s) <= 4 THEN [s]
        |         ELSE list_transform(range(0, length(s) - 3),
        |                i -> substring(s, CAST(i + 1 AS INT), 4)) END)) AS gr
        |  FROM t),
        |ok AS (SELECT gr FROM g GROUP BY gr HAVING COUNT(*) BETWEEN 2 AND 256),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS s_a, b.s AS s_b
        |  FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
        |  JOIN ok ON ok.gr = a.gr)
        |SELECT id_a, id_b, levenshtein(s_a, s_b)::BIGINT AS dist
        |FROM pairs
        |WHERE abs(length(s_a) - length(s_b)) <= 16 AND levenshtein(s_a, s_b) <= 16
        |ORDER BY id_a, id_b""".stripMargin,

    "q_pii_redact" ->
      s"""SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(text || '$PiiTail',
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^\\s]+', '<URL>', 'g') AS redacted
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_diversity" ->
      """SELECT doc_id,
        |  len(list_distinct(toks)) / len(toks) AS ttr,
        |  list_max(list_transform(list_distinct(toks),
        |    t -> len(list_filter(toks, x -> x = t)))) / len(toks) AS top_tok_ratio
        |FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_sample_hash" ->
      """SELECT doc_id FROM documents
        |WHERE ('0x' || substring(md5('graft_sample_42_' || doc_id), 1, 12))::BIGINT
        |        % 1000000 < 100000
        |ORDER BY doc_id""".stripMargin,

    "q_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 800000 THEN 'train'
        |       WHEN b < 900000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        ('0x' || substring(md5('graft_split_42_' || doc_id), 1, 12))::BIGINT
        |          % 1000000 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "q_mixture" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang,
        |    ('0x' || substring(md5('graft_strat_42_' || doc_id), 1, 12))::BIGINT
        |      % 1000000 AS b,
        |    CASE WHEN lang = 'en' THEN 500000
        |         WHEN lang = 'zh' THEN 800000
        |         ELSE 1000000 END AS cut
        |  FROM documents)
        |WHERE b < cut ORDER BY doc_id""".stripMargin,

    "q_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents WHERE doc_id < 100),
        |s AS (
        |  SELECT doc_id, toks,
        |    unnest(range(0, greatest(len(toks), 1), 24)) AS st
        |  FROM t)
        |SELECT doc_id, (st / 24)::BIGINT AS chunk_id,
        |  len(toks[st + 1 : st + 32])::BIGINT AS n_tok,
        |  md5(array_to_string(toks[st + 1 : st + 32], ' ')) AS chunk_fp
        |FROM s ORDER BY doc_id, chunk_id""".stripMargin,

    "q_pack" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    ('0x' || substring(md5('graft_pack_42_' || doc_id), 1, 12))::BIGINT
        |      % 1000000 % 8 AS shard,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, shard, n_tok,
        |    SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t)
        |SELECT doc_id, shard, ((cum - n_tok) // 256)::BIGINT AS example_id
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_simhash_pairs" -> OracleSql.simhashPairs(),
    "q_embed_dedup" -> OracleSql.embedDedup(),
    "q_ann_lsh" -> OracleSql.annLsh(),
    "q_ann_ivf" -> OracleSql.annIvf(),
    "q_kmeans_assign" -> OracleSql.kmeansAssign(),

    "q_token_count" ->
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    // cross-document line dedup: DuckDB rebuilds the same newline-every-8-
    // tokens documents with integer slicing, then replays the doc-freq
    // strip; zipped unnests pair each line with its position
    "q_line_dedup" ->
      """WITH ml AS (
        |  SELECT doc_id,
        |    array_to_string(
        |      list_transform(range(0, ((len(ts)-1)//8)+1),
        |        i -> array_to_string(list_slice(ts, i*8+1, i*8+8), ' ')),
        |      chr(10)) AS text
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)),
        |lines AS (
        |  SELECT doc_id, unnest(range(len(ls))) AS pos, unnest(ls) AS line
        |  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM ml)),
        |freq AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY line)
        |SELECT doc_id,
        |  COALESCE(array_to_string(list(line ORDER BY pos) FILTER (WHERE df < 2),
        |    chr(10)), '') AS clean_text,
        |  (COUNT(*) FILTER (WHERE df < 2))::BIGINT AS n_kept,
        |  (COUNT(*) FILTER (WHERE df >= 2))::BIGINT AS n_dropped
        |FROM lines JOIN freq USING (line)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // inverted index; same [minDf, maxDf] vocabulary cut as the query
    "q_postings" ->
      """WITH pairs AS (
        |  SELECT DISTINCT doc_id, token FROM (
        |    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        |    FROM documents)),
        |v AS (SELECT token, COUNT(*)::BIGINT AS df FROM pairs GROUP BY token
        |      HAVING COUNT(*) BETWEEN 3 AND 395)
        |SELECT token, df,
        |  array_to_string(list_sort(list(doc_id)), ',') AS posting
        |FROM pairs JOIN v USING (token)
        |GROUP BY token, df
        |ORDER BY token""".stripMargin,

    // unigram-LM surprisal: per-token -ln p quantized to micro-nats BEFORE
    // the sum (order-insensitive integer aggregate; per-value ln parity is
    // the only float contract — Corpus.lmScore scaladoc)
    "q_lm_score" ->
      """WITH inst AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        |  FROM documents),
        |cnt AS (SELECT t, COUNT(*) AS c FROM inst GROUP BY t),
        |tot AS (SELECT SUM(c) AS n FROM cnt)
        |SELECT doc_id,
        |  COUNT(*)::BIGINT AS n_tokens,
        |  (SUM(CAST(round(-ln(c::DOUBLE / n::DOUBLE) * 1000000.0, 0) AS BIGINT)))::BIGINT
        |    AS surprisal_micro
        |FROM inst JOIN cnt USING (t) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // bigram conditional surprisal: p(w2|w1) = c(w1,w2)/c(w1,*), counts
    // from this corpus; micro-nat quantization BEFORE the sum (same
    // order-insensitive replay contract as q_lm_score); <2-token docs
    // restored as (0, 0) via the left join, mirroring Corpus.lmScoreBigram
    "q_lm_bigram" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
        |  FROM documents),
        |inst AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS w1,
        |    unnest(list_transform(range(1, len(ts)), i -> ts[i+1])) AS w2
        |  FROM toks),
        |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM inst GROUP BY w1, w2),
        |cc AS (SELECT w1, SUM(c2) AS cc FROM c2 GROUP BY w1),
        |scored AS (
        |  SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams,
        |    CAST(SUM(CAST(round(-ln(c2::DOUBLE / cc::DOUBLE) * 1000000.0, 0)
        |      AS BIGINT)) AS BIGINT) AS surprisal2_micro
        |  FROM inst JOIN c2 USING (w1, w2) JOIN cc USING (w1)
        |  GROUP BY doc_id)
        |SELECT doc_id,
        |  COALESCE(n_bigrams, 0)::BIGINT AS n_bigrams,
        |  COALESCE(surprisal2_micro, 0)::BIGINT AS surprisal2_micro
        |FROM documents LEFT JOIN scored USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // winnowing fingerprints: normalize → char-k-gram hash48 → window
    // minima, one generator shared with the pairs/clusters oracles so the
    // md5 replay is spelled in exactly one place
    "q_winnow" -> OracleSql.winnowFingerprints(5, 4),

    // winnow pairs: same fingerprint replay as q_winnow at k=12/w=8, then
    // the LSH bucket stage as a self-join restricted to [2, bucketCap]
    // buckets, pair counts >= minShared
    "q_winnow_pairs" -> OracleSql.winnowPairs(12, 8, 64, 4L),

    // winnow copied-span clusters: recursive-CTE transitive closure over
    // the winnow pair graph, min-id component labels
    "q_winnow_cluster" -> OracleSql.winnowClusters(12, 8, 64, 4L),

    // ingest-time winnow screen survivors (new = doc_id >= 400)
    "q_winnow_incr" -> OracleSql.winnowIncremental(12, 8, 40L, 400L),

    // scan-local tier, same truth: the oracle is deliberately identical
    "q_winnow_incr_scan" -> OracleSql.winnowIncremental(12, 8, 40L, 400L),

    // global-quantile gate: DuckDB's quantile_cont IS the interpolation
    // Spark's exact percentile implements (Sampling.quantileGate scaladoc)
    "q_quantile_gate" ->
      """WITH thr AS (SELECT quantile_cont(n_chars, 0.75) AS t FROM documents)
        |SELECT doc_id, n_chars
        |FROM documents CROSS JOIN thr
        |WHERE n_chars::DOUBLE >= t
        |ORDER BY doc_id""".stripMargin,

    "q_quality" ->
      """SELECT doc_id,
        |  length(text) AS n_chars_m,
        |  length(regexp_replace(text, '\s+', '', 'g'))
        |    / len(string_split_regex(trim(text), '\s+')) AS mean_tok_len,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
        |    / len(string_split_regex(trim(text), '\s+')) AS stop_ratio,
        |  (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
        |    / length(text) AS punct_ratio,
        |  len(list_filter(string_split_regex(trim(text), '\s+'),
        |      x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x)))
        |    / len(string_split_regex(trim(text), '\s+')) * 0.5
        |  + CASE WHEN length(regexp_replace(text, '\s+', '', 'g'))
        |      / len(string_split_regex(trim(text), '\s+')) BETWEEN 3.0 AND 10.0
        |      THEN 0.3 ELSE 0.0 END
        |  + CASE WHEN (length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))
        |      / length(text) < 0.1 THEN 0.2 ELSE 0.0 END AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents)
        |SELECT doc_id,
        |  len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that','it','for'], x))) AS s_en,
        |  len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','mit','ein','zu','den'], x))) AS s_de,
        |  len(list_filter(w, x -> list_contains(['el','la','de','que','y','en','un','es','se','no'], x))) AS s_es,
        |  len(list_filter(w, x -> list_contains(['le','la','de','et','un','que','pour','dans','ce','une'], x))) AS s_fr,
        |  CASE
        |    WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
        |    WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
        |    WHEN s_es >= s_fr THEN 'es'
        |    ELSE 'fr' END AS lang_guess
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_fingerprint" ->
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id,
        |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |  COUNT(*) AS n_dups
        |FROM documents GROUP BY fp ORDER BY doc_id""".stripMargin,

    "q_ngram_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct(
        |      CASE WHEN length(nrm) <= 5 THEN [nrm]
        |           ELSE list_transform(range(0, length(nrm) - 4),
        |                  i -> substring(nrm, CAST(i + 1 AS INT), 5)) END) AS gs
        |  FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS nrm
        |        FROM documents WHERE doc_id < 40))
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.gs, b.gs))
        |      / len(list_distinct(list_concat(a.gs, b.gs))) AS jaccard
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.25 ORDER BY id_a, id_b""".stripMargin,

    "q_token_jaccard" ->
      """WITH t AS (
        |  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS toks
        |  FROM documents WHERE doc_id < 40)
        |SELECT id_a, id_b, jaccard FROM (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    len(list_intersect(a.toks, b.toks))
        |      / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id)
        |WHERE jaccard >= 0.3 ORDER BY id_a, id_b""".stripMargin,

    "q_ann_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        |           FROM embeddings WHERE vec_id = 0),
        |c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings)
        |SELECT query_id, vec_id, cos, rank FROM (
        |  SELECT q.query_id, c.vec_id,
        |    list_dot_product(c.cv, q.qv)
        |      / (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(q.qv, q.qv))) AS cos,
        |    ROW_NUMBER() OVER (ORDER BY cos DESC, c.vec_id) AS rank
        |  FROM c, q WHERE c.vec_id <> q.query_id)
        |WHERE rank <= 10 ORDER BY rank""".stripMargin,

    "q_multimodal" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  64 + octet_length(encode(text)) % 512 AS width,
        |  64 + (octet_length(encode(text)) * 31) % 512 AS height,
        |  list_aggregate(list_transform(
        |    range(1, least(octet_length(encode(text)), 64) + 1),
        |    i -> ord(substring(text, i, 1))), 'avg') AS mean_byte
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |  event_type, COUNT(*) AS n,
        |  SUM(CAST(ROUND(value * 100.0, 0) AS BIGINT)) / 100.0 AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_stratified" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |      ORDER BY ('0x' || substring(md5('graft_stratn_42_' || doc_id), 1, 12))::BIGINT
        |                 % 1000000, doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 25 ORDER BY doc_id""".stripMargin,

    "q_decontam" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
        |    ('0x' || substring(md5('graft_bench_7_' || doc_id), 1, 12))::BIGINT
        |      % 1000000 < 200000 AS is_bench
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id, is_bench, unnest(
        |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(0, len(toks) - 4),
        |                i -> array_to_string(toks[i+1:i+5], ' ')) END) AS g
        |  FROM d),
        |bh AS (SELECT DISTINCT ('0x' || substring(md5(g), 1, 12))::BIGINT AS h
        |       FROM sh WHERE is_bench),
        |bad AS (SELECT DISTINCT doc_id
        |        FROM sh JOIN bh ON ('0x' || substring(md5(g), 1, 12))::BIGINT = bh.h
        |        WHERE NOT is_bench)
        |SELECT doc_id FROM d
        |WHERE NOT is_bench AND doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY doc_id""".stripMargin,

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

    "q_bm25" -> OracleSql.bm25(Bm25Terms),

    "q_ann_recall" -> OracleSql.annRecall(),

    "q_zorder" -> OracleSql.zorderLineitem(),

    "q_repetition" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(toks) < 2 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(0, len(toks) - 1),
        |                i -> array_to_string(toks[i+1:i+2], ' ')) END AS gs
        |  FROM d)
        |SELECT doc_id, len(gs)::BIGINT AS n_2gram,
        |  len(list_distinct(gs))::BIGINT AS n_distinct_2gram,
        |  list_max(list_transform(list_distinct(gs),
        |    x -> len(list_filter(gs, y -> y = x))))::BIGINT AS top_2gram_n
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_jsonl_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars,
        |  md5(text) AS text_fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_orc_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars,
        |  md5(text) AS text_fp
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_substring_dup" ->
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) < 5 THEN [array_to_string(toks, ' ')]
        |         ELSE list_transform(range(0, len(toks) - 4),
        |                i -> array_to_string(toks[i+1:i+5], ' ')) END)) AS g
        |  FROM d),
        |h AS (SELECT doc_id, ('0x' || substring(md5(g), 1, 12))::BIGINT AS hh
        |      FROM w),
        |f AS (SELECT hh, COUNT(*) AS df FROM h GROUP BY hh)
        |SELECT doc_id, COUNT(*)::BIGINT AS n_windows,
        |  SUM(CASE WHEN f.df > 1 THEN 1 ELSE 0 END)::BIGINT AS n_shared
        |FROM h JOIN f USING (hh)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_domains" ->
      """WITH u AS (
        |  SELECT doc_id, n_chars,
        |    'https://' || source || '.example.com/' || lang || '/' || doc_id
        |      AS url
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, n_chars,
        |    regexp_extract(url, 'https://([^/]+)', 1) AS host,
        |    regexp_extract(url, 'https://[^/]+(/.*)', 1) AS path
        |  FROM u)
        |SELECT host, COUNT(*)::BIGINT AS n_docs,
        |  SUM(n_chars)::BIGINT AS sum_chars, MIN(path) AS first_path
        |FROM p GROUP BY host ORDER BY host""".stripMargin,

    "q_nfc" ->
      """WITH n AS (
        |  SELECT doc_id, nfc_normalize(
        |    'cafe' || chr(769) || ' nai' || chr(776) || 've ' ||
        |    'A' || chr(778) || ' ' || text) AS nt
        |  FROM documents)
        |SELECT doc_id, md5(nt) AS norm_fp,
        |  length(nt)::INT AS n_chars_norm
        |FROM n ORDER BY doc_id""".stripMargin,

    "q_dedup_incr" ->
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |known AS (SELECT DISTINCT fp FROM f WHERE doc_id < 400),
        |batch AS (SELECT * FROM f WHERE doc_id >= 400)
        |SELECT min(doc_id) AS doc_id, fp FROM batch
        |WHERE fp NOT IN (SELECT fp FROM known)
        |GROUP BY fp ORDER BY doc_id""".stripMargin,

    "q_hourly_uniques" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour,
        |  COUNT(DISTINCT user_id)::BIGINT AS n_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_weighted_sample" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE ('0x' || substring(md5('graft_wsample_42_' || doc_id), 1, 12))::BIGINT
        |        % 1000000
        |      < round(least(1.0, greatest(0.0, n_chars / 2000.0)) * 1000000, 0)::BIGINT
        |ORDER BY doc_id""".stripMargin,

    "q_quality_rollup" ->
      """SELECT source, lang, COUNT(*)::BIGINT AS n_docs,
        |  SUM(n_chars)::BIGINT AS sum_chars,
        |  MAX(n_chars)::BIGINT AS max_chars,
        |  SUM(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END)::BIGINT AS n_short,
        |  GROUPING(source, lang)::BIGINT AS gid
        |FROM documents GROUP BY ROLLUP(source, lang)
        |ORDER BY gid, source NULLS FIRST, lang NULLS FIRST""".stripMargin,

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

    "q_blocklist" ->
      """WITH deny AS (SELECT DISTINCT source FROM documents WHERE n_chars < 60)
        |SELECT doc_id, source, n_chars FROM documents d
        |WHERE NOT EXISTS (SELECT 1 FROM deny WHERE deny.source = d.source)
        |ORDER BY doc_id""".stripMargin,

    "q_blocklist_audit" ->
      """WITH deny AS (SELECT DISTINCT source FROM documents WHERE n_chars < 60)
        |SELECT doc_id, source, n_chars FROM documents d
        |WHERE EXISTS (SELECT 1 FROM deny WHERE deny.source = d.source)
        |ORDER BY doc_id""".stripMargin,

    // mirrors Outliers.withZscore's exact op sequence: integer-exact group
    // sums cast to double (values << 2^53, so every cast is exact), then
    // the same divide/sqrt chain — correctly-rounded IEEE ops on identical
    // inputs give identical bits; degenerate groups guard to 0.0 BEFORE
    // the threshold filter on both engines
    "q_outliers" ->
      """WITH st AS (
        |  SELECT source, lang,
        |    COUNT(*)::DOUBLE AS n,
        |    SUM(n_chars)::DOUBLE AS s,
        |    SUM(n_chars * n_chars)::DOUBLE AS q
        |  FROM documents GROUP BY source, lang),
        |scored AS (
        |  SELECT d.doc_id, d.source, d.lang, d.n_chars,
        |    CASE WHEN st.n > 1.0 AND (st.q - st.s*st.s/st.n) > 0.0
        |         THEN (d.n_chars::DOUBLE - st.s/st.n)
        |              / sqrt((st.q - st.s*st.s/st.n) / (st.n - 1.0))
        |         ELSE 0.0 END AS z
        |  FROM documents d JOIN st USING (source, lang))
        |SELECT * FROM scored WHERE abs(z) > 1.5
        |ORDER BY doc_id""".stripMargin,

    // key skew: exact counts, one integer division for share, rank with
    // the same (n DESC, key ASC) deterministic tie-break as the query
    "q_key_skew" ->
      """WITH c AS (
        |  SELECT l_suppkey, COUNT(*)::BIGINT AS n FROM lineitem GROUP BY 1),
        |t AS (SELECT SUM(n) AS tot FROM c)
        |SELECT l_suppkey, n, n::DOUBLE / tot::DOUBLE AS share,
        |  (ROW_NUMBER() OVER (ORDER BY n DESC, l_suppkey))::BIGINT AS rnk
        |FROM c CROSS JOIN t
        |ORDER BY n DESC, l_suppkey
        |LIMIT 20""".stripMargin,

    // histogram: the same all-integer bin formula ((x-lo)*bins // (hi-lo))
    // and the same one-division edge arithmetic as the operator
    "q_histogram" ->
      """WITH b AS (
        |  SELECT ((n_chars - 0) * 24) // 600 AS bin
        |  FROM documents WHERE n_chars >= 0 AND n_chars < 600)
        |SELECT bin, COUNT(*)::BIGINT AS n,
        |  0 + bin * 600 / 24 AS lo_edge,
        |  0 + (bin + 1) * 600 / 24 AS hi_edge
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin
  )

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
        |FROM customer ORDER BY c_custkey""".stripMargin
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

    "q_except_all" ->
      """SELECT o_custkey FROM orders
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 150000
        |ORDER BY o_custkey""".stripMargin,

    "q_intersect_all" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,

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
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  ORDER BY o_orderkey DESC LIMIT 10)
        |ORDER BY o_orderkey""".stripMargin,

    "q_sample" ->
      """SELECT o_orderkey FROM (
        |  SELECT o_orderkey FROM orders
        |  ORDER BY ('0x' || substring(md5('graft_shuffle_42_' || o_orderkey), 1, 12))::BIGINT
        |             % 1000000,
        |           o_orderkey
        |  LIMIT 100)
        |ORDER BY o_orderkey""".stripMargin,

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

    "q_lead" ->
      """SELECT event_id, user_id, value,
        |  LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
        |FROM events ORDER BY event_id""".stripMargin,

    "q_rolling" ->
      s"""SELECT event_id, user_id,
        |  ${OracleSql.centsSum("value",
             "OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)")} AS roll_cents
        |FROM events ORDER BY event_id""".stripMargin,

    "q_attribution" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'click') c
        |JOIN (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |      WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id
        | AND c.us <= p.us AND c.us > p.us - 1800000000
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,

    "q_rolling_time" ->
      s"""SELECT event_id, user_id,
        |  ${OracleSql.centsSum("value",
             "OVER (PARTITION BY user_id ORDER BY epoch_us(ts) RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)")} AS hour_cents
        |FROM events ORDER BY event_id""".stripMargin,

    "q_running" ->
      s"""SELECT event_id, user_id,
        |  ${OracleSql.centsSum("value", "OVER w")} AS cum_cents,
        |  COUNT(*) OVER w AS cum_n
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q_argminmax" ->
      """SELECT o_orderstatus,
        |  arg_min(o_custkey, o_orderkey) AS first_cust,
        |  arg_max(o_custkey, o_orderkey) AS last_cust,
        |  MIN(o_orderkey) AS min_key,
        |  MAX(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_window_ranks" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cdist,
        |  ntile(10) OVER wu AS tile
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_partkey ORDER BY l_quantity),
        |  wu AS (PARTITION BY l_partkey
        |         ORDER BY l_quantity, l_orderkey, l_linenumber)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin,

    // DuckDB ranks in one partition; the Spark side must produce the SAME
    // numbers from its two-pass range-partitioned plan — that equivalence
    // is exactly what this row proves
    "q_global_rank" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  rank() OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist() OVER w AS cdist
        |FROM lineitem
        |WINDOW w AS (ORDER BY l_quantity)
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,

    // DuckDB shifts in one partition; the Spark side produces the SAME
    // values from range-partitioned windows + boundary hand-off
    "q_global_lag" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
        |  lag(l_quantity, 2) OVER w AS prev_qty,
        |  lead(l_extendedprice, 3) OVER w AS next_price
        |FROM lineitem
        |WINDOW w AS (ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_quantity""".stripMargin,

    "q_dropnan" ->
      """SELECT l_orderkey, l_linenumber, l_discount AS maybe_nan
        |FROM lineitem WHERE l_discount <> 0.0
        |ORDER BY l_orderkey, l_linenumber, maybe_nan""".stripMargin,

    "q_relocate" ->
      """SELECT p_partkey, p_retailprice, p_brand, p_name
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q_setdiff_sym" ->
      """WITH a AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 50000),
        |b AS (SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'F')
        |SELECT * FROM (
        |  (SELECT * FROM a EXCEPT SELECT * FROM b)
        |  UNION ALL
        |  (SELECT * FROM b EXCEPT SELECT * FROM a))
        |ORDER BY o_orderkey""".stripMargin,

    "q_join_ccleft" ->
      """SELECT a.o_orderkey, a.o_totalprice
        |FROM orders a
        |JOIN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') b
        |  USING (o_orderkey)
        |ORDER BY a.o_orderkey""".stripMargin,

    "q_slice" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 100 OFFSET 100""".stripMargin,

    "q_group_span" ->
      """SELECT l_orderkey, MAX(l_quantity) - MIN(l_quantity) AS qty_span
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

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

    "q_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, epoch_us(ts) AS tus, event_id,
        |    CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sess AS (
        |  SELECT user_id, tus, event_id,
        |    (SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS UNBOUNDED PRECEDING))::BIGINT - 1 AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  (MAX(tus) - MIN(tus)) / 1e6 AS span_s
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_join_salted" ->
      """SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q_props_extract" ->
      """SELECT event_id, json_extract(props, '$.k')::BIGINT AS prop_k
        |FROM events ORDER BY event_id""".stripMargin
  )
}
