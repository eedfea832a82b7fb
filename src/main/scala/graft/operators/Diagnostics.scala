package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pre-flight diagnostics for join/aggregation planning at scale —
  * beyond-reference (the reference is single-process and never needs
  * them; a 100 TB Spark job lives or dies by them).
  */
object Diagnostics {

  /** Key-skew report: the `topK` heaviest values of `keyCols` with exact
    * counts, corpus share, and a dense heaviness rank — the number you
    * look at BEFORE deciding whether a join needs salting, a broadcast,
    * or plain AQE skew-split (a key with share ≈ 1/partitions is fine;
    * share ≫ that pins one reducer).
    *
    * Plan: one partial-agged count per key [the only full shuffle], the
    * grand total as ONE scalar aggregate broadcast back (BM25-stats
    * pattern), top-K via TakeOrderedAndProject (bounded, deterministic
    * tie-break on the key columns), and the rank window runs AFTER the
    * top-K cut — a single-partition window over `topK` rows, bounded by
    * construction, never by data. `share` is one division of exact
    * integer counts, so it replays bit-identically cross-engine. */
  def keySkew(df: DataFrame, keyCols: Seq[String], topK: Int = 20): DataFrame = {
    require(keyCols.nonEmpty, "keySkew: need at least one key column")
    require(topK > 0, "keySkew: topK must be positive")
    // the report's own columns share the frame with the keys — collision
    // would make every later col("n") ambiguous; fail with the reason
    val clash = keyCols.toSet intersect Set("n", "share", "rnk")
    require(clash.isEmpty,
      s"keySkew: key column(s) ${clash.mkString(", ")} collide with the " +
        "report columns (n, share, rnk) — rename the key first")
    val counts = df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__tot"))
    val top = counts.crossJoin(broadcast(total))
      .withColumn("share", col("n").cast("double") / col("__tot").cast("double"))
      .drop("__tot")
      .orderBy(col("n").desc +: keyCols.map(col(_).asc): _*)
      .limit(topK)
    // bounded single-partition window: input is the topK rows just cut
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc +: keyCols.map(col(_).asc): _*)
    top.withColumn("rnk", row_number().over(w).cast("long"))
  }

  /** Exact fixed-width histogram of an integral measure over [lo, hi):
    * `bin = (x - lo) * bins DIV (hi - lo)` — all-integer arithmetic, so
    * the edges replay bit-identically in any engine (`width_bucket`
    * variants differ on edge inclusion across engines; the explicit
    * formula doesn't). Rows outside [lo, hi) are dropped and reported is
    * per NON-EMPTY bin only (a groupBy, not a dense bin spine — callers
    * wanting zero rows join a `sequence`). One partial-agged shuffle on
    * the bin id; bin count bounded by `bins` regardless of data. */
  def histogram(df: DataFrame, measureCol: String,
                lo: Long, hi: Long, bins: Int): DataFrame = {
    require(hi > lo, s"histogram: empty domain [$lo, $hi)")
    require(bins > 0, "histogram: bins must be positive")
    // the bin formula multiplies (x - lo) < width by bins before the
    // div — both the width itself and width * bins must fit a Long, or
    // bins go silently wrong with no error
    val width =
      try Math.subtractExact(hi, lo)
      catch { case _: ArithmeticException => throw new IllegalArgumentException(
        s"histogram: domain [$lo, $hi) is wider than Long.MaxValue") }
    require(width <= Long.MaxValue / bins,
      s"histogram: domain width $width times $bins bins overflows Long — " +
        "use fewer bins or a narrower domain")
    // integral measures only (the quantileGate rule): the bigint cast in
    // the bin formula would silently truncate a double toward zero
    val field = Resolve.uniqueField(df, measureCol, "histogram")
    field.dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => ()
      case dt => throw new IllegalArgumentException(
        s"histogram: measure '$measureCol' must be integral (exact all-integer " +
          s"bin edges are the operator's contract); got ${dt.simpleString} — " +
          "quantize the measure to a long first")
    }
    // backtick-escaped identifier (the quantileGate rule) used for BOTH
    // the filter and the expr bin formula — a dotted name must not be
    // read as struct-field access anywhere; integer `div` has no Column
    // operator, so the bin formula goes through expr
    val q = "`" + field.name.replace("`", "``") + "`"
    val x = col(q).cast("long")
    df.filter(x >= lo && x < hi)
      .withColumn("bin", expr(s"((cast($q as bigint) - ${lo}L) * ${bins}L) div ${width}L"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .withColumn("lo_edge", lit(lo) + col("bin") * lit(width) / lit(bins.toLong))
      .withColumn("hi_edge", lit(lo) + (col("bin") + 1) * lit(width) / lit(bins.toLong))
  }

  /** Deterministic count-min sketch (Cormode & Muthukrishnan 2005) over
    * whitespace tokens: `depth` hash rows × `width` buckets, returned as
    * the (row, bucket, cnt) counter table.
    *
    * The 100 TB argument: an exact token frequency table shuffles one
    * group per DISTINCT token — unbounded vocabulary, Zipf-skewed keys.
    * The sketch's shuffle cardinality is bounded at depth × width groups
    * no matter the corpus, map-side combine collapses each partition to
    * ≤ depth × width rows before the exchange, and the result always
    * fits in driver/executor memory (it is broadcastable state for
    * [[countMinEstimate]]).
    *
    * Hash rows are md5-derived (hash48 of "cm<r>_<token>") — no RNG, no
    * engine-specific hash — so every bucket, and therefore every
    * estimate, replays bit-identically in DuckDB. */
  def countMinSketch(df: DataFrame, textCol: String,
                     depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1, "countMinSketch: depth must be >= 1")
    require(width >= 1, "countMinSketch: width must be >= 1")
    import graft.functions.TextFunctions.tokens
    // count per DISTINCT token first, hash after (r21, guide §2.3
    // aggregate-before-the-expensive-work): cmBuckets costs depth
    // md5-derived hashes per input row, and hashing token INSTANCES ran
    // ~vocabulary-to-instance-ratio (~60x here) more md5s than hashing
    // each distinct token once and summing its count into the counters.
    // Identical sketch: count(1) over instances grouped by (row, bucket)
    // == sum of per-token counts grouped by (row, bucket) — exact
    // integer arithmetic. STREAMS keep the single-aggregate instance
    // form: the two-level aggregate is a chained stateful aggregation,
    // which Structured Streaming rejects (and the stream twin's
    // update-mode counters need the one-aggregate shape anyway).
    if (df.isStreaming)
      df.select(explode(tokens(col(textCol))).as("tok"))
        .select(posexplode(cmBuckets(col("tok"), depth, width))
          .as(Seq("row", "bucket")))
        .groupBy("row", "bucket")
        .agg(count(lit(1)).as("cnt"))
    else
      countMinSketchFromCounts(
        df.select(explode(tokens(col(textCol))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt")),
        "tok", "cnt", depth, width)
  }

  /** [[countMinSketch]] from a PRE-AGGREGATED token-frequency frame
    * `(tokCol, cntCol)` — for callers that already hold exact token
    * counts (the q_countmin audit computes them for its exact top-k
    * side), so the corpus scan + vocabulary shuffle happen once.
    * Identical sketch: summing per-token counts into the counters equals
    * counting instances — exact integer arithmetic. */
  def countMinSketchFromCounts(tokenCounts: DataFrame, tokCol: String,
                               cntCol: String,
                               depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1, "countMinSketchFromCounts: depth must be >= 1")
    require(width >= 1, "countMinSketchFromCounts: width must be >= 1")
    tokenCounts
      .select(col(cntCol).as("__tc"),
        posexplode(cmBuckets(col(tokCol), depth, width)).as(Seq("row", "bucket")))
      .groupBy("row", "bucket")
      .agg(sum(col("__tc")).as("cnt"))
  }

  /** Classic CM point estimate for each probe token: MIN over the sketch
    * rows of the probed counters — an upper bound on the true count
    * (collisions only inflate). A probe whose bucket is absent from the
    * sketch reads 0 (no token ever hashed there). `probes` carries one
    * token per row in `tok`; the sketch side is broadcast (≤ depth ×
    * width rows by construction), so probing never shuffles the sketch. */
  def countMinEstimate(sketch: DataFrame, probes: DataFrame,
                       depth: Int = 4, width: Int = 256): DataFrame = {
    val pb = probes.select(col("tok"),
      posexplode(cmBuckets(col("tok"), depth, width)).as(Seq("row", "bucket")))
    pb.join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("n_est"))
  }

  /** The depth bucket ids of one token, as an array for posexplode:
    * element r = hash48("cm<r>_<token>") mod width. */
  private def cmBuckets(tok: Column, depth: Int, width: Int): Column = {
    import graft.functions.TextFunctions.hash48
    array((0 until depth).map(r =>
      pmod(hash48(concat(lit(s"cm${r}_"), tok)), lit(width.toLong))): _*)
  }

  /** Per-column profile — the data-card sibling of
    * [[graft.operators.Expectations]]: for each named column, row count,
    * null count, exact distinct count, and min/max rendered as strings.
    * ONE aggregate pass over the frame (the multi-distinct rides one
    * Expand — adding columns adds groupings, not scans); the melt to
    * long format explodes the single 1-row aggregate.
    *
    * Exactness note: min/max are computed on the NATIVE type and cast
    * to string after — pick columns whose string rendering is
    * engine-stable (integers/strings; a double would render
    * differently across engines). Exact distinct is the oracle-checked
    * tier; at 100 TB swap in approx_count_distinct and lose the hash
    * check, not the plan shape. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"profile: not in schema: $missing")
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_val"),
        col(s"__mx_$c").as("max_val"))): _*)).as("__e"))
      .select(col("__e.col_name"), col("__e.n_rows"), col("__e.n_null"),
        col("__e.n_distinct"), col("__e.min_val"), col("__e.max_val"))
  }

  /** Snapshot diff between two corpus versions: per-id status — `added`
    * (only in new), `removed` (only in old), `changed` (present in both
    * with a different `valueCol` fingerprint). Unchanged rows are NOT
    * emitted: the interesting delta is tiny by construction, and at
    * 100 TB materializing the unchanged majority is the bug. One
    * co-partitioned full-outer join on the id; fingerprints are md5 of
    * the value bytes (computed scan-local, so the shuffle carries a
    * fixed-width hash instead of the value). NULL values fingerprint as
    * NULL and compare null-safely: null→null is unchanged, null→value
    * is changed. */
  def datasetDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                  valueCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("id"),
      md5(col(valueCol).cast("binary")).as("__ofp"), lit(1).as("__op"))
    val n = newDf.select(col(idCol).as("id"),
      md5(col(valueCol).cast("binary")).as("__nfp"), lit(1).as("__np"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__op").isNull, "added")
          .when(col("__np").isNull, "removed")
          .when(!(col("__ofp") <=> col("__nfp")), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col("id").as(idCol), col("status"))
  }
}
