package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize a 10x scale point from sf0.1 for the slope
  * rehearsal (the tri-scale audit tops out at ~600k lineitem rows; the
  * design claims are 100 TB, so PLANS.md wants a fourth point). Driver
  * testdata is read-only — this writes `<outDir>/<table>.parquet` with
  * ten referentially-intact copies of each scaled table:
  *
  *  - every synthetic key (order/cust/part/supp/event/user/doc/vec)
  *    shifts by `copy * Stride`, so joins stay referentially exact and
  *    key spaces never collide across copies;
  *  - dimension tables (region, nation) are fixed points of scale, as
  *    in TPC-H;
  *  - document text for copies >= 1 gets a per-copy LETTER SUBSTITUTION
  *    (one letter in each 4-letter block of every letter-run becomes
  *    the copy's tag character), which makes copies of one doc mutually
  *    DISSIMILAR
  *    under word-shingle Jaccard while every pair of docs WITHIN a copy
  *    keeps its original exact/near-dup relationship (both sides
  *    transform identically). So each original dup/near-dup pair
  *    replicates once per copy — dup-pair space grows LINEARLY with
  *    corpus size, the realistic "crawl got bigger" shape. The original
  *    " rep$k" SUFFIX scheme violated exactly this when CHAINED
  *    (sf0.1 -> sf1 -> sf10): suffixed variants of one base doc stayed
  *    pairwise near-identical, so group size MULTIPLIED per decade
  *    (10 -> 100) and the pairwise truth space of the recall-eval
  *    family went quadratic — at sf10 the exact-Jaccard truth join
  *    spilled >70 GB and died, measuring the image's redundancy shape,
  *    not the engine. Substitution keeps `length(text)` (and therefore
  *    the stored `n_chars` fixture invariant) unchanged, and the tag
  *    alphabet is offset by the stride's magnitude so chained levels
  *    never reuse a tag (copy (0,k) of level 2 is never identical to
  *    copy (k,0) of level 1);
  *  - timestamps and value distributions are untouched (10x rows per
  *    window/group, the density growth a bigger corpus actually has).
  *
  * Usage: `sbt "runMain graft.ScaleUp /root/testdata/sf0.1 target/sf1"`.
  * Determinism: pure column arithmetic over deterministic input — no
  * RNG, no sampling — so reruns are bit-identical. */
object ScaleUp {

  private val Copies = 10

  /** Key columns shifted per copy, per scaled table. Dimension tables
    * (region, nation) are fixed points of scale, as in TPC-H. */
  private val ScaledKeys: Seq[(String, Seq[String])] = Seq(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: ScaleUp <srcSfDir> <outDir>")
    val (src, out) = (args(0), args(1))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")

    // The copy stride must exceed EVERY key value in the SOURCE image,
    // so it is computed from the input, never hard-coded: the original
    // `1e7 > any sf0.1 key` constant silently broke CHAINED scaling
    // (sf0.1 -> sf1 -> sf10) — sf1 keys already reach base + 9e7, so a
    // second 1e7-stride pass collapsed distinct copies onto the same
    // key (caught by withGlobalNtile's order-uniqueness guard at sf10:
    // 60M rows, 11.4M distinct (l_orderkey, l_linenumber)). Rounded up
    // to a power of ten so shifted ids stay human-readable.
    val maxKey = ScaledKeys.map { case (t, ks) =>
      read(t).select(ks.map(c => max(col(c).cast("long")))
        .reduce((a, b) => greatest(a, b))).head().getLong(0)
    }.max
    val stride =
      math.pow(10, math.ceil(math.log10((maxKey + 1).toDouble))).toLong
    println(s"[scaleup] max source key $maxKey -> stride $stride")

    // Per-copy tag letters, offset by the stride magnitude so chained
    // applications (different stride decades) never pick the same tag
    // for the same copy index. Levels 9 apart in `pow` could wrap onto
    // each other, but real chains differ by exactly one decade.
    // The substituted OFFSET inside each 4-letter block also rotates
    // with the stride magnitude: letter runs are length-preserved, so
    // a later level's blocks align with an earlier level's — writing
    // the same offset again would ERASE the earlier tags and collapse
    // all earlier-level variants sharing a final copy index back into
    // exact dups. Distinct offsets keep every level's tag visible
    // (holds for up to 4 chained decades — sf1000 from sf0.1).
    val stridePow = math.round(math.log10(stride.toDouble)).toInt
    val tagOffset = stridePow % 4

    /** Union of `Copies` key-shifted images of `df`. `keys` columns get
      * `+ copy*stride`; `textCol` (if set) gets the per-copy letter
      * substitution described above — length-preserving, so the stored
      * `n_chars == length(text)` fixture invariant holds untouched. */
    def scaled(df: DataFrame, keys: Seq[String],
               textCol: Option[String] = None): DataFrame =
      (0 until Copies).map { k =>
        val shifted = keys.foldLeft(df) { (d, c) =>
          d.withColumn(c, col(c) + lit(k * stride)) }
        textCol match {
          case Some(tc) if k > 0 =>
            val tag = ('a' + (stridePow * 9 + k) % 26).toChar
            val pat = s"([A-Za-z]{$tagOffset})[A-Za-z]([A-Za-z]{${3 - tagOffset}})"
            shifted.withColumn(tc,
              regexp_replace(col(tc), pat, "$1" + tag + "$2"))
          case _ => shifted
        }
      }.reduce(_ unionAll _)

    val keysOf = ScaledKeys.toMap
    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> read("region"),
      "nation" -> read("nation")) ++ ScaledKeys.map { case (t, _) =>
      t -> scaled(read(t), keysOf(t),
        textCol = if (t == "documents") Some("text") else None)
    }

    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    spark.stop()
  }
}
