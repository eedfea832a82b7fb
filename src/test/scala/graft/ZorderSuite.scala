package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

/** Z-order layout: Morton-key arithmetic is engine-exact, and the
  * clustered layout actually delivers multi-dimensional file pruning —
  * the min/max file-stat intersection counts that drive parquet
  * row-group skipping improve on BOTH dimensions vs a one-column sort.
  */
class ZorderSuite extends SparkSpec {

  /** Driver-side replica of quantize + zorderKey for two dims. */
  private def mortonRef(x: Long, y: Long, lo: Long, hi: Long, bits: Int): Long = {
    def q(v: Long) = (v - lo) * (1L << bits) / (hi - lo + 1)
    val (qx, qy) = (q(x), q(y))
    (0 until bits).map { j =>
      (((qx >> j) & 1L) << (j * 2)) | (((qy >> j) & 1L) << (j * 2 + 1))
    }.reduce(_ | _)
  }

  test("zorderKey matches driver-side integer replica (exact arithmetic)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (1L, 2L), (170L, 85L), (200L, 13L))
    val df = rows.toDF("x", "y")
    val bits = 8
    val key = Layout.zorderKey(Seq(
      Layout.quantize(col("x"), 0L, 255L, bits),
      Layout.quantize(col("y"), 0L, 255L, bits)), bits)
    val got = df.select(col("x"), col("y"), key.as("z")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == mortonRef(x, y, 0, 255, bits),
        s"morton($x,$y)")
    }
    // identity domain [0, 2^bits): quantize is the identity, and the
    // interleave is a bijection — corners map where they must
    assert(got((0L, 0L)) == 0L)
    assert(got((255L, 255L)) == 65535L)
    assert(got((255L, 0L)) == 0x5555L)  // all even (x) lanes set
    assert(got((0L, 255L)) == 0xAAAAL)  // all odd (y) lanes set
  }

  test("quantize is exact integer division, not float") {
    import spark.implicits._
    // (2^53-1) * 256 / 3: the double path rounds to ...608, exact is ...565
    val v = (1L << 53) - 1L
    val exact = v * 256L / 3L
    assert(exact != (v.toDouble * 256.0 / 3.0).toLong,
      "test constants no longer exercise double rounding")
    val got = Seq(v).toDF("x")
      .select(Layout.quantize(col("x"), 0L, 2L, 8).as("q"))
      .head.getLong(0)
    assert(got == exact, "quantize went through double")
  }

  test("zorder layout prunes file stats on BOTH dims; 1-col sort only on one") {
    import spark.implicits._
    // full 256x256 grid: zkey is a bijection onto [0, 65536)
    val grid = spark.range(65536)
      .select((col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))

    val zdir = "/tmp/graft_zorder_layout"
    val sdir = "/tmp/graft_sorted_layout"
    Layout.clusterByZorder(grid, Seq(("x", 0L, 255L), ("y", 0L, 255L)),
      bits = 8, numPartitions = Some(16))
      .write.mode("overwrite").parquet(zdir)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sdir)

    // files whose [min,max] stats could satisfy `dim <= 15` — the same
    // intersection test parquet row-group skipping performs
    def matchingFiles(dir: String, dim: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col(dim)).as("lo"))
        .filter(col("lo") <= 15).count()

    def totalFiles(dir: String): Long =
      spark.read.parquet(dir).select(input_file_name()).distinct().count()

    assert(totalFiles(zdir) == 16 && totalFiles(sdir) == 16)
    // sorted-by-x layout: x filter prunes hard, y filter scans everything
    assert(matchingFiles(sdir, "x") <= 2)
    assert(matchingFiles(sdir, "y") == 16)
    // zorder: BOTH dims prune — top zkey bits fix the high lanes of both
    // x and y, so `<= 15` (high bits zero) reaches ~4 of 16 files (the
    // range partitioner samples boundaries, so allow one straddler per cut)
    assert(matchingFiles(zdir, "x") <= 6,
      s"x pruning lost under zorder: ${matchingFiles(zdir, "x")}/16")
    assert(matchingFiles(zdir, "y") <= 6,
      s"y pruning lost under zorder: ${matchingFiles(zdir, "y")}/16")

    // and the layout is lossless: same rows, just reordered
    assert(spark.read.parquet(zdir).count() == 65536)
    assert(spark.read.parquet(zdir)
      .select(sum(col("x") * 65536L + col("y"))).head.getLong(0) ==
      grid.select(sum(col("x") * 65536L + col("y"))).head.getLong(0))
  }
}
