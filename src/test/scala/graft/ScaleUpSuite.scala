package graft

import org.apache.spark.sql.functions._

/** Pins the ScaleUp rehearsal-image contracts (PLANS.md round 19): the
  * stride must clear every source key including under CHAINED scaling,
  * and the per-copy text perturbation must be length-preserving, keep
  * within-copy dup relationships, break cross-copy near-identity, and
  * never have a later chain level erase an earlier level's tags. These
  * are the two bugs the sf10 rehearsal itself found (stride collapse;
  * quadratic dup space), kept from regressing. */
class ScaleUpSuite extends SparkSpec {

  // ---- strideFor: smallest power of ten > maxKey ----

  test("strideFor clears the max key and rounds up to a power of ten") {
    assert(ScaleUp.strideFor(0L) == 1L)
    assert(ScaleUp.strideFor(9L) == 10L)
    assert(ScaleUp.strideFor(10L) == 100L)
    assert(ScaleUp.strideFor(9999999L) == 10000000L)
    // the chaining bug: after one 10x pass keys reach ~1e8, so the next
    // stride must be 1e9, NOT the old hard-coded 1e7
    assert(ScaleUp.strideFor(99999999L) == 100000000L)
    assert(ScaleUp.strideFor(100000000L) == 1000000000L)
  }

  // ---- perturbText invariants ----

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog 123, twice!",
    "the quick brown fox jumps over the lazy dog 123, twice!", // exact dup
    "the quick brown fox jumps over the lazy dog 456, once?", // near dup
    "a bb ccc dddd eeeee ffffff", // short runs straddling block sizes
    "1234 5678 !!", // no letters at all: perturbation is identity
    "")

  private def perturbed(stridePow: Int, k: Int): Seq[String] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(texts.map(Tuple1(_)), 2))
      .toDF("text")
    df.select(ScaleUp.perturbText(col("text"), stridePow, k).as("t"))
      .collect().map(_.getString(0)).toSeq
  }

  test("perturbText: copy 0 is the identity") {
    assert(perturbed(7, 0) == texts)
  }

  test("perturbText is length-preserving (the n_chars invariant)") {
    for (k <- 1 to 3; p <- Seq(7, 8)) {
      val out = perturbed(p, k)
      assert(out.map(_.length) == texts.map(_.length),
        s"length changed at stridePow=$p k=$k")
    }
  }

  test("perturbText keeps within-copy dup relationships") {
    for (k <- 1 to 3) {
      val out = perturbed(7, k)
      // the exact-dup pair stays an exact dup inside every copy
      assert(out(0) == out(1), s"exact dup broken in copy $k")
      // letterless text is untouched (no block to tag)
      assert(out(4) == texts(4))
      assert(out(5) == "")
    }
  }

  test("perturbText makes copies mutually distinct (linear dup space)") {
    val base = texts.head
    val outs = (1 to 9).map(k => perturbed(7, k).head)
    // every copy differs from the base and from every other copy — the
    // cross-copy near-identity that made chained dup groups multiply
    // cannot form from equal text
    assert(!outs.contains(base))
    assert(outs.distinct.size == outs.size)
  }

  test("perturbText: a later chain level never erases an earlier tag") {
    // chained decades write different in-block offsets (stridePow % 4),
    // so level-2 substitution must not overwrite level-1's position:
    // copy (k1=1, k2=0) and copy (k1=0, k2=1) of the same base document
    // must stay distinct (with a single shared offset they'd collapse
    // back into exact dups whenever the tags matched positions)
    val base = texts.head
    def once(s: String, p: Int, k: Int): String = {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Tuple1(s)), 1)).toDF("text")
      df.select(ScaleUp.perturbText(col("text"), p, k).as("t"))
        .head().getString(0)
    }
    val level1then2 = once(once(base, 7, 1), 8, 0) // tagged at level 1 only
    val level2only = once(once(base, 7, 0), 8, 1)  // tagged at level 2 only
    val both = once(once(base, 7, 1), 8, 1)
    assert(level1then2 != level2only)
    assert(both != level1then2 && both != level2only)
    // and the level-1 tag is still visible after a level-2 pass: undoing
    // level 2 is not needed to distinguish level-1 copies
    val l1a = once(once(base, 7, 1), 8, 3)
    val l1b = once(once(base, 7, 2), 8, 3)
    assert(l1a != l1b, "level-2 pass erased the level-1 distinction")
  }

  // ---- scaledCopies: key shift + referential integrity ----

  test("scaledCopies shifts keys by copy*stride and preserves joins") {
    import spark.implicits._
    val orders = Seq((1L, 10L), (2L, 11L)).toDF("o_orderkey", "o_custkey")
    val items = Seq((1L, 5.0), (1L, 6.0), (2L, 7.0))
      .toDF("l_orderkey", "l_qty")
    val so = ScaleUp.scaledCopies(orders, Seq("o_orderkey", "o_custkey"),
      stride = 100L, stridePow = 2, textCol = None)
    val si = ScaleUp.scaledCopies(items, Seq("l_orderkey"),
      stride = 100L, stridePow = 2, textCol = None)
    assert(so.count() == 20 && si.count() == 30)
    // keys never collide across copies
    assert(so.select("o_orderkey").distinct().count() == 20)
    // every item still finds exactly its order: join cardinality is 10x
    assert(so.join(si, so("o_orderkey") === si("l_orderkey")).count() == 30)
    // copy k's keys are base + k*stride
    val copy3 = so.filter(col("o_orderkey") >= 300 && col("o_orderkey") < 400)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(copy3 == Seq(301L, 302L))
  }
}
