package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** SemDeDup semantics (Abbas et al. 2023): trained-cell blocking,
  * in-cell cosine pairs, greedy larger-id-loses survivors — plus the
  * capped-cell discipline every LSH-family stage shares and the
  * documented cross-cell blocking miss. */
class SemanticDedupSuite extends SparkSpec {
  import spark.implicits._

  // two well-separated directions; ids 0 and 1 are the deterministic
  // Lloyd seeds, so they anchor one cell each
  private def corpus = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),      // cluster A anchor
    (1L, Array(0f, 1f, 0f, 0f)),      // cluster B anchor
    (2L, Array(1f, 0.01f, 0f, 0f)),   // near-dup of 0 (cos ≈ 1)
    (3L, Array(0f, 1f, 0.01f, 0f)),   // near-dup of 1
    (4L, Array(0f, 0f, 0f, 1f))       // orthogonal singleton
  ).toDF("vec_id", "embedding")

  test("within-cell near-dups drop their larger id; singletons survive") {
    val out = Dedup.semanticDedup(corpus, "embedding", "vec_id",
      k = 2, iters = 1, minCosine = 0.9)
      .orderBy("vec_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 4L))
    // the survivors' cells pin the trained assignment: 2 rode with 0, 3
    // with 1. Vector 4 ties at cosine 0 only at the ROUND-0 assignment
    // (joining cell 0 via the smallest-cell rule); the single Lloyd
    // update then folds it into cell 0's centroid, so the FINAL
    // assignment is a strict cosine win for cell 0, not a tie — the tie
    // rule itself is pinned by the iters = 0 test below.
    val cells = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells(0L) != cells(1L), "anchors must land in different cells")
    assert(cells(4L) == cells(0L), "round-0 tie fed vec 4 into cell 0")
  }

  test("semanticContaminationReport: hits, max, nearest with smallest-id ties") {
    import graft.operators.Similarity
    val bench = Seq((100L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val cor = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),     // cos 1.0  (hit)
      (2L, Array(1f, 0f, 0f, 0f)),     // cos 1.0  (hit, ties 1 — loses on id)
      (3L, Array(0f, 1f, 0f, 0f)),     // cos 0.0  (miss)
      (4L, null.asInstanceOf[Array[Float]]) // null embedding: excluded
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticContaminationReport(cor, bench,
      "embedding", "vec_id", minCos = 0.9).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 100L)
    assert(r.getLong(1) == 2L, "two vectors within the radius")
    assert(r.getDouble(2) == 1.0)
    assert(r.getLong(3) == 1L, "cosine tie -> smallest corpus id")
  }

  test("an exact cosine tie takes the smallest cell (kmeansAssign tie rule)") {
    // iters = 0 assigns against the RAW seed vectors, so the orthogonal
    // vector 4 scores cosine 0 against both seeds — a genuine final
    // tie, resolved to the smaller cell id (first max position, cells
    // ascending)
    val cells = graft.operators.Similarity
      .kmeansAssign(corpus, "embedding", "vec_id", k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cells(4L) == 0L, "cosine-0 tie against both seeds must pick cell 0")
    assert(cells(2L) == 0L && cells(3L) == 1L, "near-dups follow their anchors")
  }

  test("semanticPairs finds in-cell pairs and misses the cross-cell one") {
    // 2 and 3 are near-dups of DIFFERENT anchors: blocking by cell means
    // the (0,2) and (1,3) pairs are found, but a hypothetical pair
    // crossing cells never forms — the documented recall trade every
    // blocked dedup stage makes
    val pairs = Dedup.semanticPairs(corpus, "embedding", "vec_id",
      k = 2, iters = 1, minCosine = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 2L), (1L, 3L)))
  }

  test("a cell past bucketCap is dropped whole (capped-cell discipline)") {
    val mono = (0L until 10L).map(i => (i, Array(1f, i.toFloat * 1e-4f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    // k = 1: every vector lands in the single seeded cell
    val capped = Dedup.semanticDedup(mono, "embedding", "vec_id",
      k = 1, iters = 1, minCosine = 0.9, bucketCap = 5)
      .orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(capped == (0L until 10L), "over-cap cell must drop, keeping all")
    val uncapped = Dedup.semanticDedup(mono, "embedding", "vec_id",
      k = 1, iters = 1, minCosine = 0.9, bucketCap = 16)
      .orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(uncapped == Seq(0L), "within cap, the greedy rule keeps min id")
  }

  test("semanticDecontaminate: literal tier drops near-bench, keeps orthogonal and null") {
    import graft.operators.Similarity
    val bench = Seq((100L, Seq(1.0, 0.0, 0.0), 9)).toDF("vec_id", "embedding", "label")
    val corpus = Seq(
      (1L, Seq(0.99, 0.1, 0.0), 0),   // near the bench vector -> dropped
      (2L, Seq(0.0, 1.0, 0.0), 1),    // orthogonal -> kept
      (3L, Seq(-1.0, 0.0, 0.0), 2))   // opposite -> kept
      .toDF("vec_id", "embedding", "label")
      .unionByName(Seq((4L, 3)).toDF("vec_id", "label")
        .withColumn("embedding",
          lit(null).cast("array<double>"))
        .select("vec_id", "embedding", "label"))
    val out = Similarity.semanticDecontaminate(corpus, bench,
      "embedding", "vec_id", minCos = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(2L, 3L, 4L), s"got $out")
  }

  test("semanticDecontaminate: relational tier matches the literal tier") {
    import graft.operators.Similarity
    val bench = Seq(
      (100L, Seq(1.0, 0.0, 0.0), 9),
      (101L, Seq(0.0, 1.0, 0.0), 9)).toDF("vec_id", "embedding", "label")
    val corpus = (0 until 40).map { i =>
      val a = i * 0.157
      (i.toLong, Seq(math.cos(a), math.sin(a), 0.1), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val lit0 = Similarity.semanticDecontaminate(corpus, bench,
      "embedding", "vec_id", minCos = 0.95)
      .collect().map(_.getLong(0)).toSet
    val rel = Similarity.semanticDecontaminate(corpus, bench,
      "embedding", "vec_id", minCos = 0.95, maxLiteralVectors = 1)
      .collect().map(_.getLong(0)).toSet
    assert(lit0 == rel, s"literal=$lit0 relational=$rel")
    assert(lit0.nonEmpty && lit0.size < 40, "threshold must bite both ways")
  }

  test("semanticDecontaminate: literal tier is a pure projection (no join/exchange)") {
    import graft.operators.Similarity
    val bench = Seq((100L, Seq(1.0, 0.0), 9)).toDF("vec_id", "embedding", "label")
    val corpus = Seq((1L, Seq(0.0, 1.0), 0)).toDF("vec_id", "embedding", "label")
    val plan = Similarity.semanticDecontaminate(corpus, bench,
      "embedding", "vec_id", minCos = 0.9)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), s"plan:\n$plan")
  }
}
