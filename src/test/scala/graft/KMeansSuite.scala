package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.sources.Tables

/** Deterministic spherical k-means assignment (the IVF centroid path). */
class KMeansSuite extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("kmeansAssign is total, labels within the seed set, and deterministic") {
    val emb = Tables.df(spark, sfDir, "embeddings")
    val n = emb.count()
    val a = Similarity.kmeansAssign(emb, "embedding", "vec_id", k = 4, iters = 2)
    val rows = a.collect()
    assert(rows.length == n)                    // every vector gets a cell
    val cells = rows.map(_.getLong(1)).toSet
    assert(cells.subsetOf((0L until 4L).toSet)) // labels are seed ids
    assert(cells.size > 1)                      // corpus actually splits
    val b = Similarity.kmeansAssign(emb, "embedding", "vec_id", k = 4, iters = 2)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq)
  }

  test("kmeansCentroids feed ivfTopK (the production IVF path)") {
    val emb = Tables.df(spark, sfDir, "embeddings")
    val cents = Similarity.kmeansCentroids(emb, "embedding", "vec_id",
      k = 4, iters = 2)
    assert(cents.length == 4 && cents.forall(_.length == 64))
    val out = Similarity.ivfTopK(
      corpus = emb, queries = emb.filter(col("vec_id") === 0),
      centroids = cents, vecCol = "embedding", idCol = "vec_id",
      queryIdCol = "vec_id", k = 5)
    val rows = out.collect()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("iters=0 reduces to nearest-seed assignment") {
    val emb = Tables.df(spark, sfDir, "embeddings")
    val a0 = Similarity.kmeansAssign(emb, "embedding", "vec_id", k = 4, iters = 0)
    // seed vectors must map to their own cell (cos(v, v) = 1 is the max)
    val seeds = a0.filter(col("vec_id") < 4).collect()
    assert(seeds.forall(r => r.getLong(0) == r.getLong(1)))
  }
}
