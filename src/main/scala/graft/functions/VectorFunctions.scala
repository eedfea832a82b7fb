package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns, built from
  * higher-order functions (`zip_with` + `aggregate`) — no UDF, no driver
  * loop; each row's fold runs left-to-right, which keeps results
  * deterministic across engines and runs.
  *
  * Beyond-reference (the reference has no vector columns): this is the
  * foundation for embedding similarity search and near-dup detection over
  * the `embeddings` table.
  */
object VectorFunctions {

  def toDoubleArray(a: Column): Column = transform(a, x => x.cast("double"))

  /** Dot product; inputs are cast to double element-wise first. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Squared L2 distance. */
  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(toDoubleArray(a), toDoubleArray(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Sign-bit LSH bucket for cosine similarity: the bit pattern of
    * `sign(v · p_i)` over `planes` (fixed pseudo-random hyperplanes).
    * Vectors colliding in a bucket are near-duplicate candidates; two
    * vectors at cosine θ collide with probability (1 - θ/π)^k. */
  def hyperplaneBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val lp = array(p.map(lit).toIndexedSeq: _*)
      when(dot(v, lp) >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Deterministic pseudo-random unit hyperplanes (fixed seed — bucket
    * assignment must be stable across runs and executors). */
  def randomPlanes(k: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k) {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
  }
}
