package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  * Beyond-reference surface for the `embeddings` table.
  *
  * Two paths:
  *   - [[bruteForceTopK]] — exact cosine top-k. One pass over the corpus
  *     per query batch (broadcast the queries, not the corpus); the
  *     baseline and the recall oracle for the approximate paths.
  *   - [[lshTopK]] — hyperplane-LSH bucketed search: only candidates in
  *     the query's bucket (and optional neighboring probes) are scored.
  *     At 100 TB the bucket join prunes the scan to ~corpus/2^k per probe.
  */
object Similarity {

  /** Exact top-k by cosine for each query row. `queries` is expected to be
    * small (it is broadcast); the corpus is streamed, never collected.
    * Returns (query_id, vec_id, cos, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     vecCol: String, idCol: String,
                     queryIdCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
    val q = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }

  /** LSH-bucketed ANN: corpus and queries are bucketed by sign-bit
    * hyperplane hash; candidates share the bucket (multi-probe: flip up to
    * `probeBits` of the query's bits). Recall is tunable via plane count
    * and probes; scoring cost drops from |corpus| to the bucket sizes. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
              vecCol: String, idCol: String, queryIdCol: String,
              k: Int, dim: Int, numPlanes: Int = 8,
              probeBits: Int = 1): DataFrame = {
    val planes = randomPlanes(numPlanes, dim)
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .withColumn("bucket", hyperplaneBucket(col("cv"), planes))
    // query buckets + single-bit-flip probes (multi-probe LSH)
    val qBase = queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qbucket", hyperplaneBucket(col("qv"), planes))
    val probes: Column = if (probeBits >= 1) {
      val flips = (0 until numPlanes).map(i =>
        col("qbucket").bitwiseXOR(shiftleft(lit(1L), i)))
      array((col("qbucket") +: flips): _*)
    } else array(col("qbucket"))
    val q = qBase.withColumn("bucket", explode(probes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rank"))
  }
}
