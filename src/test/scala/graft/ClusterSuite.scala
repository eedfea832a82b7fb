package graft

import org.apache.spark.sql.functions._
import graft.api.toDf
import graft.operators.Dedup

/** Connected-components clustering over candidate-pair graphs. */
class ClusterSuite extends SparkSpec {

  test("connectedComponents labels every node with the min reachable id") {
    // three components: a 7-chain (forces several propagation rounds —
    // min-label needs O(diameter) iterations to cross it), a pair, and a
    // triangle with a redundant edge
    val pairs = toDf(spark)(
      "id_a" -> Seq(1, 2, 3, 4, 5, 6, 10, 20, 21, 20),
      "id_b" -> Seq(2, 3, 4, 5, 6, 7, 11, 21, 22, 22)).df
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(got == want)
  }

  test("clusterByMinhash keeps singletons as their own cluster") {
    val docs = toDf(spark)(
      "doc_id" -> Seq(1, 2, 3),
      "text" -> Seq(
        "alpha beta gamma delta epsilon zeta eta",
        "alpha beta gamma delta epsilon zeta eta",
        "a completely different and unrelated sentence here")).df
    val out = Dedup.clusterByMinhash(docs, "text", "doc_id", minEstJaccard = 0.5)
      .select("doc_id", "cluster_id")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }
}
