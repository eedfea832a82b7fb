package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, ModelStore, Similarity}

/** Trained-artifact store lifecycle (ModelStore scaladoc): versioned
  * atomic publishes, latest/pinned loads, pruning, staging-orphan
  * hygiene, and bit-exact codec round-trips for every artifact kind —
  * the property that lets `q_model_store_*` share their
  * retrain-per-query twins' oracles verbatim. */
class ModelStoreSuite extends SparkSpec {

  private def freshRoot(tag: String): String = {
    val p = s"/tmp/graft_modelstore_suite_${tag}_${ProcessHandle.current().pid()}"
    ModelStore.destroy(p)
    p
  }

  private def cents(vs: (Long, Seq[Double])*): Seq[(Long, Array[Double])] =
    vs.map { case (id, v) => (id, v.toArray) }

  test("publish/load versions: latest by default, pinned by number, ascending listing") {
    val root = freshRoot("versions")
    val v0 = ModelStore.saveCentroids(spark, root,
      cents(0L -> Seq(1.0, 0.0), 1L -> Seq(0.0, 1.0)))
    val v1 = ModelStore.saveCentroids(spark, root,
      cents(0L -> Seq(0.5, 0.5)))
    assert(v0 == 0 && v1 == 1)
    assert(ModelStore.versions(root, "kmeans_cells") == Seq(0, 1))
    assert(ModelStore.loadCentroids(spark, root).map(_._1) == Seq(0L))
    assert(ModelStore.loadCentroids(spark, root, version = 0)
      .map(_._1) == Seq(0L, 1L))
    ModelStore.destroy(root)
  }

  test("load refuses an untrained kind and a never-published version — loudly") {
    val root = freshRoot("guards")
    intercept[IllegalArgumentException](
      ModelStore.load(spark, root, "kmeans_cells"))
    ModelStore.saveCentroids(spark, root, cents(0L -> Seq(1.0)))
    val e = intercept[IllegalArgumentException](
      ModelStore.load(spark, root, "kmeans_cells", version = 7))
    assert(e.getMessage.contains("version 7"))
    intercept[IllegalArgumentException](
      ModelStore.load(spark, root, "no_such_kind"))
    // -1 is the only latest sentinel: other negatives must throw, not
    // silently alias to the newest model
    val n = intercept[IllegalArgumentException](
      ModelStore.load(spark, root, "kmeans_cells", version = -5))
    assert(n.getMessage.contains("-5"))
    intercept[IllegalArgumentException](
      ModelStore.publish(root, "Bad Kind!", spark.range(1).toDF()))
    ModelStore.destroy(root)
  }

  test("file: URI roots are accepted; remote schemes refused loudly") {
    // ADVICE r18: the store's POSIX contract is now enforced on the
    // ROOT's scheme (file: accepted and stripped for java.nio, remote
    // schemes refused), and the staged write/read go through explicit
    // file: URIs so a remote fs.defaultFS can never silently redirect
    // the artifact away from the directory the atomic rename operates on
    val plain = freshRoot("uri")
    val asUri = "file://" + plain
    val v0 = ModelStore.saveCentroids(spark, asUri, cents(0L -> Seq(1.0, 2.0)))
    assert(v0 == 0)
    // both spellings address the same store
    assert(ModelStore.versions(plain, "kmeans_cells") == Seq(0))
    assert(ModelStore.loadCentroids(spark, asUri).map(_._2.toSeq) ==
      Seq(Seq(1.0, 2.0)))
    assert(ModelStore.loadCentroids(spark, plain).map(_._2.toSeq) ==
      Seq(Seq(1.0, 2.0)))
    val e = intercept[IllegalArgumentException](
      ModelStore.load(spark, "hdfs://nn/models", "kmeans_cells"))
    assert(e.getMessage.contains("hdfs"))
    // an OPAQUE file: URI ("file:models" — no path after the scheme)
    // must hit the same loud guidance, not NPE inside Paths.get(null)
    val o = intercept[IllegalArgumentException](
      ModelStore.load(spark, "file:models", "kmeans_cells"))
    assert(o.getMessage.contains("opaque"))
    ModelStore.destroy(asUri)
    assert(!Files.isDirectory(Paths.get(plain)))
  }

  test("prune keeps the newest versions and sweeps staging orphans") {
    val root = freshRoot("prune")
    for (i <- 0 until 4)
      ModelStore.saveCentroids(spark, root, cents(i.toLong -> Seq(i.toDouble)))
    val orphan = Paths.get(root, "kmeans_cells", ".staging-dead")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("junk"), "not parquet")
    ModelStore.prune(root, "kmeans_cells", keep = 2)
    assert(ModelStore.versions(root, "kmeans_cells") == Seq(2, 3))
    assert(!Files.exists(orphan))
    // pruned versions refuse to load; the survivors still load pinned
    intercept[IllegalArgumentException](
      ModelStore.load(spark, root, "kmeans_cells", version = 0))
    assert(ModelStore.loadCentroids(spark, root, version = 2)
      .head._1 == 2L)
    intercept[IllegalArgumentException](
      ModelStore.prune(root, "kmeans_cells", keep = 0))
    ModelStore.destroy(root)
  }

  test("one root holds a whole model family under distinct kinds") {
    val root = freshRoot("family")
    ModelStore.saveCentroids(spark, root, cents(0L -> Seq(1.0)))
    ModelStore.saveCodebooks(spark, root,
      Seq(Seq(Array(0.1, 0.2), Array(0.3, 0.4))))
    ModelStore.saveSqBounds(spark, root, Array(-1.0), Array(1.0))
    ModelStore.saveLinearWeights(spark, root, Seq(10L, -20L), 5L)
    ModelStore.saveBpeMerges(spark, root, Seq("a b" -> 9L))
    assert(Seq("kmeans_cells", "pq_codebooks", "sq_bounds",
      "quality_weights", "bpe_merges").forall(ModelStore.exists(root, _)))
    ModelStore.destroy(root)
  }

  test("codec round-trips are bit-exact for every artifact kind") {
    val root = freshRoot("codec")
    // doubles chosen to have non-terminating binary expansions — a
    // lossy round-trip (e.g. via strings or floats) would show here
    val c = cents(3L -> Seq(0.1, -0.3, 1.0 / 3.0), 7L -> Seq(math.Pi, 0.0, -0.7))
    ModelStore.saveCentroids(spark, root, c)
    val c2 = ModelStore.loadCentroids(spark, root)
    assert(c2.map(_._1) == Seq(3L, 7L))
    assert(c2.map(_._2.toSeq) == c.map(_._2.toSeq))

    val books = Seq(
      Seq(Array(0.1, 0.2), Array(-0.3, 2.0 / 7.0)),
      Seq(Array(1e-17, -1e17), Array(math.E, 0.5)))
    ModelStore.saveCodebooks(spark, root, books)
    assert(ModelStore.loadCodebooks(spark, root).map(_.map(_.toSeq)) ==
      books.map(_.map(_.toSeq)))

    val (lo, hi) = (Array(-0.9, 1.0 / 7.0), Array(0.9, 2.0))
    ModelStore.saveSqBounds(spark, root, lo, hi)
    val (lo2, hi2) = ModelStore.loadSqBounds(spark, root)
    assert(lo2.toSeq == lo.toSeq && hi2.toSeq == hi.toSeq)

    val w = Seq(1L, -2L, 0L, Long.MaxValue)
    ModelStore.saveLinearWeights(spark, root, w, -7L)
    assert(ModelStore.loadLinearWeights(spark, root) == ((w, -7L)))

    // merge order IS the artifact — rank must survive parquet
    val merges = Seq("e r" -> 100L, "t h" -> 100L, "a n" -> 50L)
    ModelStore.saveBpeMerges(spark, root, merges)
    assert(ModelStore.loadBpeMerges(spark, root) == merges)
    ModelStore.destroy(root)
  }

  test("stored cells score identically to freshly trained ones (the q_model_store contract)") {
    import spark.implicits._
    val emb = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 13 + d * 7))))
      .toDF("vec_id", "embedding")
    val fresh = Similarity.kmeansCells(emb, "embedding", "vec_id",
      k = 4, iters = 2)
    val root = freshRoot("score")
    ModelStore.saveCentroids(spark, root, fresh)
    val loaded = ModelStore.loadCentroids(spark, root)
    assert(loaded.map(_._1) == fresh.map(_._1))
    assert(loaded.map(_._2.toSeq) == fresh.map(_._2.toSeq))
    val a = Similarity.kmeansAssignWithCells(emb, "embedding", "vec_id", loaded)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = Similarity.kmeansAssign(emb, "embedding", "vec_id",
      k = 4, iters = 2)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b)
    val d1 = Dedup.semanticDedupWithCells(emb, "embedding", "vec_id", loaded,
      minCosine = 0.5).orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    val d2 = Dedup.semanticDedup(emb, "embedding", "vec_id", k = 4, iters = 2,
      minCosine = 0.5).orderBy("vec_id").collect().map(_.getLong(0)).toSeq
    assert(d1 == d2)
    ModelStore.destroy(root)
  }
}
