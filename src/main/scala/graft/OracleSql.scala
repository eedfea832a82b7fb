package graft

import graft.operators.Dedup
import graft.functions.VectorFunctions

/** DuckDB oracle SQL for the LSH pipelines, generated from the SAME
  * constants the Spark plans embed (Dedup.perm, VectorFunctions
  * .hashPlanes), so the oracle replays every hash, bucket, and cosine
  * bit-exactly. This is what makes the MinHash/SimHash/embedding queries
  * hash-checkable instead of rows-only: the engine-specific xxhash64 of
  * the earlier design had no DuckDB counterpart; md5-derived hash48 does
  * (`('0x' || substring(md5(x),1,12))::BIGINT`).
  */
object OracleSql {

  private val P = Dedup.P

  /** DuckDB spelling of TextFunctions.hash48. */
  private def h48(e: String): String =
    s"('0x' || substring(md5($e), 1, 12))::BIGINT"

  /** Predicate replaying `Sampling.evalSample(df, "doc_id", fraction)` —
    * the deterministic bound the exact-eval ledger entries run under.
    * Returned WITHOUT a leading WHERE so callers can conjoin it. */
  def evalSampleWhere(fraction: Double, seed: Long = 42L): String =
    s"${h48(s"'graft_eval_${seed}_' || doc_id")} % 1000000 < " +
      s"${graft.operators.Sampling.cutFor(fraction)}"

  /** Cents SUM with the ::BIGINT discipline built in. DuckDB types a
    * SUM(BIGINT) — window or grouped — as HUGEINT (INT128); the driver's
    * result hash is type-sensitive, so against Spark's LONG the bare sum
    * fails hash_match even when every value is bit-identical. The outer
    * CAST pins the portable type. `over` is "" for grouped aggregates, or
    * the full window clause ("OVER (...)" / "OVER w") for window sums. */
  def centsSum(expr: String, over: String = ""): String = {
    val o = if (over.isEmpty) "" else s" $over"
    s"CAST(SUM(CAST(round($expr * 100.0, 0) AS BIGINT))$o AS BIGINT)"
  }

  /** Exact double literal that DuckDB parses back to the same IEEE value
    * (Java shortest round-trip repr) — WITH an exponent suffix forced:
    * DuckDB types a plain decimal literal as DECIMAL and converts
    * DECIMAL→DOUBLE through an int128/10^scale division that DOUBLE-
    * ROUNDS 17-significant-digit constants (found via q_jl_project: 226
    * of 500 dots off by 1 ulp; an exponent makes the lexer emit DOUBLE
    * directly, correctly-rounded parse, 0 of 500). */
  private def dlit(d: Double): String = {
    require(java.lang.Double.isFinite(d),
      s"dlit: non-finite constant $d has no DuckDB double literal")
    val s = java.lang.Double.toString(d)
    if (s.contains("E") || s.contains("e")) s
    else if (s.contains(".")) s + "e0"
    else s + ".0e0"
  }

  private def dot(a: String, b: String): String = s"list_dot_product($a, $b)"

  private def planeList(p: Array[Double]): String =
    p.map(dlit).mkString("[", ", ", "]")

  /** DuckDB expression for VectorFunctions.hyperplaneBucket over `v`. */
  private def bucketExpr(v: String, planes: Seq[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN ${dot(v, planeList(p))} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def cosExpr(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  /** Replays Dedup.minhashCandidates (k=32, shingle 3, 8 bands of 4,
    * bucketCap 64) + the query's minEstJaccard filter. */
  /** Survivor side of Dedup.dedupByMinhash: documents that never appear
    * as the larger id of a candidate pair. */
  def minhashSurvivors(k: Int = 32, shingleSize: Int = 3, bands: Int = 8,
                       bucketCap: Int = 64, minEstJaccard: Double = 0.5): String = {
    val pairs = minhashPairs(k, shingleSize, bands, bucketCap, minEstJaccard)
      .replaceAll("ORDER BY id_a, id_b\\s*$", "")
    s"""SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT DISTINCT id_b FROM ($pairs))
       |ORDER BY doc_id""".stripMargin
  }

  /** Shared Lloyd CTE chain `e, c0, s0, a0, g1, c1, … c{iters}` (plus a
    * final assignment `s{iters}, a{iters}` when `withFinalAssign`):
    * `iters` quantized-mean rounds from the deterministic seeds
    * (vec_id < k), mirroring the Spark loop in `Similarity.lloyd` round
    * for round — `c$iters` holds the TRAINED centroids (cell = seed id,
    * cv = element list ordered by position). Used by both the kmeans
    * assignment oracle and the trained-centroid IVF oracles, so the
    * centroid replay is written once. */
  private def lloydCtes(k: Int, iters: Int, dim: Int,
                        withFinalAssign: Boolean): String = {
    val S = "1000000.0"
    def sN(i: Int) =
      s"""s$i AS (SELECT e.vec_id, c.cell, ${cosExpr("e.v", "c.cv")} AS cos
         |  FROM e CROSS JOIN c$i c)""".stripMargin
    def aN(i: Int) =
      s"""a$i AS (SELECT vec_id, MIN(cell) AS cell FROM (
         |    SELECT vec_id, cell, cos, MAX(cos) OVER (PARTITION BY vec_id) AS mx
         |    FROM s$i) x
         |  WHERE cos = mx GROUP BY vec_id)""".stripMargin
    def gN(i: Int) =
      s"""g$i AS (SELECT a${i - 1}.cell, t.pos,
         |    (SUM(CAST(floor(e.v[t.pos] * $S + 0.5) AS BIGINT)))::BIGINT AS sm,
         |    COUNT(*) AS cnt
         |  FROM a${i - 1} JOIN e USING (vec_id)
         |  CROSS JOIN unnest(range(1, ${dim + 1})) AS t(pos)
         |  GROUP BY a${i - 1}.cell, t.pos)""".stripMargin
    def cN(i: Int) =
      s"""c$i AS (SELECT cell, list(sm / (cnt * $S) ORDER BY pos) AS cv
         |  FROM g$i GROUP BY cell)""".stripMargin
    val rounds = (0 until iters).flatMap(i =>
      Seq(sN(i), aN(i), gN(i + 1), cN(i + 1))) ++
      (if (withFinalAssign) Seq(sN(iters), aN(iters)) else Nil)
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < $k),
       |${rounds.mkString(",\n")}""".stripMargin
  }

  /** Replays Similarity.kmeansAssign: `iters` Lloyd rounds from the
    * deterministic seeds (vec_id < k), centroid means via quantized long
    * sums, cosine assignment with smallest-cell tie-break. */
  def kmeansAssign(k: Int = 8, iters: Int = 2, dim: Int = 64): String =
    s"""WITH ${lloydCtes(k, iters, dim, withFinalAssign = true)}
       |SELECT vec_id, cell FROM a$iters ORDER BY vec_id""".stripMargin

  /** Replays q_cluster_sample: the trained k-means assignment composed
    * with Sampling.stratifiedTopN per cell (deterministic md5 rank,
    * seed 42, tag "stratn" — the hashBucket spelling). */
  def clusterSample(k: Int = 8, iters: Int = 2, dim: Int = 64,
                    n: Int = 10): String =
    s"""WITH ${lloydCtes(k, iters, dim, withFinalAssign = true)}
       |SELECT vec_id, cell FROM (
       |  SELECT vec_id, cell, row_number() OVER (PARTITION BY cell
       |      ORDER BY ('0x' || substring(md5('graft_stratn_42_' || vec_id), 1, 12))::BIGINT
       |                 % 1000000, vec_id) AS rk
       |  FROM a$iters)
       |WHERE rk <= $n ORDER BY vec_id""".stripMargin

  /** Transitive closure of Dedup.clusterByMinhash: DuckDB's recursive CTE
    * computes, for every node of the candidate-pair graph, the set of
    * reachable nodes; min(reachable) is exactly the component label the
    * Spark min-label propagation converges to. Docs with no candidate
    * pair keep their own id. */
  def minhashClusters(k: Int = 32, shingleSize: Int = 3, bands: Int = 8,
                      bucketCap: Int = 64, minEstJaccard: Double = 0.5): String =
    closureOverPairs(minhashPairs(k, shingleSize, bands, bucketCap, minEstJaccard))

  /** Replays Dedup.dedupImpact: cluster-size histogram over the
    * recursive closure's component labels plus the singleton row from
    * `total − members`. */
  def dedupImpact(k: Int = 32, shingleSize: Int = 3, bands: Int = 8,
                  bucketCap: Int = 64,
                  minEstJaccard: Double = 0.5): String =
    s"""WITH RECURSIVE ${closureCtes(
         minhashPairs(k, shingleSize, bands, bucketCap, minEstJaccard))},
       |sizes AS (SELECT cluster_id, COUNT(*)::BIGINT AS sz
       |          FROM comp GROUP BY cluster_id),
       |hist AS (SELECT sz, COUNT(*)::BIGINT AS n_clusters
       |         FROM sizes GROUP BY sz),
       |tot AS (SELECT COUNT(*)::BIGINT AS t FROM documents),
       |mem AS (SELECT COUNT(*)::BIGINT AS m FROM comp),
       |uni AS (
       |  SELECT sz, n_clusters FROM hist
       |  UNION ALL
       |  SELECT 1::BIGINT, (t - m)::BIGINT FROM tot CROSS JOIN mem
       |  WHERE t - m > 0),
       |g AS (SELECT sz, SUM(n_clusters)::BIGINT AS n_clusters
       |      FROM uni GROUP BY sz)
       |SELECT sz AS cluster_size, n_clusters,
       |  (sz * n_clusters)::BIGINT AS n_docs,
       |  ((sz - 1) * n_clusters)::BIGINT AS n_dropped
       |FROM g ORDER BY cluster_size""".stripMargin

  /** Replays Sampling.leakageSafeSplit: the split md5-bucket rule
    * applied to the MinHash cluster label (the [[minhashClusters]]
    * closure), 80/10/10 cuts. */
  def leakageSafeSplit(k: Int = 32, shingleSize: Int = 3, bands: Int = 8,
                       bucketCap: Int = 64,
                       minEstJaccard: Double = 0.5): String =
    s"""SELECT doc_id, cluster_id,
       |  CASE WHEN b < 800000 THEN 'train'
       |       WHEN b < 900000 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (
       |  SELECT doc_id, cluster_id,
       |    ('0x' || substring(md5('graft_split_42_' || cluster_id), 1, 12))::BIGINT
       |      % 1000000 AS b
       |  FROM (${minhashClusters(k, shingleSize, bands, bucketCap,
                  minEstJaccard)}) cl)
       |ORDER BY doc_id""".stripMargin

  /** Shared winnow CTE chain `nrm → hs → fpl`: normalized text, char-`k`-
    * gram hash48 array, winnow fingerprint LIST per doc (`w`-window
    * minima, distinct, sorted) — the exact replay of
    * `TextFunctions.winnowFingerprints` / the WinnowText kernel. */
  private def winnowCtes(k: Int, w: Int): String =
    s"""nrm AS (
       |  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS s
       |  FROM documents),
       |hs AS (
       |  SELECT doc_id,
       |    CASE WHEN length(s) <= $k
       |      THEN [${h48("s")}]
       |      ELSE list_transform(range(0, length(s) - ${k - 1}),
       |        i -> ${h48(s"substring(s, i+1, $k)")})
       |    END AS h
       |  FROM nrm),
       |fpl AS (
       |  SELECT doc_id, list_sort(list_distinct(list_transform(
       |      range(1, greatest(len(h) - ${w - 1}, 1) + 1),
       |      j -> list_min(list_slice(h, j, j + ${w - 1}))))) AS fps
       |  FROM hs)""".stripMargin

  /** Replays the q_winnow projection: per-doc fingerprint count +
    * comma-joined list. Defaults match `TextFunctions` usage in the
    * query. */
  def winnowFingerprints(k: Int = 5, w: Int = 4): String =
    s"""WITH ${winnowCtes(k, w)}
       |SELECT doc_id, len(fps)::BIGINT AS n_fp,
       |  array_to_string(list_transform(fps, x -> x::VARCHAR), ',') AS fps
       |FROM fpl ORDER BY doc_id""".stripMargin

  /** Replays Dedup.winnowCandidates (defaults MATCH the operator's):
    * winnow fingerprints → [2, bucketCap] fingerprint buckets → pair
    * shared-fingerprint counts >= minShared. */
  def winnowPairs(k: Int = 5, w: Int = 4, bucketCap: Int = 64,
                  minShared: Long = 2L): String =
    s"""WITH ${winnowCtes(k, w)},
       |fps AS (SELECT doc_id, unnest(fps) AS fp FROM fpl),
       |okf AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND $bucketCap)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS n_shared
       |FROM fps a JOIN fps b USING (fp) JOIN okf USING (fp)
       |WHERE a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING COUNT(*) >= $minShared
       |ORDER BY id_a, id_b""".stripMargin

  /** Recursive-CTE transitive closure over a candidate-pair query
    * (columns `id_a`, `id_b`, trailing `ORDER BY id_a, id_b` stripped
    * here, in ONE place): every doc labeled min id of its component,
    * own id when untouched — shared by the MinHash and winnow cluster
    * oracles. */
  private def closureCtes(orderedPairsSql: String): String = {
    val pairs = orderedPairsSql.replaceAll("ORDER BY id_a, id_b\\s*$", "")
    s"""pairs AS ($pairs),
       |edges AS (
       |  SELECT id_a AS u, id_b AS v FROM pairs
       |  UNION
       |  SELECT id_b AS u, id_a AS v FROM pairs),
       |reach AS (
       |  SELECT u AS id, u AS r FROM edges
       |  UNION
       |  SELECT e.u AS id, t.r FROM edges e JOIN reach t ON e.v = t.id),
       |comp AS (SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id)""".stripMargin
  }

  private def closureOverPairs(orderedPairsSql: String): String =
    s"""WITH RECURSIVE ${closureCtes(orderedPairsSql)}
       |SELECT d.doc_id, COALESCE(m.cluster_id, d.doc_id) AS cluster_id
       |FROM documents d
       |LEFT JOIN comp m ON d.doc_id = m.id
       |ORDER BY d.doc_id""".stripMargin

  /** Replays Dedup.dedupNearKeepBest: transitive closure over the
    * MinHash candidate graph, then each component keeps its best member
    * by `scoreCol` (DESC NULLS LAST — Spark's desc — ties → smallest
    * id); docs in no pair survive untouched. */
  def minhashKeepBest(scoreCol: String, k: Int = 32, shingleSize: Int = 3,
                      bands: Int = 8, bucketCap: Int = 64,
                      minEstJaccard: Double = 0.5): String =
    s"""WITH RECURSIVE ${closureCtes(
         minhashPairs(k, shingleSize, bands, bucketCap, minEstJaccard))},
       |member AS (
       |  SELECT d.doc_id, d.$scoreCol AS sc, m.cluster_id
       |  FROM documents d JOIN comp m ON d.doc_id = m.id),
       |losers AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY cluster_id
       |        ORDER BY sc DESC NULLS LAST, doc_id) AS rk
       |    FROM member)
       |  WHERE rk > 1)
       |SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (SELECT doc_id FROM losers)
       |ORDER BY doc_id""".stripMargin

  /** Transitive closure of Dedup.clusterByWinnow (defaults MATCH the
    * operator's) — [[closureOverPairs]] over the winnow pair graph. */
  def winnowClusters(k: Int = 5, w: Int = 4, bucketCap: Int = 64,
                     minShared: Long = 2L): String =
    closureOverPairs(winnowPairs(k, w, bucketCap, minShared))

  /** Replays Dedup.winnowIncremental over the house incremental split
    * (new = doc_id >= splitId, corpus = the rest): survivors of the
    * corpus-fingerprint-set screen. */
  def winnowIncremental(k: Int = 5, w: Int = 4, minShared: Long = 2L,
                        splitId: Long = 400L): String =
    s"""WITH ${winnowCtes(k, w)},
       |newf AS (SELECT doc_id, unnest(fps) AS fp FROM fpl WHERE doc_id >= $splitId),
       |store AS (SELECT DISTINCT unnest(fps) AS fp FROM fpl WHERE doc_id < $splitId),
       |bad AS (SELECT doc_id FROM newf JOIN store USING (fp)
       |        GROUP BY doc_id HAVING COUNT(*) >= $minShared)
       |SELECT doc_id, text, lang, source, n_chars FROM documents
       |WHERE doc_id >= $splitId AND doc_id NOT IN (SELECT doc_id FROM bad)
       |ORDER BY doc_id""".stripMargin

  /** Shared CTE prefix `docs → th → hs → sig → banded`: token hashes,
    * shingle polynomial hashes, the k-permutation signature, and the
    * per-band bucket hashes — the exact replay of Spark's
    * `Dedup.withMinhashSignature` + `withBandHashes`. */
  /** The `docs → th → hs` token-poly shingle chain: per-token hash48
    * mod P, rolling polynomial per `s`-window (fallback single shingle
    * below `s` tokens) — the MinHash base convention, shared by the
    * signature chain and the boilerplate gram counter. */
  private def tokenShingleCtes(s: Int, where: String = ""): String = {
    val c = Dedup.ShingleC
    val w = if (where.isEmpty) "" else s" WHERE $where"
    // shingle hash = left fold (acc*C + h) % P over the token-hash
    // window; DuckDB list_reduce seeds with the first element, which
    // equals the fold-with-zero since (0*C + h) % P = h
    val polyRed = s"(acc, x) -> (acc * $c + x) % $P"
    s"""docs AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents$w),
       |th AS (
       |  SELECT doc_id, list_transform(w, tk -> ${h48("tk")} % $P) AS t FROM docs),
       |hs AS (
       |  SELECT doc_id,
       |    CASE WHEN len(t) < $s THEN [list_reduce(t, $polyRed)]
       |         ELSE list_transform(range(0, len(t) - ${s - 1}),
       |                i -> list_reduce(t[i+1:i+$s], $polyRed)) END AS h
       |  FROM th)""".stripMargin
  }

  /** Replays Corpus.boilerplate: token-poly gram instances, top-B by
    * (count DESC, hash ASC), per-doc hit fraction in integral
    * division. */
  def boilerplate(n: Int = 3, topB: Int = 50): String =
    s"""WITH ${tokenShingleCtes(n)},
       |inst AS (SELECT doc_id, unnest(h) AS g FROM hs),
       |top AS (
       |  SELECT g FROM inst GROUP BY g
       |  ORDER BY COUNT(*) DESC, g LIMIT $topB),
       |cnt AS (
       |  SELECT i.doc_id, COUNT(*)::BIGINT AS ng,
       |    SUM(CASE WHEN t.g IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS nb
       |  FROM inst i LEFT JOIN top t USING (g)
       |  GROUP BY i.doc_id)
       |SELECT d.doc_id,
       |  COALESCE(c.ng, 0)::BIGINT AS n_grams,
       |  COALESCE(c.nb, 0)::BIGINT AS n_boiler,
       |  (CASE WHEN COALESCE(c.ng, 0) = 0 THEN 0
       |        ELSE COALESCE(c.nb, 0) * 1000000 // c.ng END)::BIGINT AS boiler_micro
       |FROM documents d LEFT JOIN cnt c ON c.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  private def sigBandedCtes(k: Int, shingleSize: Int, bands: Int,
                            where: String = ""): String = {
    val rows = k / bands
    val sigElems = (0 until k).map { j =>
      val (a, b) = Dedup.perm(j)
      s"list_min(list_transform(h, x -> (x * ${a}::BIGINT + ${b}::BIGINT) % $P))"
    }.mkString(",\n      ")
    s"""${tokenShingleCtes(shingleSize, where)},
       |sig AS (
       |  SELECT doc_id, [
       |      $sigElems
       |    ] AS sig
       |  FROM hs),
       |banded AS (
       |  SELECT doc_id, sig, b AS band,
       |    ${h48(s"array_to_string(sig[b*$rows+1 : b*$rows+$rows], '_')")} AS bhash
       |  FROM sig, unnest([${(0 until bands).mkString(",")}]) AS t(b))""".stripMargin
  }

  /** Replays the batch twin of `Streaming.streamingNearDedup` (arrival ts
    * derived from doc_id, so first-arrival == min doc_id): every
    * (band, bhash) bucket is claimed by its smallest doc id, and a
    * document survives iff it claimed all `bands` of its bands. */
  def streamNearDedupSurvivors(k: Int = 32, shingleSize: Int = 3,
                               bands: Int = 8): String =
    s"""WITH ${sigBandedCtes(k, shingleSize, bands)},
       |winners AS (
       |  SELECT band, bhash, MIN(doc_id) AS w FROM banded GROUP BY band, bhash),
       |claims AS (
       |  SELECT b.doc_id, COUNT(*) AS n
       |  FROM banded b JOIN winners win
       |    ON b.band = win.band AND b.bhash = win.bhash AND b.doc_id = win.w
       |  GROUP BY b.doc_id)
       |SELECT doc_id FROM claims WHERE n = $bands ORDER BY doc_id""".stripMargin

  def minhashPairs(k: Int = 32, shingleSize: Int = 3, bands: Int = 8,
                   bucketCap: Int = 64, minEstJaccard: Double = 0.3): String = {
    s"""WITH ${sigBandedCtes(k, shingleSize, bands)},
       |ok AS (
       |  SELECT band, bhash FROM banded GROUP BY band, bhash
       |  HAVING COUNT(*) BETWEEN 2 AND $bucketCap),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       |    len(list_filter(range(1, ${k + 1}), i -> x.sig[i] = y.sig[i])) / ${k}.0 AS est_jaccard
       |  FROM banded x
       |  JOIN banded y ON x.band = y.band AND x.bhash = y.bhash AND x.doc_id < y.doc_id
       |  JOIN ok ON ok.band = x.band AND ok.bhash = x.bhash)
       |SELECT id_a, id_b, est_jaccard FROM pairs
       |WHERE est_jaccard >= $minEstJaccard
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Replays `Dedup.sourceOverlapMatrix`: the minhashPairs candidate
    * relation joined to sources both sides, unordered-normalized, cell
    * counts next to per-source doc counts. */
  def sourceOverlap(k: Int = 32, shingleSize: Int = 3, bands: Int = 8,
                    bucketCap: Int = 64,
                    minEstJaccard: Double = 0.5): String = {
    // the candidate relation is minhashPairs VERBATIM (the
    // minhashSurvivors reuse rule): one spelling of the banding
    // convention, so a bucket/tie/estimator change can never leave this
    // oracle pinning stale semantics
    val pairs = minhashPairs(k, shingleSize, bands, bucketCap, minEstJaccard)
      .replaceAll("ORDER BY id_a, id_b\\s*$", "")
    s"""WITH cnt AS (
       |  SELECT source, COUNT(*)::BIGINT AS n FROM documents GROUP BY source),
       |cells AS (
       |  SELECT least(da.source, db.source) AS source_a,
       |         greatest(da.source, db.source) AS source_b,
       |         COUNT(*)::BIGINT AS n_pairs
       |  FROM ($pairs) p
       |  JOIN documents da ON da.doc_id = p.id_a
       |  JOIN documents db ON db.doc_id = p.id_b
       |  GROUP BY 1, 2)
       |SELECT c.source_a, c.source_b, c.n_pairs,
       |  ca.n AS n_docs_a, cb.n AS n_docs_b
       |FROM cells c
       |JOIN cnt ca ON ca.source = c.source_a
       |JOIN cnt cb ON cb.source = c.source_b
       |ORDER BY c.source_a, c.source_b""".stripMargin
  }

  /** The distinct string-shingle hash48 index CTE (the decontamination
    * family's convention, matching the `DistinctShingleHashes` kernel):
    * `sh(doc_id, s)` — assumes a `docs(doc_id, w)` token CTE in scope. */
  private def shingleSetShCte(s: Int, from: String = "docs",
                              name: String = "sh"): String =
    s"""$name AS (SELECT doc_id, unnest(list_distinct(
       |    CASE WHEN len(w) < $s THEN [${h48("array_to_string(w, ' ')")}]
       |         ELSE list_transform(range(0, len(w) - ${s - 1}),
       |                i -> ${h48(s"array_to_string(w[i+1:i+$s], ' ')")}) END)) AS s
       |  FROM $from)""".stripMargin

  /** Replays `Dedup.jaccardSimilarityJoinAB` over two document slices
    * (naive cross spelling — the shared-order prefix plan must
    * reproduce it exactly). `leftWhere`/`rightWhere` are full WHERE
    * clauses selecting the two sides from `documents`. */
  def jaccardJoinAB(leftWhere: String, rightWhere: String,
                    shingleSize: Int = 3, tauPct: Int = 50): String =
    s"""WITH dl AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents $leftWhere),
       |dr AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
       |  FROM documents $rightWhere),
       |${shingleSetShCte(shingleSize, "dl", "shl")},
       |${shingleSetShCte(shingleSize, "dr", "shr")},
       |szl AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM shl GROUP BY doc_id),
       |szr AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM shr GROUP BY doc_id),
       |tp AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS inter
       |  FROM shl a JOIN shr b ON a.s = b.s
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, inter, (sa.n + sb.n - inter)::BIGINT AS uni
       |FROM tp JOIN szl sa ON sa.doc_id = tp.id_a
       |        JOIN szr sb ON sb.doc_id = tp.id_b
       |WHERE inter * 100 >= $tauPct * (sa.n + sb.n - inter)
       |ORDER BY id_a, id_b""".stripMargin

  /** Replays `Dedup.jaccardSimilarityJoin`: the SPELLING is the naive
    * exact formulation (distinct-shingle index self-join + size
    * arithmetic) — the prefix-filtered Spark plan must produce exactly
    * this relation, which is the exactness claim the oracle pins. */
  def jaccardJoin(shingleSize: Int = 3, tauPct: Int = 50,
                  where: String = ""): String = {
    val w = if (where.isEmpty) "" else s" WHERE $where"
    s"""WITH docs AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents$w),
       |${jaccardTruthCtes(shingleSize, tauPct)}
       |SELECT id_a, id_b, inter, uni FROM truth
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Replays `Dedup.simhashRecallEval`: the exact-Jaccard truth LEFT
    * JOIN the simhash chunk-banded candidate replay — how much of the
    * true near-dup population the Hamming screen recovers. */
  def simhashRecall(maxHamming: Int = 8, bucketCap: Int = 256,
                    shingleSize: Int = 3, tauPct: Int = 50,
                    where: String = ""): String = {
    val bits = Dedup.SimhashBits
    val w = if (where.isEmpty) "" else s" WHERE $where"
    s"""WITH docs AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents$w),
       |${jaccardTruthCtes(shingleSize, tauPct)},
       |th AS (
       |  SELECT doc_id, list_transform(w, tk -> ${h48("tk")}) AS h FROM docs),
       |sv AS (
       |  SELECT doc_id,
       |    list_aggregate(list_transform(range(0, $bits), b ->
       |      CASE WHEN len(list_filter(h, x -> ((x >> b) & 1) = 1)) * 2 > len(h)
       |           THEN (1::BIGINT << b) ELSE 0::BIGINT END), 'sum') AS sh
       |  FROM th),
       |banded AS (
       |  SELECT doc_id, sh, c AS chunk, (sh >> (c * 12)) & 4095 AS cval
       |  FROM sv, unnest([0,1,2,3]) AS t(c)),
       |ok AS (
       |  SELECT chunk, cval FROM banded GROUP BY chunk, cval
       |  HAVING COUNT(*) BETWEEN 2 AND $bucketCap),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM banded x
       |  JOIN banded y ON x.chunk = y.chunk AND x.cval = y.cval
       |    AND x.doc_id < y.doc_id
       |  JOIN ok ON ok.chunk = x.chunk AND ok.cval = x.cval
       |  WHERE bit_count(xor(x.sh, y.sh)) <= $maxHamming)
       |SELECT t.id_a, t.id_b, t.inter, t.uni,
       |  (CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS caught
       |FROM truth t
       |LEFT JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
       |ORDER BY t.id_a, t.id_b""".stripMargin
  }

  /** Replays `Dedup.minhashPrecisionEval`: every banded-candidate pair
    * annotated with its exact distinct-shingle overlap and the integer
    * tau compare — the precision twin of [[minhashRecall]]. */
  def minhashPrecision(k: Int = 32, shingleSize: Int = 3, bands: Int = 8,
                       bucketCap: Int = 64, minEstJaccard: Double = 0.5,
                       tauPct: Int = 50): String = {
    s"""WITH ${sigBandedCtes(k, shingleSize, bands)},
       |${shingleSetShCte(shingleSize)},
       |sz AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM sh GROUP BY doc_id),
       |tp AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |ok AS (
       |  SELECT band, bhash FROM banded GROUP BY band, bhash
       |  HAVING COUNT(*) BETWEEN 2 AND $bucketCap),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       |    len(list_filter(range(1, ${k + 1}), i -> x.sig[i] = y.sig[i]))
       |      / ${k}.0 AS est_jaccard
       |  FROM banded x
       |  JOIN banded y ON x.band = y.band AND x.bhash = y.bhash
       |    AND x.doc_id < y.doc_id
       |  JOIN ok ON ok.band = x.band AND ok.bhash = x.bhash),
       |kept AS (SELECT * FROM cand WHERE est_jaccard >= $minEstJaccard)
       |SELECT c.id_a, c.id_b, c.est_jaccard,
       |  COALESCE(t.inter, 0)::BIGINT AS inter,
       |  (sa.n + sb.n - COALESCE(t.inter, 0))::BIGINT AS uni,
       |  (CASE WHEN COALESCE(t.inter, 0) * 100 >=
       |     $tauPct * (sa.n + sb.n - COALESCE(t.inter, 0))
       |   THEN 1 ELSE 0 END)::BIGINT AS is_true
       |FROM kept c
       |JOIN sz sa ON sa.doc_id = c.id_a
       |JOIN sz sb ON sb.doc_id = c.id_b
       |LEFT JOIN tp t ON t.id_a = c.id_a AND t.id_b = c.id_b
       |ORDER BY c.id_a, c.id_b""".stripMargin
  }

  /** Replays Dedup.containmentPairs: winnow copied-span candidate
    * pairs annotated with exact word-shingle intersections, sizes, and
    * integer-percent containments both directions. */
  def containmentPairs(k: Int = 12, w: Int = 8, bucketCap: Int = 64,
                       minShared: Long = 4L,
                       shingleSize: Int = 3): String =
    s"""WITH ${winnowCtes(k, w)},
       |fps AS (SELECT doc_id, unnest(fps) AS fp FROM fpl),
       |okf AS (SELECT fp FROM fps GROUP BY fp
       |        HAVING COUNT(*) BETWEEN 2 AND $bucketCap),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM fps a JOIN fps b USING (fp) JOIN okf USING (fp)
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= $minShared),
       |docs AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents),
       |${shingleSetShCte(shingleSize)},
       |sz AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM sh GROUP BY doc_id),
       |tp AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT c.id_a, c.id_b,
       |  COALESCE(t.inter, 0)::BIGINT AS inter,
       |  sa.n AS n_a, sb.n AS n_b,
       |  (COALESCE(t.inter, 0) * 100 // sa.n)::BIGINT AS cont_a_pct,
       |  (COALESCE(t.inter, 0) * 100 // sb.n)::BIGINT AS cont_b_pct
       |FROM cand c
       |JOIN sz sa ON sa.doc_id = c.id_a
       |JOIN sz sb ON sb.doc_id = c.id_b
       |LEFT JOIN tp t ON t.id_a = c.id_a AND t.id_b = c.id_b
       |ORDER BY c.id_a, c.id_b""".stripMargin

  /** Replays `Dedup.minhashRecallEval`: exact distinct-shingle Jaccard
    * truth pairs (integer cross-multiplied threshold) LEFT JOIN the
    * banded-candidate replay — `caught` flags which truth pairs the LSH
    * configuration recovers. */
  /** The exact-Jaccard truth chain `sh → sz → tp → truth` (assumes a
    * `docs(doc_id, w)` CTE in scope) — shared by the similarity join
    * and every eval-harness replay. */
  private def jaccardTruthCtes(shingleSize: Int, tauPct: Int): String =
    s"""${shingleSetShCte(shingleSize)},
       |sz AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM sh GROUP BY doc_id),
       |tp AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*)::BIGINT AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT id_a, id_b, inter, (sa.n + sb.n - inter)::BIGINT AS uni
       |  FROM tp JOIN sz sa ON sa.doc_id = tp.id_a
       |          JOIN sz sb ON sb.doc_id = tp.id_b
       |  WHERE inter * 100 >= $tauPct * (sa.n + sb.n - inter))""".stripMargin

  def minhashRecall(k: Int = 32, shingleSize: Int = 3, bands: Int = 8,
                    bucketCap: Int = 64, minEstJaccard: Double = 0.5,
                    tauPct: Int = 50, where: String = ""): String = {
    s"""WITH ${sigBandedCtes(k, shingleSize, bands, where)},
       |${jaccardTruthCtes(shingleSize, tauPct)},
       |ok AS (
       |  SELECT band, bhash FROM banded GROUP BY band, bhash
       |  HAVING COUNT(*) BETWEEN 2 AND $bucketCap),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM banded x
       |  JOIN banded y ON x.band = y.band AND x.bhash = y.bhash
       |    AND x.doc_id < y.doc_id
       |  JOIN ok ON ok.band = x.band AND ok.bhash = x.bhash
       |  WHERE len(list_filter(range(1, ${k + 1}), i -> x.sig[i] = y.sig[i]))
       |    / ${k}.0 >= $minEstJaccard)
       |SELECT t.id_a, t.id_b, t.inter, t.uni,
       |  (CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS caught
       |FROM truth t
       |LEFT JOIN cand c ON c.id_a = t.id_a AND c.id_b = t.id_b
       |ORDER BY t.id_a, t.id_b""".stripMargin
  }

  /** Replays Dedup.minhashIncremental: the batch (doc_id >= splitId) is
    * screened against the corpus band store (capped corpus buckets, min
    * size 1 — a single stored doc screens; est-Jaccard >= threshold),
    * then the greedy within-batch keep-one among survivors. */
  def minhashIncremental(splitId: Long, k: Int = 32, shingleSize: Int = 3,
                         bands: Int = 8, bucketCap: Int = 64,
                         minEstJaccard: Double = 0.5): String = {
    val est = (x: String, y: String) =>
      s"len(list_filter(range(1, ${k + 1}), i -> $x.sig[i] = $y.sig[i])) / ${k}.0"
    s"""WITH ${sigBandedCtes(k, shingleSize, bands)},
       |cb AS (SELECT * FROM banded WHERE doc_id < $splitId),
       |bb AS (SELECT * FROM banded WHERE doc_id >= $splitId),
       |okc AS (
       |  SELECT band, bhash FROM cb GROUP BY band, bhash
       |  HAVING COUNT(*) <= $bucketCap),
       |los AS (
       |  SELECT DISTINCT bb.doc_id FROM bb
       |  JOIN cb ON bb.band = cb.band AND bb.bhash = cb.bhash
       |  JOIN okc ON okc.band = bb.band AND okc.bhash = bb.bhash
       |  WHERE ${est("bb", "cb")} >= $minEstJaccard),
       |surv AS (
       |  SELECT doc_id FROM documents d
       |  WHERE doc_id >= $splitId
       |    AND NOT EXISTS (SELECT 1 FROM los WHERE los.doc_id = d.doc_id)),
       |sbanded AS (SELECT b.* FROM banded b JOIN surv USING (doc_id)),
       |okb AS (
       |  SELECT band, bhash FROM sbanded GROUP BY band, bhash
       |  HAVING COUNT(*) BETWEEN 2 AND $bucketCap),
       |pl AS (
       |  SELECT DISTINCT y.doc_id FROM sbanded x
       |  JOIN sbanded y ON x.band = y.band AND x.bhash = y.bhash
       |                AND x.doc_id < y.doc_id
       |  JOIN okb ON okb.band = x.band AND okb.bhash = x.bhash
       |  WHERE ${est("x", "y")} >= $minEstJaccard)
       |SELECT doc_id FROM surv s
       |WHERE NOT EXISTS (SELECT 1 FROM pl WHERE pl.doc_id = s.doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** Shared SimHash chunk chain `th → sh → banded`: per-token hash48,
    * 48-bit majority-vote simhash, 4×12-bit chunk rows — the replay of
    * `Dedup.simhashChunkRows`. */
  private def simhashChunkCtes: String = {
    val bits = Dedup.SimhashBits
    s"""th AS (
       |  SELECT doc_id,
       |    list_transform(string_split_regex(trim(text), '\\s+'),
       |      tk -> ${h48("tk")}) AS h
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |    list_aggregate(list_transform(range(0, $bits), b ->
       |      CASE WHEN len(list_filter(h, x -> ((x >> b) & 1) = 1)) * 2 > len(h)
       |           THEN (1::BIGINT << b) ELSE 0::BIGINT END), 'sum') AS sh
       |  FROM th),
       |banded AS (
       |  SELECT doc_id, sh, c AS chunk, (sh >> (c * 12)) & 4095 AS cval
       |  FROM sh, unnest([0,1,2,3]) AS t(c))""".stripMargin
  }

  /** Replays the batch twin of `Streaming.streamingSimhashDedup`
    * (arrival ts derived from doc_id → first-arrival == min doc_id):
    * every (chunk, cval) bucket is claimed by its smallest doc id, and
    * a document survives iff it claimed all 4 chunks. */
  def streamSimhashSurvivors(): String =
    s"""WITH $simhashChunkCtes,
       |winners AS (
       |  SELECT chunk, cval, MIN(doc_id) AS w FROM banded GROUP BY chunk, cval),
       |claims AS (
       |  SELECT b.doc_id, COUNT(*) AS n
       |  FROM banded b JOIN winners win
       |    ON b.chunk = win.chunk AND b.cval = win.cval AND b.doc_id = win.w
       |  GROUP BY b.doc_id)
       |SELECT doc_id FROM claims WHERE n = 4 ORDER BY doc_id""".stripMargin

  /** Replays Dedup.simhashIncremental over the house incremental split
    * (new = doc_id >= splitId): the batch screened against the corpus
    * chunk store (capped corpus buckets, min size 1; Hamming ≤
    * maxHamming drops), then greedy keep-one within the batch — the
    * [[minhashIncremental]] shape on the Hamming metric. */
  def simhashIncremental(splitId: Long, maxHamming: Int = 8,
                         bucketCap: Int = 256): String =
    s"""WITH $simhashChunkCtes,
       |cb AS (SELECT * FROM banded WHERE doc_id < $splitId),
       |bb AS (SELECT * FROM banded WHERE doc_id >= $splitId),
       |okc AS (
       |  SELECT chunk, cval FROM cb GROUP BY chunk, cval
       |  HAVING COUNT(*) <= $bucketCap),
       |los AS (
       |  SELECT DISTINCT bb.doc_id FROM bb
       |  JOIN cb ON bb.chunk = cb.chunk AND bb.cval = cb.cval
       |  JOIN okc ON okc.chunk = bb.chunk AND okc.cval = bb.cval
       |  WHERE bit_count(xor(bb.sh, cb.sh)) <= $maxHamming),
       |surv AS (
       |  SELECT doc_id FROM documents d
       |  WHERE doc_id >= $splitId
       |    AND NOT EXISTS (SELECT 1 FROM los WHERE los.doc_id = d.doc_id)),
       |sbanded AS (SELECT b.* FROM banded b JOIN surv USING (doc_id)),
       |okb AS (
       |  SELECT chunk, cval FROM sbanded GROUP BY chunk, cval
       |  HAVING COUNT(*) BETWEEN 2 AND $bucketCap),
       |pl AS (
       |  SELECT DISTINCT y.doc_id FROM sbanded x
       |  JOIN sbanded y ON x.chunk = y.chunk AND x.cval = y.cval
       |                AND x.doc_id < y.doc_id
       |  JOIN okb ON okb.chunk = x.chunk AND okb.cval = x.cval
       |  WHERE bit_count(xor(x.sh, y.sh)) <= $maxHamming)
       |SELECT doc_id FROM surv s
       |WHERE NOT EXISTS (SELECT 1 FROM pl WHERE pl.doc_id = s.doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Replays Dedup.simhashCandidates (48-bit simhash, 4 chunks of 12
    * bits, bucketCap 256) + the query's maxHamming filter. */
  def simhashPairs(maxHamming: Int = 8, bucketCap: Int = 256): String = {
    s"""WITH $simhashChunkCtes,
       |ok AS (
       |  SELECT chunk, cval FROM banded GROUP BY chunk, cval
       |  HAVING COUNT(*) BETWEEN 2 AND $bucketCap),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       |    CAST(bit_count(xor(x.sh, y.sh)) AS BIGINT) AS hamming
       |  FROM banded x
       |  JOIN banded y ON x.chunk = y.chunk AND x.cval = y.cval AND x.doc_id < y.doc_id
       |  JOIN ok ON ok.chunk = x.chunk AND ok.cval = x.cval)
       |SELECT id_a, id_b, hamming FROM pairs
       |WHERE hamming <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Replays Dedup.embeddingCandidates (hyperplane buckets from the same
    * md5-derived planes, in-bucket cosine). */
  def embedDedup(dim: Int = 64, minCosine: Double = 0.2,
                 bucketCap: Int = 1024,
                 minPlanes: Int = 6, maxPlanes: Int = 16,
                 targetBucket: Int = 8): String = {
    // corpus-size-derived plane count (VectorFunctions.lshPlanesFor):
    // all maxPlanes sign terms are carried (hashPlanes is prefix-stable
    // in p) and gated on the integer-derived p — the same p the query
    // computes from the same count, so the engines cannot diverge
    val planes = VectorFunctions.hashPlanes(maxPlanes, dim)
    val ladder = (minPlanes until maxPlanes)
      .map(q => s"WHEN n <= ${(1L << q) * targetBucket} THEN $q")
      .mkString(" ")
    val gated = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN $i < np.p AND ${dot("embedding::DOUBLE[]", planeList(p))} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
    s"""WITH np AS (
       |  SELECT (CASE $ladder ELSE $maxPlanes END) AS p
       |  FROM (SELECT COUNT(*)::BIGINT AS n FROM embeddings)),
       |b AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v,
       |    $gated AS bucket
       |  FROM embeddings, np),
       |ok AS (
       |  SELECT bucket FROM b GROUP BY bucket
       |  HAVING COUNT(*) BETWEEN 2 AND $bucketCap)
       |SELECT id_a, id_b, cos FROM (
       |  SELECT x.vec_id AS id_a, y.vec_id AS id_b, ${cosExpr("x.v", "y.v")} AS cos
       |  FROM b x
       |  JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
       |  JOIN ok ON ok.bucket = x.bucket)
       |WHERE cos >= $minCosine
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Replays Dedup.semanticDedup: the Lloyd chain's final assignment
    * (`a{iters}`, same CTEs as kmeansAssign) is the blocking key; cells
    * sized [2, bucketCap] expand to ordered pairs, pairs at or above
    * `minCosine` drop their larger id, survivors keep (vec_id, cell). */
  def semanticDedup(k: Int = 64, iters: Int = 1, dim: Int = 64,
                    minCosine: Double = 0.2, bucketCap: Int = 1024): String =
    s"""WITH ${lloydCtes(k, iters, dim, withFinalAssign = true)},
       |ok AS (
       |  SELECT cell FROM a$iters GROUP BY cell
       |  HAVING COUNT(*) BETWEEN 2 AND $bucketCap),
       |drops AS (
       |  SELECT DISTINCT y.vec_id AS id_b
       |  FROM a$iters x
       |  JOIN a$iters y ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  JOIN ok ON ok.cell = x.cell
       |  JOIN e ex ON ex.vec_id = x.vec_id
       |  JOIN e ey ON ey.vec_id = y.vec_id
       |  WHERE ${cosExpr("ex.v", "ey.v")} >= $minCosine)
       |SELECT a.vec_id, a.cell FROM a$iters a
       |WHERE a.vec_id NOT IN (SELECT id_b FROM drops)
       |ORDER BY a.vec_id""".stripMargin

  /** IVF candidate/rank CTE suffix over trained centroids: expects the
    * Lloyd chain's `e` (vec_id, v) and `c{iters}` (cell, cv) in scope.
    * Relational argmax assignment (ROW_NUMBER over cosine desc, cell
    * asc — the same tie-break as Spark's array_position-of-max over the
    * cell-ordered centroid list), nprobe=2, per-query rank over
    * vec_id < 4. */
  private def ivfAssignCtes(iters: Int): String =
    s"""cent AS (SELECT cell AS cid, cv FROM c$iters),
       |cassign AS (
       |  SELECT vec_id, v, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY ${cosExpr("v", "cv")} DESC, cid) AS rn
       |  FROM e CROSS JOIN cent),
       |c AS (SELECT vec_id, v, cid AS cell FROM cassign WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv, cid AS cell
       |  FROM cassign WHERE vec_id < 4 AND rn <= 2)""".stripMargin

  private def ivfRankedCtes(iters: Int): String =
    s"""${ivfAssignCtes(iters)},
       |cand AS (
       |  SELECT DISTINCT q.query_id, c.vec_id, ${cosExpr("c.v", "q.qv")} AS cos
       |  FROM c JOIN q ON c.cell = q.cell AND c.vec_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
       |  FROM cand)""".stripMargin

  /** Replays Similarity.ivfTopK over TRAINED centroids
    * (Similarity.kmeansCentroids — `iters` Lloyd rounds from the
    * deterministic vec_id < nCent seeds), composing the kmeans oracle's
    * centroid chain with the IVF assignment. */
  def annIvf(nCent: Int = 8, iters: Int = 2, dim: Int = 64,
             k: Int = 10): String =
    s"""WITH ${lloydCtes(nCent, iters, dim, withFinalAssign = false)},
       |${ivfRankedCtes(iters)}
       |SELECT query_id, vec_id, cos, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Replays Similarity.lshTopK (8 planes, single-bit multi-probe,
    * top-10 per query over vec_id < 4). */
  def annLsh(dim: Int = 64, numPlanes: Int = 8, k: Int = 10): String = {
    val planes = VectorFunctions.hashPlanes(numPlanes, dim)
    val probes = ("qbucket" +: (0 until numPlanes).map(i => s"xor(qbucket, ${1L << i})"))
      .mkString("[", ", ", "]")
    s"""WITH c AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS cv,
       |    ${bucketExpr("embedding::DOUBLE[]", planes)} AS bucket
       |  FROM embeddings),
       |q AS (
       |  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
       |    ${bucketExpr("embedding::DOUBLE[]", planes)} AS qbucket
       |  FROM embeddings WHERE vec_id < 4),
       |probes AS (
       |  SELECT query_id, qv, p AS bucket
       |  FROM q, unnest($probes) AS t(p)),
       |cand AS (
       |  SELECT DISTINCT p.query_id, c.vec_id, ${cosExpr("c.cv", "p.qv")} AS cos
       |  FROM c JOIN probes p ON c.bucket = p.bucket AND c.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, vec_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
       |  FROM cand)
       |SELECT query_id, vec_id, cos, rank FROM ranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Replays q_ann_ndcg (Similarity.ndcgEval): brute-force and LSH
    * top-k rankings, per-term micro-quantized cos/ln(rank+1) gains
    * summed as longs, one final division for ndcg. */
  def annNdcg(dim: Int = 64, numPlanes: Int = 8, k: Int = 10,
              nq: Int = 4): String = {
    val planes = VectorFunctions.hashPlanes(numPlanes, dim)
    val probes = ("qbucket" +: (0 until numPlanes).map(i => s"xor(qbucket, ${1L << i})"))
      .mkString("[", ", ", "]")
    def dcg(src: String, out: String) =
      s"""SELECT query_id,
         |    SUM(CAST(floor(greatest(cos, 0.0) * 1000000.0 / ln(rank + 1.0) + 0.5) AS BIGINT))::BIGINT AS $out
         |  FROM $src GROUP BY query_id""".stripMargin
    s"""WITH hb AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS cv,
       |    ${bucketExpr("embedding::DOUBLE[]", planes)} AS bucket
       |  FROM embeddings),
       |hq AS (
       |  SELECT vec_id AS query_id, cv AS qv, bucket AS qbucket
       |  FROM hb WHERE vec_id < $nq),
       |truth AS (
       |  SELECT query_id, vec_id, cos, rank FROM (
       |    SELECT hq.query_id, hb.vec_id, ${cosExpr("hb.cv", "hq.qv")} AS cos,
       |      ROW_NUMBER() OVER (PARTITION BY hq.query_id
       |        ORDER BY cos DESC, hb.vec_id) AS rank
       |    FROM hb CROSS JOIN hq WHERE hb.vec_id <> hq.query_id)
       |  WHERE rank <= $k),
       |lprobes AS (SELECT query_id, qv, p AS bucket FROM hq, unnest($probes) AS t(p)),
       |lcand AS (
       |  SELECT DISTINCT p.query_id, hb.vec_id, ${cosExpr("hb.cv", "p.qv")} AS cos
       |  FROM hb JOIN lprobes p ON hb.bucket = p.bucket AND hb.vec_id <> p.query_id),
       |lsh AS (
       |  SELECT query_id, vec_id, cos, rank FROM (
       |    SELECT query_id, vec_id, cos,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |    FROM lcand) WHERE rank <= $k),
       |ideal AS (${dcg("truth", "idcg_micro")}),
       |ap AS (${dcg("lsh", "dcg_micro")})
       |SELECT i.query_id,
       |  COALESCE(a.dcg_micro, 0)::BIGINT AS dcg_micro,
       |  i.idcg_micro,
       |  CASE WHEN i.idcg_micro = 0 THEN NULL
       |       ELSE COALESCE(a.dcg_micro, 0)::DOUBLE / i.idcg_micro::DOUBLE
       |  END AS ndcg
       |FROM ideal i LEFT JOIN ap a USING (query_id)
       |ORDER BY i.query_id""".stripMargin
  }

  /** Replays q_ann_recall: recall of the multi-probe LSH ANN AND the
    * trained-centroid IVF ANN against the brute-force ground truth, per
    * query — planes and centroids regenerated from the same constants /
    * Lloyd chain, so the overlap counts are exact. */
  def annRecall(dim: Int = 64, numPlanes: Int = 8, k: Int = 10,
                nCent: Int = 8, iters: Int = 2,
                pqM: Int = 4, pqNcode: Int = 8, pqIters: Int = 1): String = {
    val planes = VectorFunctions.hashPlanes(numPlanes, dim)
    val probes = ("qbucket" +: (0 until numPlanes).map(i => s"xor(qbucket, ${1L << i})"))
      .mkString("[", ", ", "]")
    s"""WITH ${lloydCtes(nCent, iters, dim, withFinalAssign = false)},
       |${ivfRankedCtes(iters)},
       |iapprox AS (SELECT query_id, vec_id FROM ranked WHERE rank <= $k),
       |${pqCtes(pqM, dim / pqM, pqNcode, pqIters, withE = false)},
       |${pqRecCte(pqM, pqIters)},
       |pq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 4),
       |papprox AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT pq.query_id, r.vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY pq.query_id
       |        ORDER BY ${cosExpr("r.rv", "pq.qv")} DESC, r.vec_id) AS rank
       |    FROM pqrec r CROSS JOIN pq WHERE r.vec_id <> pq.query_id)
       |  WHERE rank <= $k),
       |hb AS (
       |  SELECT vec_id, v AS cv, ${bucketExpr("v", planes)} AS bucket FROM e),
       |hq AS (
       |  SELECT vec_id AS query_id, cv AS qv, bucket AS qbucket
       |  FROM hb WHERE vec_id < 4),
       |truth AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT hq.query_id, hb.vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY hq.query_id
       |        ORDER BY ${cosExpr("hb.cv", "hq.qv")} DESC, hb.vec_id) AS rank
       |    FROM hb CROSS JOIN hq WHERE hb.vec_id <> hq.query_id)
       |  WHERE rank <= $k),
       |lprobes AS (SELECT query_id, qv, p AS bucket FROM hq, unnest($probes) AS t(p)),
       |lcand AS (
       |  SELECT DISTINCT p.query_id, hb.vec_id, ${cosExpr("hb.cv", "p.qv")} AS cos
       |  FROM hb JOIN lprobes p ON hb.bucket = p.bucket AND hb.vec_id <> p.query_id),
       |lapprox AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
       |    FROM lcand) WHERE rank <= $k)
       |SELECT t.query_id, COUNT(*)::BIGINT AS n_true,
       |  SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit_lsh,
       |  SUM(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit_ivf,
       |  SUM(CASE WHEN p.vec_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_hit_pq
       |FROM truth t
       |LEFT JOIN lapprox l ON t.query_id = l.query_id AND t.vec_id = l.vec_id
       |LEFT JOIN iapprox i ON t.query_id = i.query_id AND t.vec_id = i.vec_id
       |LEFT JOIN papprox p ON t.query_id = p.query_id AND t.vec_id = p.vec_id
       |GROUP BY t.query_id ORDER BY t.query_id""".stripMargin
  }

  /** Shared product-quantization CTE chain, replaying
    * `Similarity.pqCodebooks` + the final encode round for round: per
    * subspace `s`, `sub$s` slices the subvector, `cb0_$s` seeds from
    * vec_id < ncode, then `iters` Lloyd rounds of squared-L2 assignment
    * (`(x·x − 2·x·c) + c·c` — the exact dot-expansion op order the Spark
    * side computes, every term a list_dot_product left-fold), quantized
    * long-sum means, and a LEFT JOIN + COALESCE empty-code pass-through;
    * `a${iters}_$s` holds the final 0-based code per vec_id. */
  private def pqCtes(m: Int, d: Int, ncode: Int, iters: Int,
                     withE: Boolean = true, src: String = "e"): String = {
    val S = "1000000.0"
    def sub(s: Int) =
      s"""sub$s AS (SELECT vec_id, list_slice(v, ${s * d + 1}, ${s * d + d}) AS x
         |  FROM $src)""".stripMargin
    // POSITIONAL codes (0-based rank of the seed, not its vec_id): the
    // Spark side indexes into the collected seed array, so under sparse
    // ids below ncode the two stay aligned only via the rank
    def cb0(s: Int) =
      s"""cb0_$s AS (SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS code,
         |  x AS cw FROM sub$s WHERE vec_id < $ncode)""".stripMargin
    def dN(i: Int, s: Int) =
      s"""d${i}_$s AS (SELECT t.vec_id, c.code,
         |    (${dot("t.x", "t.x")} - 2.0*${dot("t.x", "c.cw")}) + ${dot("c.cw", "c.cw")} AS d2
         |  FROM sub$s t CROSS JOIN cb${i}_$s c)""".stripMargin
    def aN(i: Int, s: Int) =
      s"""a${i}_$s AS (SELECT vec_id, MIN(code) AS code FROM (
         |    SELECT vec_id, code, d2, MIN(d2) OVER (PARTITION BY vec_id) AS mn
         |    FROM d${i}_$s) x
         |  WHERE d2 = mn GROUP BY vec_id)""".stripMargin
    def gN(i: Int, s: Int) =
      s"""g${i}_$s AS (SELECT a.code, t.pos,
         |    (SUM(CAST(floor(b.x[t.pos] * $S + 0.5) AS BIGINT)))::BIGINT AS sm,
         |    COUNT(*) AS cnt
         |  FROM a${i - 1}_$s a JOIN sub$s b USING (vec_id)
         |  CROSS JOIN unnest(range(1, ${d + 1})) AS t(pos)
         |  GROUP BY a.code, t.pos)""".stripMargin
    def nN(i: Int, s: Int) =
      s"""n${i}_$s AS (SELECT code, list(sm / (cnt * $S) ORDER BY pos) AS cw
         |  FROM g${i}_$s GROUP BY code)""".stripMargin
    def cbN(i: Int, s: Int) =
      s"""cb${i}_$s AS (SELECT pv.code, COALESCE(n.cw, pv.cw) AS cw
         |  FROM cb${i - 1}_$s pv LEFT JOIN n${i}_$s n USING (code))""".stripMargin
    val chains = (0 until m).flatMap { s =>
      Seq(sub(s), cb0(s)) ++
        (0 until iters).flatMap(i =>
          Seq(dN(i, s), aN(i, s), gN(i + 1, s), nN(i + 1, s), cbN(i + 1, s))) ++
        Seq(dN(iters, s), aN(iters, s))
    }
    val eCte =
      if (withE) "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),\n"
      else ""
    s"""$eCte${chains.mkString(",\n")}""".stripMargin
  }

  /** The PQ reconstruction CTE `pqrec(vec_id, rv)` over a pqCtes chain. */
  private def pqRecCte(m: Int, iters: Int, src: String = "e"): String = {
    val concats = (0 until m).map(s => s"c$s.cw").mkString(" || ")
    val joins = (0 until m).map(s =>
      s"JOIN a${iters}_$s x$s USING (vec_id) JOIN cb${iters}_$s c$s ON c$s.code = x$s.code")
      .mkString("\n  ")
    s"""pqrec AS (SELECT $src.vec_id, $concats AS rv FROM $src
       |  $joins)""".stripMargin
  }

  /** Replays q_ann_ivfpq (Similarity.ivfPqTopK — the FAISS IVFADC
    * layout): the trained-centroid IVF assignment chain gives each
    * vector its cell and residual `v − centroid`; the PQ chain trains on
    * and encodes the RESIDUALS; a candidate's scored vector is
    * `centroid + decode(codes)`, probed at the query's top-2 cells. */
  def annIvfPq(nCent: Int = 8, iters: Int = 2, dim: Int = 64,
               pqM: Int = 4, pqNcode: Int = 8, pqIters: Int = 1,
               k: Int = 10): String = {
    val d = dim / pqM
    s"""WITH ${lloydCtes(nCent, iters, dim, withFinalAssign = false)},
       |${ivfAssignCtes(iters)},
       |resid AS (
       |  SELECT c.vec_id,
       |    list_transform(range(1, ${dim + 1}), i -> c.v[i] - cent.cv[i]) AS v
       |  FROM c JOIN cent ON cent.cid = c.cell),
       |${pqCtes(pqM, d, pqNcode, pqIters, withE = false, src = "resid")},
       |${pqRecCte(pqM, pqIters, src = "resid")},
       |frec AS (
       |  SELECT r.vec_id, c.cell,
       |    list_transform(range(1, ${dim + 1}), i -> cent.cv[i] + r.rv[i]) AS fv
       |  FROM pqrec r JOIN c ON c.vec_id = r.vec_id
       |  JOIN cent ON cent.cid = c.cell),
       |pcand AS (
       |  SELECT DISTINCT q.query_id, f.vec_id, ${cosExpr("f.fv", "q.qv")} AS cos
       |  FROM frec f JOIN q ON f.cell = q.cell AND f.vec_id <> q.query_id),
       |pranked AS (
       |  SELECT query_id, vec_id, cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
       |  FROM pcand)
       |SELECT query_id, vec_id, cos, rank FROM pranked
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin
  }

  /** Replays q_pq_encode: the trained per-subspace code of every vector. */
  def pqEncode(m: Int = 4, d: Int = 16, ncode: Int = 8,
               iters: Int = 1): String = {
    val cols = (0 until m).map(s => s"a${iters}_$s.code AS code_$s").mkString(", ")
    val joins = (0 until m).map(s => s"JOIN a${iters}_$s USING (vec_id)").mkString(" ")
    s"""WITH ${pqCtes(m, d, ncode, iters)}
       |SELECT vec_id, $cols FROM e $joins ORDER BY vec_id""".stripMargin
  }

  /** Replays q_ann_pq (Similarity.pqTopK): reconstruct every corpus
    * vector from its codewords (list concat across subspaces), cosine
    * against the exact query vectors, top-k per query. */
  def annPq(m: Int = 4, d: Int = 16, ncode: Int = 8, iters: Int = 1,
            k: Int = 10, nq: Int = 4): String =
    s"""WITH ${pqCtes(m, d, ncode, iters)},
       |${pqRecCte(m, iters)},
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nq)
       |SELECT query_id, vec_id, cos, rank FROM (
       |  SELECT q.query_id, r.vec_id, ${cosExpr("r.rv", "q.qv")} AS cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id
       |      ORDER BY cos DESC, r.vec_id) AS BIGINT) AS rank
       |  FROM pqrec r CROSS JOIN q WHERE r.vec_id <> q.query_id) z
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Replays Similarity.mmrRerank step by step (the lloydCtes pattern
    * for greedy selection): candidate top-`candidates` by cosine, then
    * `k` generated selection rounds — each picks the argmax of
    * `λ·rel − (1−λ)·max-sim-to-selected` (ties → smallest vec_id) among
    * candidates not yet selected. */
  def mmrRerank(candidates: Int = 20, k: Int = 5, lambda: Double = 0.5,
                nq: Int = 4): String = {
    val lam = dlit(lambda)
    val oneM = dlit(1.0 - lambda)
    val steps = (2 to k).map { i =>
      s"""ms$i AS (
         |  SELECT c.query_id, c.vec_id, MAX(${cosExpr("c.v", "s.v")}) AS msim
         |  FROM cands c
         |  JOIN cum${i - 1} m ON m.query_id = c.query_id
         |  JOIN cands s ON s.query_id = c.query_id AND s.vec_id = m.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM cum${i - 1} x
         |                    WHERE x.query_id = c.query_id AND x.vec_id = c.vec_id)
         |  GROUP BY c.query_id, c.vec_id),
         |sel$i AS (
         |  SELECT query_id, vec_id, $i AS step FROM (
         |    SELECT c.query_id, c.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY c.query_id
         |        ORDER BY ($lam * c.rel - $oneM * m.msim) DESC, c.vec_id) AS rn
         |    FROM cands c JOIN ms$i m
         |      ON m.query_id = c.query_id AND m.vec_id = c.vec_id)
         |  WHERE rn = 1),
         |cum$i AS (SELECT * FROM cum${i - 1} UNION ALL SELECT * FROM sel$i)"""
        .stripMargin
    }
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nq),
       |scored AS (
       |  SELECT q.query_id, c.vec_id, c.v, ${cosExpr("c.v", "q.qv")} AS rel
       |  FROM e c CROSS JOIN q WHERE c.vec_id <> q.query_id),
       |cands AS (
       |  SELECT query_id, vec_id, v, rel FROM (
       |    SELECT query_id, vec_id, v, rel,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY rel DESC, vec_id) AS rn
       |    FROM scored) WHERE rn <= $candidates),
       |sel1 AS (
       |  SELECT query_id, vec_id, 1 AS step FROM (
       |    SELECT query_id, vec_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY rel DESC, vec_id) AS rn
       |    FROM cands) WHERE rn = 1),
       |cum1 AS (SELECT * FROM sel1),
       |${steps.mkString(",\n")}
       |SELECT query_id, vec_id, step AS mmr_rank FROM cum$k
       |ORDER BY query_id, mmr_rank""".stripMargin
  }

  /** Replays `Sampling.mixturePlan` — the closed-form water-filling
    * windows over the |domains|-row aggregate, same cross-multiplied
    * integer stop condition and Hamilton remainder seats. */
  def mixturePlan(weightsPpm: Seq[(String, Long)], budget: Long,
                  maxEpochs: Int, tokensExpr: String = "n_chars",
                  domainExpr: String = "source"): String = {
    val values = weightsPpm.map { case (d, w) => s"('$d', ${w}::BIGINT)" }
      .mkString(", ")
    val rk = "CAST(cap_tokens AS DOUBLE) / weight_ppm"
    val ord = s"ORDER BY $rk, domain"
    s"""WITH w(domain, weight_ppm) AS (VALUES $values),
       |a AS (
       |  SELECT $domainExpr AS domain,
       |    CAST(SUM($tokensExpr) AS BIGINT) AS avail_tokens
       |  FROM documents GROUP BY 1),
       |j AS (
       |  SELECT a.domain, a.avail_tokens,
       |    COALESCE(w.weight_ppm, 0)::BIGINT AS weight_ppm,
       |    (a.avail_tokens * $maxEpochs)::BIGINT AS cap_tokens
       |  FROM a LEFT JOIN w ON w.domain = a.domain),
       |p AS (SELECT * FROM j WHERE weight_ppm > 0),
       |s AS (
       |  SELECT *,
       |    COALESCE(CAST(SUM(cap_tokens) OVER ($ord
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS capex,
       |    COALESCE(CAST(SUM(weight_ppm) OVER ($ord
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS wex,
       |    CAST(SUM(weight_ppm) OVER () AS BIGINT) AS wpos
       |  FROM p),
       |t AS (
       |  SELECT *, CASE WHEN ($budget - capex) * weight_ppm <
       |                      cap_tokens * (wpos - wex)
       |            THEN 1 ELSE 0 END AS stop
       |  FROM s),
       |u AS (
       |  SELECT *, CASE WHEN MAX(stop) OVER ($ord
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0
       |    THEN 1 ELSE 0 END AS capped
       |  FROM t),
       |v AS (
       |  SELECT *,
       |    CAST(SUM(CASE WHEN capped = 1 THEN cap_tokens ELSE 0 END)
       |      OVER () AS BIGINT) AS capsumf,
       |    CAST(SUM(CASE WHEN capped = 0 THEN weight_ppm ELSE 0 END)
       |      OVER () AS BIGINT) AS wu
       |  FROM u),
       |x AS (
       |  SELECT *, GREATEST($budget - capsumf, 0) AS remb,
       |    CASE WHEN capped = 1 THEN 0
       |         ELSE (GREATEST($budget - capsumf, 0) * weight_ppm) // wu
       |    END AS base,
       |    CASE WHEN capped = 1 THEN -1
       |         ELSE (GREATEST($budget - capsumf, 0) * weight_ppm) % wu
       |    END AS remr
       |  FROM v),
       |y AS (
       |  SELECT *, CAST(remb - SUM(base) OVER () AS BIGINT) AS seats,
       |    ROW_NUMBER() OVER (ORDER BY remr DESC, domain) AS rk
       |  FROM x),
       |z AS (
       |  SELECT domain, avail_tokens, weight_ppm, cap_tokens,
       |    capped::BIGINT AS capped,
       |    (CASE WHEN capped = 1 THEN cap_tokens
       |          ELSE base + CASE WHEN rk <= seats THEN 1 ELSE 0 END
       |     END)::BIGINT AS planned_tokens
       |  FROM y
       |  UNION ALL
       |  SELECT domain, avail_tokens, weight_ppm, cap_tokens,
       |    0::BIGINT, 0::BIGINT
       |  FROM j WHERE weight_ppm = 0)
       |SELECT domain, avail_tokens, weight_ppm, cap_tokens, capped,
       |  planned_tokens,
       |  (CASE WHEN avail_tokens <= 0 THEN 0
       |        ELSE planned_tokens * 1000000 // avail_tokens
       |   END)::BIGINT AS epochs_micro
       |FROM z ORDER BY domain""".stripMargin
  }

  /** Replays Similarity.kCenter step by step (the mmrRerank generated-
    * selection pattern): seed = smallest vec_id, then k−1 rounds each
    * picking the candidate with minimal max-cosine to the selected set
    * (ties → smallest vec_id). */
  /** The greedy selection chain of [[kCenter]] (seed + k−1 farthest-
    * point rounds), assuming an `e(vec_id, v)` CTE in scope.
    * MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, so the
    * cum(i) → sel(i) → ms(i) → cum(i−1) chain re-evaluates its whole
    * prefix at every reference — exponential in k (measured: 4 min at
    * 2000 vectors, k=8; materialized: seconds). */
  private def kCenterSteps(k: Int): String = {
    val steps = (2 to k).map { i =>
      s"""ms$i AS MATERIALIZED (
         |  SELECT c.vec_id, MAX(${cosExpr("c.v", "s.v")}) AS mc
         |  FROM e c
         |  JOIN cum${i - 1} m ON true
         |  JOIN e s ON s.vec_id = m.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM cum${i - 1} x
         |                    WHERE x.vec_id = c.vec_id)
         |  GROUP BY c.vec_id),
         |sel$i AS MATERIALIZED (
         |  SELECT vec_id, $i AS step FROM ms$i
         |  ORDER BY mc ASC, vec_id LIMIT 1),
         |cum$i AS MATERIALIZED (
         |  SELECT * FROM cum${i - 1} UNION ALL SELECT * FROM sel$i)"""
        .stripMargin
    }
    s"""sel1 AS (SELECT vec_id, 1 AS step FROM e ORDER BY vec_id LIMIT 1),
       |cum1 AS MATERIALIZED (SELECT * FROM sel1),
       |${steps.mkString(",\n")}""".stripMargin
  }

  def kCenter(k: Int = 8): String =
    s"""WITH e AS MATERIALIZED (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |  WHERE embedding IS NOT NULL),
       |${kCenterSteps(k)}
       |SELECT vec_id, step::BIGINT AS step FROM cum$k
       |ORDER BY step""".stripMargin

  /** Replays the vector-pipeline flagship (q_vector_e2e): SemDeDup
    * survivors (the [[semanticDedup]] relation verbatim, one spelling
    * of the convention) restricted into the kCenter `e`, then the same
    * greedy selection chain — the whole vector curation path
    * hash-checked as one composed query. */
  def vectorPipelineE2e(kCells: Int = 64, iters: Int = 1,
                        minCosine: Double = 0.2, kSel: Int = 8): String = {
    val surv = semanticDedup(kCells, iters, minCosine = minCosine)
      .replaceAll("ORDER BY a.vec_id\\s*$", "")
    s"""WITH surv AS MATERIALIZED (SELECT vec_id FROM ($surv)),
       |e AS MATERIALIZED (
       |  SELECT e0.vec_id, e0.embedding::DOUBLE[] AS v
       |  FROM embeddings e0 JOIN surv USING (vec_id)
       |  WHERE e0.embedding IS NOT NULL),
       |${kCenterSteps(kSel)}
       |SELECT vec_id, step::BIGINT AS step FROM cum$kSel
       |ORDER BY step""".stripMargin
  }

  /** Replays Similarity.jlProject: the same md5-derived planes
    * interpolated as literals, left-fold dots, one literal scale. */
  def jlProject(dim: Int = 64, outDim: Int = 16, seed: Long = 42L): String = {
    val planes = VectorFunctions.hashPlanes(outDim, dim, seed)
    val scale = dlit(1.0 / math.sqrt(outDim.toDouble))
    val cols = planes.zipWithIndex.map { case (p, i) =>
      s"${dot("v", planeList(p))} * $scale AS jl_$i"
    }.mkString(",\n  ")
    s"""SELECT vec_id,
       |  $cols
       |FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
       |ORDER BY vec_id""".stripMargin
  }

  /** Shared SQ8 CTE prefix `e, b`: per-dimension min/max bounds — the
    * exact replay of Similarity.sqBounds (order-insensitive exact
    * aggregates). */
  private def sqCtes(dim: Int): String =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT t.pos, MIN(e.v[t.pos]) AS lo, MAX(e.v[t.pos]) AS hi
       |  FROM e CROSS JOIN unnest(range(1, ${dim + 1})) AS t(pos)
       |  GROUP BY t.pos)""".stripMargin

  /** The SQ8 level of component `pos`: floor((x − lo)·255/(hi − lo) + .5),
    * 0 on constant dimensions — the same op order Similarity.sqEncode
    * projects. */
  private def sqCodeExpr: String =
    """CASE WHEN b.hi = b.lo THEN 0
      |        ELSE floor((e.v[b.pos] - b.lo) * 255.0 / (b.hi - b.lo) + 0.5) END"""
      .stripMargin

  /** Replays q_sq_encode (Similarity.sqBounds + sqEncode): every
    * (vec_id, pos) 8-bit level. */
  def sqEncode(dim: Int = 64): String =
    s"""WITH ${sqCtes(dim)}
       |SELECT e.vec_id, (b.pos - 1)::BIGINT AS pos,
       |  ($sqCodeExpr)::BIGINT AS code
       |FROM e CROSS JOIN b
       |WHERE e.v IS NOT NULL -- Spark's posexplode emits no rows for a null embedding
       |ORDER BY e.vec_id, pos""".stripMargin

  /** Replays q_ann_sq (Similarity.sqTopK): reconstruct every corpus
    * vector as lo + code·((hi − lo)/255) per component, cosine against
    * the exact query vectors, top-k per query. */
  def annSq(dim: Int = 64, k: Int = 10, nq: Int = 4): String =
    s"""WITH ${sqCtes(dim)},
       |recon AS (
       |  SELECT e.vec_id,
       |    list(b.lo + ($sqCodeExpr) * ((b.hi - b.lo) / 255.0)
       |         ORDER BY b.pos) AS rv
       |  FROM e CROSS JOIN b GROUP BY e.vec_id),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nq)
       |SELECT query_id, vec_id, cos, rank FROM (
       |  SELECT q.query_id, r.vec_id, ${cosExpr("r.rv", "q.qv")} AS cos,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id
       |      ORDER BY cos DESC, r.vec_id) AS BIGINT) AS rank
       |  FROM recon r CROSS JOIN q WHERE r.vec_id <> q.query_id) z
       |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin

  /** Replays [[graft.operators.Bm25.score]] with the SAME constants and
    * the SAME parenthesization (every floating-point operation happens in
    * the same order, so with the micro-scaled rounding the scores are
    * exactly comparable despite ln/division ulp sensitivity). */
  def bm25(terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): String = {
    val dfs = terms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN list_contains(toks, '$t') THEN 1 ELSE 0 END)::BIGINT AS df$i"
    }.mkString(",\n        ")
    val tfs = terms.zipWithIndex.map { case (t, i) =>
      s"(len(list_filter(toks, x -> x = '$t')))::DOUBLE AS tf$i"
    }.mkString(",\n        ")
    val parts = terms.indices.map { i =>
      s"(ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0) * (tf$i * ${dlit(k1 + 1)}))" +
        s" / (tf$i + ${dlit(k1)} * (${dlit(1 - b)} + ${dlit(b)} * (dl / (sumdl / n))))"
    }.mkString("(", " + ", ")")
    s"""WITH d AS (
       |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
       |  FROM documents),
       |l AS (SELECT doc_id, toks, len(toks)::BIGINT AS dl FROM d),
       |s AS (SELECT COUNT(*)::BIGINT AS n, SUM(dl)::BIGINT AS sumdl,
       |        $dfs
       |      FROM l),
       |f AS (SELECT doc_id, dl, n, sumdl,
       |        ${terms.indices.map(i => s"df$i").mkString(", ")},
       |        $tfs
       |      FROM l CROSS JOIN s)
       |SELECT doc_id, round($parts * 1000000.0)::BIGINT AS score_micro
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** Replays Layout.quantize + Layout.zorderKey over lineitem's
    * (l_partkey, l_suppkey) with data-derived min/max bounds. Pure
    * integer arithmetic both engines: subtract-min, scale by 2^bits,
    * integer divide (`//` — inputs non-negative, so floor == truncate),
    * then interleave the low bits with shift/and/or. The term list is
    * generated from the SAME (column, lane) loop Layout.zorderKey uses. */
  def zorderLineitem(bits: Int = 8): String = {
    val cols = Seq("q0", "q1")
    val morton = (for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield s"((($c >> $j) & 1) << ${j * cols.length + i})")
      .mkString("(", " | ", ")")
    s"""WITH b AS (SELECT min(l_partkey) AS plo, max(l_partkey) AS phi,
       |    min(l_suppkey) AS slo, max(l_suppkey) AS shi FROM lineitem),
       |q AS (SELECT l_orderkey, l_linenumber,
       |    ((l_partkey - plo) * ${1L << bits}) // (phi - plo + 1) AS q0,
       |    ((l_suppkey - slo) * ${1L << bits}) // (shi - slo + 1) AS q1
       |  FROM lineitem CROSS JOIN b)
       |SELECT l_orderkey, l_linenumber, ($morton)::BIGINT AS zkey
       |FROM q ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  /** Shared BPE CTE chain replaying [[graft.operators.Corpus.bpeTrain]]
    * round by round (the lloydCtes pattern for iterative training): v0 =
    * the word histogram with char-level start sequences + `</w>`; each
    * round i = weighted adjacent-pair counts → (c DESC, pair ASC)
    * argmax → the double-space literal-replace merge application
    * (Corpus.bpeApplyMerge — identical left-to-right non-overlapping
    * literal semantics in both engines). */
  private def bpeCtes(k: Int): String = {
    val v0 =
      """v0 AS (
        |  SELECT word, COUNT(*)::BIGINT AS n,
        |    ltrim(trim(regexp_replace(word, '(.)', '\1 ', 'g')) || ' </w>') AS seq
        |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |        FROM documents)
        |  GROUP BY word)""".stripMargin
    val rounds = (1 to k).map { i =>
      s"""p$i AS (
         |  SELECT pair, SUM(n)::BIGINT AS c FROM (
         |    SELECT n, unnest(list_transform(range(1, len(syms)),
         |      j -> syms[j] || ' ' || syms[j+1])) AS pair
         |    FROM (SELECT n, string_split(seq, ' ') AS syms FROM v${i - 1}))
         |  GROUP BY pair),
         |m$i AS (SELECT pair, c FROM p$i ORDER BY c DESC, pair LIMIT 1),
         |-- LEFT JOIN, not CROSS JOIN: when merges exhaust before round
         |-- $i, m$i is EMPTY and a cross join would wipe v$i (and every
         |-- later vocab) — pass seq through unchanged instead, matching
         |-- the Spark trainer's early stop
         |v$i AS (
         |  SELECT word, n,
         |    CASE WHEN m.pair IS NULL THEN seq ELSE
         |      trim(regexp_replace(
         |        replace(' ' || replace(seq, ' ', '  ') || ' ',
         |          ' ' || replace(m.pair, ' ', '  ') || ' ',
         |          ' ' || replace(m.pair, ' ', '') || ' '),
         |        ' {2,}', ' ', 'g')) END AS seq
         |  FROM v${i - 1} LEFT JOIN m$i m ON TRUE)""".stripMargin
    }
    (v0 +: rounds).mkString(",\n")
  }

  def bpeMerges(k: Int): String = {
    val unions = (1 to k).map(i =>
      s"SELECT $i::BIGINT AS round, pair, c AS weighted_count FROM m$i")
      .mkString("\nUNION ALL\n")
    s"WITH ${bpeCtes(k)}\n$unions\nORDER BY round"
  }

  def bpeTokenize(k: Int): String =
    s"""WITH ${bpeCtes(k)},
       |inst AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
       |  FROM documents),
       |cnt AS (
       |  SELECT i.doc_id, SUM(len(string_split(v.seq, ' ')))::BIGINT AS s
       |  FROM inst i JOIN v$k v ON v.word = i.word
       |  GROUP BY i.doc_id)
       |SELECT d.doc_id, COALESCE(c.s, 0)::BIGINT AS n_bpe_tokens
       |FROM documents d LEFT JOIN cnt c ON c.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
