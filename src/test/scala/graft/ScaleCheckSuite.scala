package graft

/** Pins the two compensating-evidence checks (graft.ScaleCheck) that
  * stand in for the sf10 DuckDB oracle on its two resource-ceiling rows
  * (q_ann_ivfpq, q_winnow_cluster — PLANS r20). The invariants asserted
  * here are the SAME integers the sf10 runs record in PLANS, so a
  * regression in either check's logic (or in the operators under it)
  * fails in CI rather than silently weakening the scale evidence.
  */
class ScaleCheckSuite extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("winnow_cc: independent label-propagation CC agrees with clusterByPairs") {
    val r = ScaleCheck.winnowCc(spark, sfDir)
    assert(r.labelMismatch == 0L,
      s"independent CC disagreed on ${r.labelMismatch} of ${r.nDocs} labels")
    assert(r.nDocs > 0 && r.nClusters > 0 && r.nClusters <= r.nDocs)
    // fixpoint genuinely reached (the loop did not run off its bound)
    assert(r.iters < 100)
    assert(r.converged, "labelMismatch computed against a non-fixpoint labeling")
  }

  test("ivfpq: store-seam round-trip is bit-exact and hit counts are coherent") {
    val r = ScaleCheck.ivfPq(spark, sfDir, nq = 4)
    assert(r.storeSeamMismatch == 0L,
      "ADC from loaded artifacts diverged from ADC from in-JVM artifacts")
    // probed candidate space at 50 vectors still yields rows for all 4
    // queries; hit counts are subsets of the ADC result by construction
    assert(r.nAdc > 0)
    assert(r.hitProbedExact >= 0 && r.hitProbedExact <= r.nAdc)
    assert(r.hitBrute >= 0 && r.hitBrute <= r.nAdc)
  }
}
