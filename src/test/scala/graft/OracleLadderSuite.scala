package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions

/** ADVICE r20: OracleSql.embedDedup re-spells
  * [[VectorFunctions.lshPlanesFor]]'s plane-count ladder as a SQL CASE
  * with independently duplicated defaults — a one-sided change would
  * silently desync query and oracle plane counts. This suite extracts
  * the thresholds from the GENERATED SQL (not a re-derivation) and
  * replays DuckDB's first-match CASE semantics against lshPlanesFor at
  * the band boundaries. Pure string work — no Spark session. */
class OracleLadderSuite extends AnyFunSuite {

  private val CaseArm = """WHEN n <= (\d+) THEN (\d+)""".r
  private val Default = """ELSE (\d+) END\) AS p""".r

  /** First-match CASE evaluation over the arms parsed out of the SQL. */
  private def ladderP(sql: String, n: Long): Int = {
    val arms = CaseArm.findAllMatchIn(sql)
      .map(m => (m.group(1).toLong, m.group(2).toInt)).toSeq
    assert(arms.nonEmpty, "no CASE arms found in embedDedup SQL")
    val default = Default.findFirstMatchIn(sql)
      .map(_.group(1).toInt)
      .getOrElse(fail("no CASE default found in embedDedup SQL"))
    arms.collectFirst { case (thr, p) if n <= thr => p }.getOrElse(default)
  }

  test("embedDedup CASE ladder == lshPlanesFor at every band boundary") {
    val sql = OracleSql.embedDedup()
    // defaults: minPlanes 6, maxPlanes 16, targetBucket 8 → bands flip
    // at n = 2^p·8; probe both sides of every boundary plus the extremes
    val boundaries = (6 until 16).map(p => (1L << p) * 8L)
    val probes = Seq(1L, 511L, 512L, 513L) ++
      boundaries.flatMap(b => Seq(b - 1, b, b + 1)) ++
      Seq(262144L, 262145L, 524288L, 524289L, 10_000_000L)
    probes.foreach { n =>
      assert(ladderP(sql, n) == VectorFunctions.lshPlanesFor(n),
        s"ladder and lshPlanesFor disagree at n=$n")
    }
  }
}
