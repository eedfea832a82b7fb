package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocklist filtering — drop (or audit) rows whose key appears in a
  * deny-list (banned domains/sources/license buckets), the first gate of a
  * web-corpus curation pipeline. Beyond-reference extension.
  *
  * Scale shape: the blocklist is dimension-sized (thousands..millions of
  * entries) while the corpus is fact-sized, so both verbs hint BROADCAST
  * and plan as a map-side BroadcastHashJoin(LeftAnti/LeftSemi) — the corpus
  * never shuffles (plan-asserted in BlocklistSuite). A blocklist too large
  * to broadcast degrades gracefully: drop the hint and the same plan runs
  * as a shuffle join.
  *
  * Anti-join (not `NOT IN`) semantics on purpose: a NULL key row is KEPT
  * by the anti join, while SQL `NOT IN` over a list containing NULL drops
  * every row — the join form is the one that behaves sanely on dirty data. */
object Blocklist {

  private def keyed(blocklist: DataFrame, column: String, blockCol: String) =
    broadcast(blocklist.select(col(blockCol).as(column)).na.drop().distinct())

  /** Rows of `df` whose `column` does NOT appear in
    * `blocklist.blockCol` (default: same name). */
  def filterBlocklist(df: DataFrame, blocklist: DataFrame, column: String,
                      blockCol: String = null): DataFrame =
    df.join(keyed(blocklist, column, Option(blockCol).getOrElse(column)),
      Seq(column), "left_anti")

  /** The complement — rows that ARE blocked (audit/reporting side). */
  def matchBlocklist(df: DataFrame, blocklist: DataFrame, column: String,
                     blockCol: String = null): DataFrame =
    df.join(keyed(blocklist, column, Option(blockCol).getOrElse(column)),
      Seq(column), "left_semi")
}
