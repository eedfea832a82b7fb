package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api._
import graft.sources.Tables

/** The driver-verified query inventory: one entry per operator from
  * SURVEY.md §2, each expressed through the graft verb layer, plus a DuckDB
  * oracle where SQL-expressible.
  *
  * Oracle-parity rules used throughout (floats are only bit-stable when the
  * arithmetic is order-insensitive):
  *   - sums over integral-valued doubles (l_quantity) are exact in any order;
  *   - money sums go through `round(x*100) → long` so the reduction is exact
  *     integer arithmetic, then one final division (same IEEE op both sides);
  *   - per-row arithmetic (no reduction) is bit-identical given the same
  *     parquet input, so raw expressions are safe outside aggregates;
  *   - every query ends in a total ORDER BY so row order is deterministic.
  */
object Queries {

  type Q = (SparkSession, String) => DataFrame

  private[graft] def lineitem(s: SparkSession, dir: String) = Tables(s, dir, "lineitem")
  private[graft] def orders(s: SparkSession, dir: String) = Tables(s, dir, "orders")
  private[graft] def customer(s: SparkSession, dir: String) = Tables(s, dir, "customer")
  private[graft] def part(s: SparkSession, dir: String) = Tables(s, dir, "part")
  private[graft] def supplier(s: SparkSession, dir: String) = Tables(s, dir, "supplier")
  private[graft] def nation(s: SparkSession, dir: String) = Tables(s, dir, "nation")
  private[graft] def region(s: SparkSession, dir: String) = Tables(s, dir, "region")

  /** Exact money sum: per-row round to cents (identical double → identical
    * cents both engines), integer-sum (order-insensitive), one division. */
  private[graft] def moneySum(c: org.apache.spark.sql.Column) =
    sum(round(c * lit(100.0), 0).cast("long")) / lit(100.0)

  /** Scratch dir for a roundtrip query, unique per (format, sf dir, JVM):
    * a fixed path would let a concurrent Verify (sf0.01) and Bench
    * (sf0.1) overwrite each other's roundtrip mid-read. Registered for
    * recursive deletion at JVM exit (the read side is lazy, so the dir
    * must outlive the query's last action — exit is the earliest safe
    * point) to stop /tmp accumulating one dir per bench/verify run. */
  private[graft] val scratchDirs =
    java.util.Collections.synchronizedSet(new java.util.LinkedHashSet[String]())
  private[graft] lazy val scratchCleanupHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      scratchDirs.forEach { d =>
        // belt-and-braces: never walk outside our own scratch namespace
        if (d.startsWith("/tmp/graft_"))
          graft.operators.FpStore.deleteRecursively(
            java.nio.file.Paths.get(d))
      }
    }))
  }
  private[graft] def roundtripDir(fmt: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val pid = ProcessHandle.current().pid()
    val dir = s"/tmp/graft_${fmt}_roundtrip_${tag}_$pid"
    scratchCleanupHook
    scratchDirs.add(dir)
    dir
  }
  lazy val all: Map[String, Q] =
    QueriesVerbs.queries ++
    QueriesJoins.queries ++
    QueriesWindows.queries ++
    QueriesSampling.queries ++
    QueriesCorpus.queries ++
    QueriesDedup.queries ++
    QueriesVector.queries ++
    QueriesStreaming.queries ++
    QueriesLayout.queries

  lazy val oracles: Map[String, String] =
    QueriesVerbs.oracles ++
    QueriesJoins.oracles ++
    QueriesWindows.oracles ++
    QueriesSampling.oracles ++
    QueriesCorpus.oracles ++
    QueriesDedup.oracles ++
    QueriesVector.oracles ++
    QueriesStreaming.oracles ++
    QueriesLayout.oracles


  /** Synthetic PII appended by q_pii_redact: the generated corpus contains
    * no emails/URLs, so without this the redaction regexes would be
    * oracle-checked only on non-matching text. No single quotes (the same
    * literal is spliced into the DuckDB SQL). */
  private[graft] val PiiTail =
    " reach a.b+c@mail-host.example.com and bob@x.io via https://ex.com/a?b=1#c or http://t.co/xyz done"


  /** Query terms for q_bm25 — spliced into both engines. */
  private[graft] val Bm25Terms = Seq("vector", "stream", "merge", "window")
}
