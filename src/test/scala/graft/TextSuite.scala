package graft

import org.apache.spark.sql.functions._
import graft.api.toDf
import graft.functions.TextFunctions._

/** Text-analysis primitives with literal golden inputs (the synthetic
  * corpus contains no PII-like strings, so redaction is pinned here
  * rather than through a vacuous corpus query). */
class TextSuite extends SparkSpec {

  test("redactPii replaces emails and URLs with typed placeholders") {
    val df = toDf(spark)("id" -> Seq(1, 2, 3), "t" -> Seq(
      "contact me at jane.doe+spam@example.co.uk today",
      "docs at https://example.com/a?b=c#frag and http://t.co/x",
      "no pii here at all")).df
    val r = df.select(redactPii(col("t"))).orderBy(lit(1)).collect().map(_.getString(0))
    assert(r.contains("contact me at <EMAIL> today"))
    assert(r.contains("docs at <URL> and <URL>"))
    assert(r.contains("no pii here at all"))
  }

  test("FeatureHashText kernel equals the HOF fold (incl. empty/whitespace)") {
    val df = toDf(spark)("id" -> Seq(1, 2, 3, 4), "t" -> Seq(
      "the quick brown fox the quick",
      "a",
      "  tabs\tand\nnewlines  ",
      "")).df
    val viaKernel = df.select(col("id"), featureHash(col("t"), 16).as("v"))
      .orderBy("id").collect().map(_.getSeq[Long](1)).toSeq
    val viaHof = df.select(col("id"), featureHashHof(col("t"), 16).as("v"))
      .orderBy("id").collect().map(_.getSeq[Long](1)).toSeq
    assert(viaKernel == viaHof)
    assert(viaKernel.head.sum == 6L) // six tokens counted
  }

  test("type-token and top-token ratios") {
    val df = toDf(spark)("id" -> Seq(1), "t" -> Seq("a b a a c")).df
      .withColumn("toks", tokens(col("t")))
    val row = df.select(
      typeTokenRatioFromTokens(col("toks")),
      topTokenRatioFromTokens(col("toks"))).head()
    assert(row.getDouble(0) == 3.0 / 5.0) // {a,b,c} of 5 tokens
    assert(row.getDouble(1) == 3.0 / 5.0) // 'a' appears 3 of 5
  }
}
