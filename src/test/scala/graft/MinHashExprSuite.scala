package graft

import org.apache.spark.sql.functions._
import graft.api.toDf
import graft.operators.Dedup

/** The codegen'd MinHashSig expression must be bit-identical to the
  * interpreted HOF formulation it replaced (and thereby to the DuckDB
  * oracle, which the gate checks end-to-end). */
class MinHashExprSuite extends SparkSpec {

  private def docs = toDf(spark)(
    "doc_id" -> Seq(1, 2, 3, 4, 5),
    "text" -> Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy cat",
      "completely different content here with many extra words to shingle",
      "short",           // fewer tokens than the shingle size
      "two words")).df   // exactly below the default shingle size

  private def trickyDocs = toDf(spark)(
    "doc_id" -> Seq(1, 2, 3),
    "text" -> Seq(
      "  leading and trailing   spaces  ",
      "tabs\tnewlines\nand\r\nCRLF mixed in",
      "")).df

  test("custom expression equals interpreted HOF signature") {
    val a = Dedup.withMinhashSignature(docs, "text")
      .select(col("doc_id"), col("sig")).orderBy("doc_id").collect().toSeq
    val b = Dedup.withMinhashSignatureHof(docs, "text")
      .select(col("doc_id"), col("sig")).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("kernel tokenization matches Spark split(trim, \\s+) on tricky whitespace") {
    // the expression tokenizes in Scala (UTF8String.trim + Pattern split);
    // any divergence from the Column pipeline shows up as a different sig
    val a = Dedup.withMinhashSignature(trickyDocs, "text")
      .select(col("doc_id"), col("sig")).orderBy("doc_id").collect().toSeq
    val b = Dedup.withMinhashSignatureHof(trickyDocs, "text")
      .select(col("doc_id"), col("sig")).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("signature has k elements below the prime, and near-dup docs agree more") {
    val rows = Dedup.withMinhashSignature(docs, "text")
      .select(col("doc_id"), col("sig")).orderBy("doc_id").collect()
    rows.foreach { r =>
      val sig = r.getSeq[Long](1)
      assert(sig.length == 32)
      assert(sig.forall(v => v >= 0 && v <= Dedup.P))
    }
    def agree(i: Int, j: Int): Int =
      rows(i).getSeq[Long](1).zip(rows(j).getSeq[Long](1)).count { case (x, y) => x == y }
    assert(agree(0, 1) > agree(0, 2)) // fox/dog vs fox/cat >> unrelated
  }

  test("interpreted eval path (non-codegen) matches too") {
    // force the interpreted Expression.eval path
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val a = Dedup.withMinhashSignature(docs, "text")
        .select(col("doc_id"), col("sig")).orderBy("doc_id").collect().toSeq
      val b = Dedup.withMinhashSignatureHof(docs, "text")
        .select(col("doc_id"), col("sig")).orderBy("doc_id").collect().toSeq
      assert(a == b)
    }
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
