package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftExtensions
import graft.functions.VectorFunctions

/** SQL-surface registration and the cosine fusion rule. */
class ExtensionsSuite extends SparkSpec {

  test("registered SQL functions run the graft kernels") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_cosine(array(1.0D, 2.0D), array(1.0D, 2.0D)) AS c,
        |       graft_simhash48('the quick brown fox') AS sh""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    // same simhash the Scala API computes
    val viaApi = spark.sql("SELECT 'the quick brown fox' AS t")
      .select(org.apache.spark.sql.graftshim.Shim.toColumn(
        org.apache.spark.sql.graftshim.SimHashText(
          org.apache.spark.sql.graftshim.Shim.toExpression(col("t")))))
      .head().getLong(0)
    assert(r.getLong(2) == viaApi)
    val fh = spark.sql("SELECT graft_feature_hash('a b a', 8) AS v").head()
      .getSeq[Long](0)
    assert(fh.length == 8 && fh.sum == 3L && fh.max == 2L)
    // NFC via SQL: 'e' + combining acute (U+0301) composes to 1 char.
    // (Spark SQL's chr() is mod-256 ASCII — unlike DuckDB's codepoint
    // chr — so the combining mark goes in as a \u string escape.)
    val n = spark.sql(
      "SELECT length(graft_nfc('e\\u0301')) AS l").head().getInt(0)
    assert(n == 1, s"graft_nfc did not compose: length $n")
    // winnow via SQL equals the Scala API kernel
    val winSql = spark.sql(
      "SELECT graft_winnow('the quick brown fox', 5, 4) AS f").head().getSeq[Long](0)
    val winApi = spark.sql("SELECT 'the quick brown fox' AS t")
      .select(graft.functions.TextFunctions.winnowFingerprints(col("t"), 5, 4))
      .head().getSeq[Long](0)
    assert(winSql == winApi && winSql.nonEmpty)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_winnow('x', 5, length('abc')) AS f").collect()
    }
    assert(err.getMessage.contains("literal"))
    // arity and domain errors are argument errors, not index crashes
    val arity = intercept[Exception] {
      spark.sql("SELECT graft_winnow('x', 5) AS f").collect()
    }
    assert(arity.getMessage.contains("3 arguments"))
    val dom = intercept[Exception] {
      spark.sql("SELECT graft_winnow('x', -1, 4) AS f").collect()
    }
    assert(dom.getMessage.contains("positive"))
    // BIGINT literals are integers too
    val viaLong = spark.sql("SELECT graft_winnow('the quick brown fox', 5L, 4L) AS f")
      .head().getSeq[Long](0)
    assert(viaLong == winApi)
  }

  test("FuseCosine rewrites the unfused pattern into one VecCosine kernel") {
    GraftExtensions.register(spark)
    val emb = graft.sources.Tables.df(spark, "/root/testdata/sf0.001", "embeddings")
    val unfused = emb.select(
      (VectorFunctions.dot(col("embedding"), col("embedding")) /
        (VectorFunctions.norm(col("embedding")) *
          VectorFunctions.norm(col("embedding")))).as("c"))
    val optimized = unfused.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_cosine"),
      s"cosine pattern not fused:\n$optimized")
    assert(math.abs(unfused.limit(1).head().getDouble(0) - 1.0) < 1e-9)
  }
}
