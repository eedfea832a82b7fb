// Same org.apache.spark.sql subpackage as the expressions it registers
// (FunctionRegistry/ExpressionInfo are sql-internal). Logically graft's
// plans/ extension layer.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Literal, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: rewrite the unfused cosine pattern
  * `vec_dot(a,b) / (sqrt(vec_dot(a,a)) * sqrt(vec_dot(b,b)))` into the
  * single-pass [[VecCosine]] kernel. The graft Column API emits
  * VecCosine directly; this rule catches the pattern when USERS write it
  * — SQL via the registered functions, or compositions of `dot`/`norm`.
  * Safe because the fused kernel executes the identical IEEE op sequence
  * (pinned bit-exact in VecExprSuite). */
object FuseCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(VecDot(a, b),
          Multiply(Sqrt(VecDot(a2, a3)), Sqrt(VecDot(b2, b3)), _), _)
          if a2.semanticEquals(a) && a3.semanticEquals(a) &&
            b2.semanticEquals(b) && b3.semanticEquals(b) =>
        VecCosine(a, b)
    }
}

/** Graft's Spark extension surface.
  *
  * Two ways in:
  *  - config: `spark.sql.extensions=org.apache.spark.sql.graftshim.GraftExtensions`
  *    (build-time injection via [[SparkSessionExtensions]]);
  *  - runtime: `GraftExtensions.register(spark)` on a live session
  *    (temp-function registry + experimental optimizer rules).
  * Both expose the codegen'd kernels to SQL users: `vec_dot(a, b)`,
  * `vec_cosine(a, b)`, `graft_simhash48(text)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => FuseCosine)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    // 11-arg constructor: the 5-arg form is deprecated since 3.0
    new ExpressionInfo("org.apache.spark.sql.graftshim", null, name, usage,
      "", "", "", "", "", "", "built-in")

  private[graftshim] val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", info("vec_dot", "vec_dot(a, b) - single-pass dot product"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))),
    ("vec_cosine", info("vec_cosine", "vec_cosine(a, b) - fused cosine similarity"),
      (es: Seq[Expression]) => VecCosine(es(0), es(1))),
    ("graft_simhash48", info("graft_simhash48", "graft_simhash48(text) - 48-bit SimHash"),
      (es: Seq[Expression]) => SimHashText(es(0))),
    ("graft_feature_hash",
      info("graft_feature_hash",
        "graft_feature_hash(text, dim) - hashing-trick count vector (dim must be a literal)"),
      (es: Seq[Expression]) => es(1) match {
        case Literal(d: Int, _) => FeatureHashText(es(0), d)
        case other => throw new IllegalArgumentException(
          s"graft_feature_hash: dim must be an integer literal, got $other")
      }),
    ("graft_nfc", info("graft_nfc",
      "graft_nfc(text) - Unicode NFC canonical composition"),
      (es: Seq[Expression]) => NfcNormalize(es(0))),
    ("graft_winnow",
      info("graft_winnow",
        "graft_winnow(text, k, w) - MOSS winnowing fingerprints " +
          "(char-k-gram hash48, window w; k and w must be literals)"),
      (es: Seq[Expression]) => {
        if (es.length != 3) throw new IllegalArgumentException(
          s"graft_winnow: expected 3 arguments (text, k, w), got ${es.length}")
        def asPosInt(e: Expression, name: String): Int = e match {
          case Literal(v: Int, _) if v >= 1 => v
          case Literal(v: Long, _) if v >= 1 && v <= Int.MaxValue => v.toInt
          case other => throw new IllegalArgumentException(
            s"graft_winnow: $name must be a positive integer literal, got $other")
        }
        WinnowText(es(0), asPosInt(es(1), "k"), asPosInt(es(2), "w"))
      }))

  /** Register on an already-built session (tests, spark-shell). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
    if (!spark.experimental.extraOptimizations.contains(FuseCosine))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FuseCosine
  }
}
