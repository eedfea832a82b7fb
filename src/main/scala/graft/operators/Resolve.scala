package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructField

/** Analyzer-faithful single-column resolution, shared by the operators
  * that validate a measure column's dtype before building a plan
  * (histogram, quantileGate): resolve the way Spark's analyzer would
  * (case-insensitive under the default `spark.sql.caseSensitive=false`),
  * raise the same ambiguity analysis would instead of silently picking
  * the first schema match, and name the calling operator in every
  * message. One helper so a resolution refinement lands everywhere at
  * once. */
private[operators] object Resolve {

  def uniqueField(df: DataFrame, colName: String, op: String): StructField = {
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    val matches = df.schema.fields.filter(f => resolver(f.name, colName))
    require(matches.length <= 1,
      s"$op: '$colName' is ambiguous under the session resolver " +
        s"(matches ${matches.map(_.name).mkString(", ")})")
    matches.headOption.getOrElse(
      throw new IllegalArgumentException(
        s"$op: column '$colName' not in ${df.columns.mkString(", ")}"))
  }
}
