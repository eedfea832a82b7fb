package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ / Great-Expectations-style data validation: declarative rules
  * evaluated corpus-wide into one (rule, n_rows, n_pass, n_fail) report —
  * the quality gate a production ingestion runs BEFORE the pipeline
  * proper, so a bad drop (schema drift, null storms, duplicated keys)
  * fails loudly instead of polluting downstream stages. Beyond-reference
  * surface.
  *
  * Scale shape: every row-local rule folds into ONE aggregate pass over
  * the corpus (scan-local flags, map-side partials — adding rules adds
  * columns, not scans; the melt to long format explodes the single
  * 1-row aggregate, never the corpus). Each uniqueness rule costs one
  * groupBy(key) shuffle whose per-key counts re-aggregate to a single
  * row. All outputs are integer counts — exact cross-engine.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** Row-local boolean expectation; a NULL predicate counts as FAIL
    * (the conservative gate: unprovable is not passing). */
  final case class RowRule(name: String, pred: Column) extends Rule

  /** Key-uniqueness expectation: a row passes iff its key is non-null
    * and its value appears exactly once in the frame. */
  final case class UniqueRule(name: String, keyCol: String) extends Rule

  /** Evaluate `rules` over `df`. Returns one row per rule:
    * (rule, n_rows, n_pass, n_fail). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "expectations: at least one rule")
    require(rules.map(_.name).distinct.size == rules.size,
      s"expectations: duplicate rule names in ${rules.map(_.name)}")
    val rowRules = rules.collect { case r: RowRule => r }
    val uniqRules = rules.collect { case u: UniqueRule => u }
    val parts = Seq.newBuilder[DataFrame]
    if (rowRules.nonEmpty) {
      val aggs = count(lit(1)).as("__n") +: rowRules.map(r =>
        sum(when(coalesce(r.pred, lit(false)), 1L).otherwise(0L))
          .as(s"__p_${r.name}"))
      val one = df.agg(aggs.head, aggs.tail: _*)
      parts += one.select(explode(array(rowRules.map(r =>
          struct(lit(r.name).as("rule"), col("__n").as("n_rows"),
            coalesce(col(s"__p_${r.name}"), lit(0L)).as("n_pass"))): _*)).as("__e"))
        .select(col("__e.rule"), col("__e.n_rows"), col("__e.n_pass"))
    }
    uniqRules.foreach { u =>
      parts += df.select(col(u.keyCol).as("__k"))
        .groupBy("__k").agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c")).as("n_rows"),
          sum(when(col("__k").isNotNull && col("__c") === 1L, 1L)
            .otherwise(0L)).as("n_pass"))
        .select(lit(u.name).as("rule"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          coalesce(col("n_pass"), lit(0L)).as("n_pass"))
    }
    parts.result().reduce(_ unionAll _)
      .withColumn("n_fail", col("n_rows") - col("n_pass"))
  }
}
