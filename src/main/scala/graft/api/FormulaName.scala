package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftshim.Shim

/** Lisp-style auto column naming for formula expressions, mirroring the
  * reference's `formulaNameMacro.nim:92-95` (`f{-1.0 * c"hwy"}` names its
  * column `"(* -1.0 hwy)"` — pinned by `testDf.nim:1468-1470`).
  *
  * Walks the unresolved Catalyst tree of a `Column`; casts are
  * transparent (type hints don't appear in the reference's names).
  */
object FormulaName {

  def lispName(c: Column): String = go(Shim.toExpression(c))

  private def opName(e: Expression): String = e match {
    case _: Add => "+"
    case _: Subtract => "-"
    case _: Multiply => "*"
    case _: Divide => "/"
    case _: Remainder => "mod"
    case _: EqualTo => "=="
    case _: LessThan => "<"
    case _: LessThanOrEqual => "<="
    case _: GreaterThan => ">"
    case _: GreaterThanOrEqual => ">="
    case _: And => "and"
    case _: Or => "or"
    case _: Not => "not"
    case f: UnresolvedFunction => f.nameParts.last
    case other => other.prettyName
  }

  private def go(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.name
    case l: Literal => String.valueOf(l.value)
    case c: Cast => go(c.child)
    case a: Alias => go(a.child)
    case u: UnaryMinus => s"(- ${go(u.child)})"
    case other if other.children.isEmpty => other.sql
    case other => s"(${opName(other)} ${other.children.map(go).mkString(" ")})"
  }
}
