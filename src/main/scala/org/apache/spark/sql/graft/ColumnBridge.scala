package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's unified `Column` no longer exposes its catalyst expression
  * publicly; `classic.ExpressionUtils` holds the conversions but is
  * `private[sql]`. This bridge re-exports the two conversions from
  * inside the `org.apache.spark.sql` namespace — the standard extension
  * technique for libraries that build native `Expression`s (graft's
  * [[graft.functions.SortedBucket]] carries a driver-computed boundary
  * array, which no SQL-registry call string can sanely encode).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Prunable-conjunct extraction for the manifest data-skipping reader
    * ([[graft.compact.ManifestStats.readLeafFiltered]]). Spark 4's
    * `Column` wraps unresolved `ColumnNode`s (`private[sql]`, hence this
    * bridge): walk the top-level AND tree for `attr OP literal` /
    * `literal OP attr` shapes — numeric comparisons and equalities
    * become [lo, hi] intervals for the stats sidecars, STRING
    * equalities become bloom probe points. Everything else extracts
    * nothing (the caller applies the full predicate exactly, so an
    * unextracted conjunct only costs pruning opportunity). Numeric
    * equality is deliberately an interval, not a bloom point: the
    * bloom hashed the column's type, and a literal of another numeric
    * width would hash differently and wrongly prune.
    */
  def prunableConjuncts(c: Column): (Map[String, (Double, Double)], Map[String, Any]) = {
    import org.apache.spark.sql.internal.{ColumnNode, Literal => NLit, UnresolvedAttribute => NAttr, UnresolvedFunction => NFn}
    def nameOf(x: ColumnNode): Option[String] = x match {
      case a: NAttr => Some(a.nameParts.mkString("."))
      case _        => None
    }
    def numOf(x: ColumnNode): Option[Double] = x match {
      case l: NLit =>
        l.value match {
          case v: java.lang.Number      => Some(v.doubleValue())
          case v: scala.math.BigDecimal => Some(v.toDouble)
          case _                        => None
        }
      case _ => None
    }
    def strOf(x: ColumnNode): Option[String] = x match {
      case l: NLit =>
        l.value match { case s: String => Some(s); case _ => None }
      case _ => None
    }
    val inf = Double.PositiveInfinity
    var ranges = Map.empty[String, (Double, Double)]
    var points = Map.empty[String, Any]
    def tighten(col: String, lo: Double, hi: Double): Unit = {
      val (clo, chi) = ranges.getOrElse(col, (-inf, inf))
      ranges += col -> ((math.max(clo, lo), math.min(chi, hi)))
    }
    // col OP lit (isLower: the COLUMN is bounded from below); lit OP col
    // flips. Strict vs non-strict prune the same closed interval
    // (superset-keeping either way).
    def bound(l: ColumnNode, r: ColumnNode, isLower: Boolean): Unit =
      (nameOf(l), numOf(r), numOf(l), nameOf(r)) match {
        case (Some(col), Some(v), _, _) => if (isLower) tighten(col, v, inf) else tighten(col, -inf, v)
        case (_, _, Some(v), Some(col)) => if (isLower) tighten(col, -inf, v) else tighten(col, v, inf)
        case _                          => ()
      }
    def eqTo(col: String, lit: ColumnNode): Unit = {
      numOf(lit).foreach(v => tighten(col, v, v))
      strOf(lit).foreach(s => points += col -> s)
    }
    def walk(x: ColumnNode): Unit = x match {
      case f: NFn =>
        (f.functionName, f.arguments) match {
          case ("and", Seq(a, b)) => walk(a); walk(b)
          case (">" | ">=", Seq(l, r)) => bound(l, r, isLower = true)
          case ("<" | "<=", Seq(l, r)) => bound(l, r, isLower = false)
          case ("=", Seq(l, r)) =>
            (nameOf(l), nameOf(r)) match {
              case (Some(col), None) => eqTo(col, r)
              case (None, Some(col)) => eqTo(col, l)
              case _                 => ()
            }
          case _ => () // unknown conjunct: exact-only, prunes nothing
        }
      case _ => ()
    }
    walk(c.node)
    (ranges.filter { case (_, (lo, hi)) => lo > -inf || hi < inf }, points)
  }
}
