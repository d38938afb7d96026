package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `try_cast(s AS INT)` semantics without the exception-driven failure
  * path.
  *
  * Spark's TRY-mode string→int cast reaches null-on-failure by throwing
  * and catching a per-row exception; on data where most rows DON'T
  * parse (the common shape for a quality/validation pass over dirty
  * text) that costs ~10 µs/row — measured 1.7 s vs 0.1 s over 1.5 M
  * always-failing rows in this repo's bench. This expression reaches
  * the identical result through `UTF8String.toInt(IntWrapper)`, the
  * non-throwing parser, after `trimAll()` — the same trim TRY cast
  * applies — plus one extra guard: that parser is the LEGACY-cast
  * dialect, which truncates fractional strings (`"5.0"` → 5) where
  * `try_cast` returns null (its strict `allowDecimal=false` overload is
  * private to UTF8String), so any trimmed input containing a `.` is
  * rejected up front. With `.` excluded the two dialects agree on every
  * remaining input class: sign handling, inner whitespace, overflow,
  * non-ASCII digits, and junk all fail identically.
  *
  * Semantics are pinned expression-vs-`try_cast` over the full edge-case
  * set (signs, whitespace, decimals, overflow, unicode digits, junk) in
  * TryToIntSpec: both return null unless the trimmed input is an
  * optionally-signed ASCII-decimal integer within Int range.
  *
  * Like [[CosineSimilarity]], this is SURVEY.md §2.1 ladder rung (b): a
  * scalar the built-ins can express, where the hot path earns a native
  * codegen Expression.
  */
case class TryToInt(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"try_to_int expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "try_to_int"
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].trimAll()
    if (s.contains(TryToInt.Dot)) null
    else {
      // wrapper per call: the interpreted path is the rare fallback, and
      // a shared instance could race across threads evaluating one plan
      val w = new UTF8String.IntWrapper
      if (s.toInt(w)) w.value else null
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val utf8Class = classOf[UTF8String].getName
    val wrapperClass = classOf[UTF8String.IntWrapper].getName.replace('$', '.')
    val wrapper = ctx.addMutableState(
      wrapperClass, "tryToIntWrapper", v => s"$v = new $wrapperClass();",
    )
    val dot = ctx.addReferenceObj("tryToIntDot", TryToInt.Dot, utf8Class)
    val trimmed = ctx.freshName("trimmed")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |$utf8Class $trimmed = $c.trimAll();
         |if (!$trimmed.contains($dot) && $trimmed.toInt($wrapper)) {
         |  ${ev.value} = $wrapper.value;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TryToInt {
  /** Fractional-marker guard shared by both eval paths (immutable, so
    * safe as a process-wide singleton and as a codegen reference obj).
    */
  private[functions] val Dot: UTF8String = UTF8String.fromString(".")
}
