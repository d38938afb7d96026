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
  * always-failing rows in this repo's bench. This expression returns
  * the identical result through `UTF8String.toInt(IntWrapper)`, the
  * non-throwing parser the LEGACY cast uses, after `trimAll()` — the
  * same trim TRY cast applies.
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
    // wrapper per call: the interpreted path is the rare fallback, and a
    // shared instance could race across threads evaluating one plan
    val w = new UTF8String.IntWrapper
    if (input.asInstanceOf[UTF8String].trimAll().toInt(w)) w.value else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wrapperClass = classOf[UTF8String.IntWrapper].getName.replace('$', '.')
    val wrapper = ctx.addMutableState(
      wrapperClass, "tryToIntWrapper", v => s"$v = new $wrapperClass();",
    )
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($c.trimAll().toInt($wrapper)) {
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
