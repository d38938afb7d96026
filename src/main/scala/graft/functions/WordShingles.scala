package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping n-word shingles over a pre-split word array, with
  * whole-stage codegen — the hot inner loop of every pairwise-dedup
  * query (n-gram Jaccard, MinHash, their capped/banded variants).
  *
  * Semantics are identical to the composable form
  * `transform(sequence(0, size(w)-n), i -> concat_ws(' ', element_at(w,i+1), …))`
  * FOR ARRAYS OF >= n WORDS: `size(w) - n + 1` shingles, null words
  * SKIPPED in the join exactly as `concat_ws` skips them. Below n words
  * the two deliberately diverge: the lambda's descending
  * `sequence(0, negative)` makes ANSI `element_at` throw, while this
  * expression returns an empty array — strictly safer, which is why the
  * call sites' `size >= 3` guard is row pruning, not a crash guard.
  * The lambda form evaluates on the interpreted higher-order-
  * function path and allocates a sequence + closure frames per row;
  * this is one fused loop inside the surrounding WholeStageCodegen
  * span. Swapping it in cannot change a hash-compared result.
  *
  * SURVEY.md §2.1 custom-operator ladder, rung (b) — same justification
  * as [[CosineSimilarity]].
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"word_shingles width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val sep = UTF8String.fromString(" ")

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val count = math.max(0, arr.numElements() - n + 1)
    val out = new Array[Any](count)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < count) {
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      val cnt = ctx.freshName("cnt")
      val parts = ctx.freshName("parts")
      val res = ctx.freshName("res")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val u = classOf[UTF8String].getName
      s"""
         |final int $cnt = java.lang.Math.max(0, $c.numElements() - ${n - 1});
         |final $u[] $parts = new $u[$n];
         |final $u[] $res = new $u[$cnt];
         |for (int $i = 0; $i < $cnt; $i++) {
         |  for (int $j = 0; $j < $n; $j++) {
         |    $parts[$j] = $c.isNullAt($i + $j) ? null : $c.getUTF8String($i + $j);
         |  }
         |  $res[$i] = $u.concatWs($sepRef, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
