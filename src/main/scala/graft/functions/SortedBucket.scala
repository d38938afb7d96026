package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Quantile-rank bucketing: map a numeric value to the index of its
  * bucket among `boundaries` (sorted, deduplicated upper bounds) —
  * `bucket(v) = #{ b ∈ boundaries : b ≤ v }`, i.e. the binary-search
  * insertion point. With boundaries sampled at the p/B quantiles this
  * turns an ARBITRARY-range key into a dense rank in [0, B], exactly
  * what [[graft.operators.ZOrder.mortonCode]] needs: its interleave
  * wraps raw values mod 2^bits, so un-bucketed wide keys (timestamps,
  * ids) silently destroy clustering. O(log B) per row via
  * `Arrays.binarySearch` inside whole-stage codegen — a CASE-WHEN chain
  * over B buckets would be O(B) and blow the codegen method limit at
  * useful B.
  *
  * NaN/NULL inputs land in bucket 0, matching mortonCode's documented
  * NULL→coordinate-0 placement (a total order needs somewhere to put
  * them; Double NaN compares greater than everything in binarySearch,
  * so it is pinned to 0 explicitly for a stable, documented placement).
  */
case class SortedBucket(child: Expression, boundaries: Array[Double]) extends UnaryExpression {

  require(
    boundaries.nonEmpty && boundaries.sliding(2).forall(w => w.length < 2 || w(0) < w(1)),
    "boundaries must be non-empty, sorted, and distinct",
  )

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"sorted_bucket expects double, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_bucket"

  private def bucketOf(v: Double): Long = {
    if (java.lang.Double.isNaN(v)) return 0L
    val r = java.util.Arrays.binarySearch(boundaries, v)
    if (r >= 0) (r + 1).toLong else (-r - 1).toLong
  }

  override protected def nullSafeEval(input: Any): Any = bucketOf(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bounds = ctx.addReferenceObj("sortedBucketBounds", boundaries, "double[]")
    val r = ctx.freshName("bsRes")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if (java.lang.Double.isNaN($c)) {
         |  ${ev.value} = 0L;
         |} else {
         |  int $r = java.util.Arrays.binarySearch($bounds, $c);
         |  ${ev.value} = $r >= 0 ? (long) ($r + 1) : (long) (-$r - 1);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
