package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native cosine similarity over two double-array columns, with
  * whole-stage codegen.
  *
  * The composable form (`aggregate(zip_with(a,b,(p,q)->p*q),0,+)` over
  * three folds — SimilarityQueries.cosine) materializes an intermediate
  * array per row and evaluates three lambda chains; this expression is
  * one fused loop, and `doGenCode` keeps it inside the surrounding
  * WholeStageCodegen span. Accumulation order (sequential, from 0.0)
  * and the final `dot/(sqrt(nn)*sqrt(mm))` shape are IDENTICAL to the
  * fold form, so results are bit-exact with the DuckDB oracle's
  * `list_reduce` formulation — swapping implementations cannot change a
  * hash-compared result.
  *
  * This is the §7.5 escape hatch used as designed: a scalar the built-ins
  * *can* express but where the hot path earns a native Expression
  * (preference (b) of SURVEY.md §2.1's custom-operator ladder).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes would be the idiomatic route, but AbstractDataType
  // is private[sql]; the registration builder inserts Casts instead, and
  // this check guards direct construction.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"cosine_similarity expects (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  // can yield NULL even for non-null inputs (ragged lengths, null
  // elements) — without this, codegen would assign into a constant
  override def nullable: Boolean = true

  // NULL semantics match the fold form (and DuckDB's list_reduce): a
  // length mismatch (zip_with would null-pad) or any null element makes
  // the whole result NULL — required for the bit-exact-oracle claim.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      final double $xi = $a.getDouble($i);
         |      final double $yi = $b.getDouble($i);
         |      $dot += $xi * $yi;
         |      $nx += $xi * $xi;
         |      $ny += $yi * $yi;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
