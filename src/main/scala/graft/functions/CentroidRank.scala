package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Compiled nearest-centroid / centroid-ranking kernels for the vector
  * family — the [[CosineSimilarity]] escape hatch applied one level up.
  *
  * The optimization these serve (r21): every Lloyd/IVF assignment used
  * to be `crossJoin(broadcast(centroids))` + a per-vector row_number
  * window — an N×K row fanout and a full corpus exchange+sort per pass.
  * Pivoting the (broadcast-sized) codebook into ONE array column turns
  * the assignment into a projection: no fanout, no exchange — the right
  * shape at any scale. But the projection's higher-order-function form
  * (`array_sort(transform(cbs, …aggregate(zip_with(…))))`) evaluates on
  * Catalyst's interpreted lambda path at ~100× the cost of the codegen'd
  * arithmetic it replaced (measured: ~1.5 s single-stage passes over a
  * 2 000×16×64-dim fixture). These expressions are that projection as a
  * fused, compiled loop.
  *
  * Value contract (what makes swapping them in hash-safe):
  *   - per-centroid scores are the SAME sequential left folds as the
  *     HOF/oracle forms: d2 = Σ (x−y)² and cosine = dot/(√nx·√ny),
  *     accumulated in index order from 0.0 — bit-exact with
  *     `aggregate(zip_with(…))` and DuckDB's `list_reduce`;
  *   - ordering/tiebreak is exactly the windows' ORDER BY: (d2, cid)
  *     ascending resp. (−cos, cid) ascending, with ±0.0 treated equal
  *     (primitive comparison), matching Spark SQL struct ordering on
  *     the no-NaN inputs these queries feed (no zero-norm vectors in
  *     any fixture).
  *
  * CodegenFallback (compiled `eval`, no `doGenCode`): the loop body is
  * plain JVM double arithmetic — the interpreted-lambda overhead, not
  * whole-stage fusion, was the cost being removed. CentroidRankSpec
  * pins both expressions against their HOF formulations element-for-
  * element on random data.
  */
private[graft] object CentroidRank {
  val cbsType: DataType = ArrayType(
    StructType(Seq(StructField("cid", LongType), StructField("cv", ArrayType(DoubleType)))),
  )

  /** cbs validity: array<struct<cid long, cv array<double>>> (field
    * names free — position is the contract, matching
    * struct(cid, cv) built by the query-side pivot).
    */
  def cbsOk(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(Array(f0, f1)), _) =>
      f0.dataType == LongType && (f1.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
    case _ => false
  }
}

/** `nearest_centroid_l2(sv, cbs)` → struct(d2 double, cid bigint): the
  * (d2, cid)-minimum centroid of the pivoted codebook `cbs` by squared
  * L2 — the rn=1 slice of `ORDER BY d2, cid` without rows, exchanges or
  * interpreted lambdas. NULL on null/ragged input (the fold forms would
  * null out the same rows).
  */
case class NearestCentroidL2(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), r) if CentroidRank.cbsOk(r) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid_l2 expects (array<double>, array<struct<cid bigint, cv array<double>>>), got ($l, $r)")
    }

  override def dataType: DataType =
    StructType(Seq(StructField("d2", DoubleType), StructField("cid", LongType)))
  override def prettyName: String = "nearest_centroid_l2"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sv = a.asInstanceOf[ArrayData].toDoubleArray()
    val cbs = b.asInstanceOf[ArrayData]
    val k = cbs.numElements()
    var bestD2 = Double.NaN
    var bestCid = 0L
    var found = false
    var c = 0
    while (c < k) {
      if (cbs.isNullAt(c)) return null
      val row = cbs.getStruct(c, 2)
      val cid = row.getLong(0)
      val cv = row.getArray(1)
      if (cv.numElements() != sv.length) return null
      var d2 = 0.0
      var i = 0
      while (i < sv.length) {
        val diff = sv(i) - cv.getDouble(i)
        d2 += diff * diff
        i += 1
      }
      // strict (d2, cid) improvement: ties keep the lower cid — the
      // exact ORDER BY d2, cid tiebreak of the window form
      if (!found || d2 < bestD2 || (d2 == bestD2 && cid < bestCid)) {
        found = true; bestD2 = d2; bestCid = cid
      }
      c += 1
    }
    if (!found) null else InternalRow(bestD2, bestCid)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `centroid_rank_cos(v, cbs)` → array<struct<na double, cid bigint>>
  * sorted ascending by (na = −cosine(v, cv), cid) — all K centroids of
  * the pivoted codebook best-first under `ORDER BY acos DESC, cid`.
  * element_at(…, 1) is the assignment; slice(…, 1, nprobe) is the probe
  * list. NULL on null/ragged input.
  */
case class CentroidRankCos(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), r) if CentroidRank.cbsOk(r) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"centroid_rank_cos expects (array<double>, array<struct<cid bigint, cv array<double>>>), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("na", DoubleType), StructField("cid", LongType))),
  )
  override def prettyName: String = "centroid_rank_cos"
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData].toDoubleArray()
    val cbs = b.asInstanceOf[ArrayData]
    val k = cbs.numElements()
    val na = new Array[Double](k)
    val cid = new Array[Long](k)
    var c = 0
    while (c < k) {
      if (cbs.isNullAt(c)) return null
      val row = cbs.getStruct(c, 2)
      val cv = row.getArray(1)
      if (cv.numElements() != v.length) return null
      // the CosineSimilarity fold, negated: same index-order accumulation
      var dot = 0.0; var nv = 0.0; var nc = 0.0
      var i = 0
      while (i < v.length) {
        val xi = v(i)
        val yi = cv.getDouble(i)
        dot += xi * yi; nv += xi * xi; nc += yi * yi
        i += 1
      }
      na(c) = -(dot / (math.sqrt(nv) * math.sqrt(nc)))
      cid(c) = row.getLong(0)
      c += 1
    }
    // insertion sort by (na, cid) with primitive comparisons (±0.0
    // equal, no NaN by the no-zero-norm precondition) — K is the
    // codebook size, always small
    var x = 1
    while (x < k) {
      val nx = na(x); val cx = cid(x)
      var y = x - 1
      while (y >= 0 && (na(y) > nx || (na(y) == nx && cid(y) > cx))) {
        na(y + 1) = na(y); cid(y + 1) = cid(y); y -= 1
      }
      na(y + 1) = nx; cid(y + 1) = cx
      x += 1
    }
    new GenericArrayData((0 until k).map(j => InternalRow(na(j), cid(j))))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
