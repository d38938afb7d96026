package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Element-wise mean of a fixed-width double-array column — ONE
  * aggregate expression where the Lloyd recenter steps previously
  * carried N independent `avg(v[i])` columns (16 per PQ block, 64 for
  * the IVF coarse codebook), each with its own null-checked (sum, count)
  * buffer slot, projection column and codegen slice.
  *
  * The VALUES are identical to the column form: per position i the
  * buffer holds the same double sum (accumulated in the same input-row
  * order within each partial buffer — all aggregate columns of one
  * groupBy update together — and merged by addition in the same
  * partial-merge sequence) and the same long count, and `eval` performs
  * the same `sum / count` IEEE division, null when the count is zero —
  * exactly `avg(v[i])`'s Divide(sum, count) with its empty-group null.
  * Per-position null parity matches `avg(GetArrayItem(v, i))` on the
  * inputs the recenter kernels produce (always-full-width slices of
  * fixed-dim vectors): a null element is skipped and a null array row is
  * skipped everywhere. An array SHORTER than `n` contributes nothing at
  * the missing positions (element_at leniency — NOT the ANSI
  * GetArrayItem, which throws out-of-range; the query paths can never
  * hit that difference). What changes is the PLAN: one
  * aggregate expression instead of N + an N-column reassembly
  * projection, which matters because the recenter subtree is planned
  * into every Lloyd pass of every PQ/IVF query (2 passes × 4 blocks for
  * PQ; the ann_ivf_trained coarse codebook re-plans the 64-column
  * aggregate twice) and Catalyst re-optimizes the whole tree at every
  * adaptive stage boundary — the SimHashAgg precedent (r21).
  *
  * Partial aggregation still applies (update map-side, merge
  * post-shuffle): the shuffled state is n doubles + n longs per group
  * per partition — the same bytes the N (sum, count) pairs occupied.
  * AvgArraySpec pins the aggregate against the N-column formulation
  * bit-for-bit, including null elements, short arrays, null rows and
  * partial-split invariance.
  *
  * SURVEY.md §2.1 custom-operator ladder, rung (b) — same justification
  * as [[SimHashAgg]].
  */
case class AvgArray(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[AvgArray.Buf] {

  require(n > 0, "avg_array width must be positive")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"avg_array expects array<double>, got $t")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def prettyName: String = "avg_array"

  override def createAggregationBuffer(): AvgArray.Buf =
    AvgArray.Buf(new Array[Double](n), new Array[Long](n))

  override def update(buf: AvgArray.Buf, row: InternalRow): AvgArray.Buf = {
    val v = child.eval(row)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // positions past the array's end stay untouched — GetArrayItem
      // out-of-range is null and avg skips null inputs
      val m = math.min(n, arr.numElements())
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) {
          buf.sums(i) += arr.getDouble(i)
          buf.counts(i) += 1L
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: AvgArray.Buf, b: AvgArray.Buf): AvgArray.Buf = {
    var i = 0
    while (i < n) {
      a.sums(i) += b.sums(i)
      a.counts(i) += b.counts(i)
      i += 1
    }
    a
  }

  override def eval(buf: AvgArray.Buf): Any = {
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      // Long promotes to Double exactly like Average's Divide(sum,
      // cast(count as double)); count 0 -> null, the empty-input avg
      out(i) = if (buf.counts(i) == 0L) null else buf.sums(i) / buf.counts(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: AvgArray.Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(n * 16)
    bb.asDoubleBuffer().put(buf.sums)
    bb.position(n * 8)
    bb.asLongBuffer().put(buf.counts)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): AvgArray.Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val sums = new Array[Double](n)
    bb.asDoubleBuffer().get(sums)
    bb.position(n * 8)
    val counts = new Array[Long](n)
    bb.asLongBuffer().get(counts)
    AvgArray.Buf(sums, counts)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): AvgArray =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): AvgArray =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): AvgArray =
    copy(child = newChildren(0))
}

object AvgArray {
  /** Mutable aggregation state: per-position running double sums and
    * non-null input counts.
    */
  case class Buf(sums: Array[Double], counts: Array[Long])
}
