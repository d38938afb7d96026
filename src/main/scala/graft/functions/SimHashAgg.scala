package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** The 64-bit SimHash vote-and-assemble aggregate (r21 optimization for
  * the `dedup_simhash*` kernels): per input row, bit j of the two
  * 32-bit hash halves contributes a ±1 vote; the final fingerprint sets
  * bit j iff its vote sum is positive.
  *
  * Replaces a 64-aggregate-column `groupBy` (one `sum(2*((h>>j)&1)-1)`
  * per bit) plus a 64-way `when(...).otherwise(0)` OR-reduce. The
  * VALUES are identical — the buffer holds the same 64 exact integer
  * vote sums, merged by addition (associative/commutative, any
  * partial-aggregation split yields the same totals), and `eval`
  * applies the same `> 0` threshold and the same disjoint single-bit
  * masks (bit 63 via Long.MinValue-equivalent `1L << 63`, OR-assembled,
  * overflow-free). What changes is the PLAN: one aggregate expression
  * instead of 64 + a 200-node projection, which matters because the
  * fingerprint subtree appears three times in `dedup_simhash_pairs`
  * (both self-join sides + the bucket cap) and Catalyst re-optimizes
  * the whole tree at every adaptive stage boundary — the measured cost
  * was a driver-side gap as large as the query's entire execution.
  * Null semantics match the column form PER HALF: each vote was
  * `sum(2*((h>>j)&1)-1)` and sum skips null terms, so a null h_lo
  * suppresses only the low 32 votes of that row (and vice versa); an
  * all-null group fingerprints to 0L (every `when(v > 0, …)` fell to
  * `otherwise(0)`).
  *
  * Partial aggregation still applies (update map-side, merge post-
  * shuffle): the shuffled state is one 512-byte vote array per doc per
  * partition — the same bytes the 64 long columns occupied.
  * SimHashAggSpec pins the aggregate against the 64-column formulation
  * bit-for-bit, including vote ties, null halves and all-null groups.
  *
  * SURVEY.md §2.1 custom-operator ladder, rung (b) — same justification
  * as [[CosineSimilarity]]/[[WordShingles]].
  */
case class SimHashAgg(
    hLo: Expression,
    hHi: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
) extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(hLo, hHi)

  override def checkInputDataTypes(): TypeCheckResult =
    if (hLo.dataType == LongType && hHi.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash_agg expects (bigint, bigint), got (${hLo.dataType}, ${hHi.dataType})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    // PER-HALF null handling, exactly like the column form: each vote
    // was `sum(2*((h>>j)&1)-1)`, and sum skips a null TERM — so a row
    // with h_lo null still votes its h_hi bits and vice versa (the
    // query's halves share md5(w) nullity, but the spec pins the
    // column-form parity on mixed-null inputs too).
    val loV = hLo.eval(row)
    if (loV != null) {
      val lo = loV.asInstanceOf[Long]
      var j = 0
      while (j < 32) {
        buf(j) += (((lo >> j) & 1L) << 1) - 1L
        j += 1
      }
    }
    val hiV = hHi.eval(row)
    if (hiV != null) {
      val hi = hiV.asInstanceOf[Long]
      var j = 0
      while (j < 32) {
        buf(j + 32) += (((hi >> j) & 1L) << 1) - 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    var r = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0L) r |= 1L << j
      j += 1
    }
    r
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(64 * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](64)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(hLo = newChildren(0), hHi = newChildren(1))
}
