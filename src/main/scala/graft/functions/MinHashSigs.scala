package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature over a doc's DISTINCT-shingle array: for each
  * affine permutation i, `min over shingles of (a_i·h + b_i) mod 2³²`
  * with `h` = the first 8 hex chars of md5(shingle) as an unsigned
  * 32-bit value — exactly the aggregate-column kernel of
  * `DedupQueries.minhashBands`, evaluated as a PROJECTION over the
  * already-aggregated set (r21 optimization for the verify/containment/
  * cross queries, which materialize the full shingle sets anyway: min
  * is multiset-invariant, so the signature of the distinct set equals
  * the signature of the raw shingle stream, and deriving it
  * post-aggregation removes one whole corpus scan+explode AND the
  * separate 16-longs-per-doc exchange the bands pipeline cost — the
  * queries' one remaining corpus exchange is the collect_set they
  * needed regardless).
  *
  * Arithmetic parity with the column form: md5 over the shingle's UTF-8
  * bytes (the digest's first 4 bytes ARE its first 8 hex chars);
  * `h < 2³²` and `a < 2³¹` keep `a·h + b < 2⁶³`, so plain long
  * arithmetic is overflow-free and the mod stays positive — the same
  * no-overflow argument the file-header note pins for the SQL form.
  * Null elements contribute nothing (min-over-null-terms parity); an
  * input with no non-null element returns NULL (min of an empty set is
  * null in both engines). MinHashSigsSpec pins the expression against
  * the aggregate-column kernel band-for-band on a corpus with forced
  * duplicate shingles.
  *
  * The permutation tables arrive as constructor arrays (driver-computed
  * constants), so construction goes through [[org.apache.spark.sql.graft.ColumnBridge]]
  * rather than the SQL registry — the [[SortedBucket]] precedent.
  *
  * CONSTRAINT (advice r21): the Array fields give this case class
  * reference-based equals/hashCode, so two separately constructed
  * instances are never canonically equal — construct it ONCE per query
  * (as setsWithBands does) or subexpression elimination / exchange reuse
  * across the copies silently stops firing.
  */
case class MinHashSigs(child: Expression, as: Array[Long], bs: Array[Long]) extends UnaryExpression {

  require(as.length == bs.length && as.nonEmpty, "minhash_sigs needs matching non-empty perm tables")
  // the overflow-freedom argument below (a·h + b < 2⁶³ for h < 2³²)
  // holds only for a < 2³¹ and b < 2³²; enforce it so a future caller
  // passing larger constants fails loudly instead of silently wrapping
  // to wrong signatures (advice r21)
  require(
    as.forall(a => 0 <= a && a < (1L << 31)) && bs.forall(b => 0 <= b && b < (1L << 32)),
    "minhash_sigs perm tables out of range: need 0 <= a < 2^31 and 0 <= b < 2^32",
  )

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sigs expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(v: Any): Any =
    MinHashSigs.compute(v.asInstanceOf[ArrayData], as, bs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val asRef = ctx.addReferenceObj("as", as, "long[]")
      val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
      s"""
         |${ev.value} = graft.functions.MinHashSigs.compute($c, $asRef, $bsRef);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigs {

  /** Shared by the interpreted and codegen paths. Returns null when no
    * non-null element contributed (empty-set min parity).
    */
  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long]): GenericArrayData = {
    val k = as.length
    val n = arr.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    // one digest instance per call (per input ROW), reset per element —
    // identical output to a fresh instance, without the per-element
    // getInstance the built-in md5 expression pays
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        md.reset()
        val dig = md.digest(arr.getUTF8String(i).getBytes)
        // first 4 digest bytes == first 8 hex chars, as unsigned 32-bit
        val h = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
          ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % 4294967296L
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (any) new GenericArrayData(mins) else null
  }
}
