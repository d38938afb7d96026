package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Overlapping character bigrams of a string, ENCODED as longs — the
  * hot inner loop of the Cavnar–Trenkle language-ID query
  * (`text_langid_ngram`).
  *
  * Replaces the regex spelling
  * `regexp_extract_all(text, '(?=([\s\S][\s\S]))', 1)`, which pays a
  * java.util.regex zero-width find per character position and allocates
  * a 2-char UTF8String per bigram, with one code-point walk per row.
  *
  * Encoding: bigram (cp1, cp2) -> (cp1 << 21) | cp2 (code points are
  * <= 0x10FFFF = 21 bits, so the code is a positive long and the map is
  * INJECTIVE). The encoding is also ORDER-PRESERVING with respect to
  * the UTF8String binary order of the 2-char bigram strings: unsigned
  * UTF-8 byte order equals code-point order, and since every bigram is
  * exactly two code points, string order is pair-lexicographic order —
  * exactly the order of the packed longs. Downstream the query only
  * ever (a) groups/joins on bigram EQUALITY and (b) breaks profile ties
  * by bigram ORDER, so swapping the strings for their codes cannot
  * change any computed result — and the shuffled key shrinks from a
  * string to 8 bytes (guide §2.3 "narrower types"). Positions are code
  * points, matching both the oracle's `substr(text, i, 2)` and the
  * Java-9+ regex behaviour the spelling above relies on (a zero-width
  * match advances by one code point). CharBigramCodesSpec pins the
  * kernel against the regex form (including the encoding's order
  * preservation) on ASCII, newline, non-ASCII-BMP and supplementary
  * inputs.
  *
  * SURVEY.md §2.1 custom-operator ladder, rung (b) — same justification
  * as [[WordShingles]].
  */
case class CharBigramCodes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"char_bigram_codes expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_bigram_codes"

  override protected def nullSafeEval(v: Any): Any =
    CharBigramCodes.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharBigramCodes.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharBigramCodes {

  /** One pass over the string's code points; shared by the interpreted
    * and codegen paths so both are byte-for-byte the same computation.
    */
  def compute(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val n = str.length // UTF-16 units; code-point count is <= n
    if (n < 2) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - 1) // upper bound; trimmed below
    var cnt = 0
    var i = 0
    var prev = -1L
    while (i < n) {
      val cp = str.codePointAt(i)
      if (prev >= 0) {
        out(cnt) = (prev << 21) | cp
        cnt += 1
      }
      prev = cp.toLong
      i += Character.charCount(cp)
    }
    if (cnt == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }
}
