package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for duplicate-span excision — one
  * imperative pass per document instead of the per-char
  * posexplode + unbounded-preceding window it replaces.
  *
  * Input: the raw text plus an ARRAY<STRUCT<span_start, span_end>> of
  * duplicated spans in NORMALIZED coordinates (1-based position among
  * the `[a-z0-9]` chars, the coordinate system of the winnowing
  * fingerprints). A raw char is cut when it IS a kept (`[a-z0-9]`
  * after lowercasing) char whose normalized index n falls in
  * `[start, end]`, or a separator strictly interior to a span
  * (`n ∈ [start, end-1]` for non-kept chars — punctuation between two
  * excised chars goes with them, the separators at the span's outer
  * boundary stay).
  *
  * Semantically identical to the exploded-window form (same running
  * kept-count, same cut predicate, same order) but O(len) per row with
  * per-doc cost bounded by the doc itself: a tens-of-MB dirty document
  * no longer serializes through a single partition at
  * one-row-per-char — it costs one local loop on whatever partition it
  * already sits on, and whole-stage codegen is preserved (the
  * generated code calls the static helper below).
  */
case class ExciseSpans(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
          if s.length == 2 && s.forall(_.dataType == LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_excise_spans requires (STRING, ARRAY<STRUCT<BIGINT,BIGINT>>), " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_excise_spans"

  override protected def nullSafeEval(t: Any, sp: Any): Any =
    ExciseSpans.excise(t.asInstanceOf[UTF8String], sp.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, sp) =>
      s"${ev.value} = graft.functions.ExciseSpans.excise($t, $sp);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ExciseSpans =
    copy(left = newLeft, right = newRight)
}

object ExciseSpans {
  /** The per-document cut loop (static forwarder makes this callable
    * from generated code). Iterates code points left to right,
    * maintaining the running kept-char count n; spans are scanned
    * per char (per-doc span counts are small by construction — the
    * island merge in dupSpans coalesces nearby hits). */
  def excise(text: UTF8String, spans: ArrayData): UTF8String = {
    val s = text.toString
    val nSpans = spans.numElements()
    val starts = new Array[Long](nSpans)
    val ends = new Array[Long](nSpans)
    var j = 0
    while (j < nSpans) {
      val st = spans.getStruct(j, 2)
      starts(j) = st.getLong(0)
      ends(j) = st.getLong(1)
      j += 1
    }
    val sb = new java.lang.StringBuilder(s.length)
    var nKept = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val lc = Character.toLowerCase(cp)
      val kept = (lc >= 'a' && lc <= 'z') || (lc >= '0' && lc <= '9')
      if (kept) nKept += 1
      var cut = false
      var k = 0
      while (!cut && k < nSpans) {
        val hi = if (kept) ends(k) else ends(k) - 1
        cut = nKept >= starts(k) && nKept <= hi
        k += 1
      }
      if (!cut) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}
