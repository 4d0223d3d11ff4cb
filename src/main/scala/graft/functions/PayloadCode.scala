package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression for the 60-bit perceptual payload
  * fingerprint (multimodal blockhash; see
  * `MultimodalOps.payloadFingerprint`, the oracle twin) — ONE pass
  * over the raw BinaryType bytes per row, zero shuffles, zero
  * allocations beyond two 60-long scratch arrays.
  *
  * Bit-identical to the hex-rendering form, which stays the
  * DuckDB-replayable verification path: bit b (b ∈ 0..59) is 1 iff
  * the mean byte value of stream block b — block of byte i = ⌊i/4⌋
  * mod 60, FIXED 4-byte cells — exceeds the whole payload's mean,
  * compared integer-exactly as blockSum·totalCount >
  * totalSum·blockCount with the products in 128 bits
  * (Math.multiplyHigh high word + unsigned low compare — the same
  * widths the hex form's decimal(38,0) and the oracle's HUGEINT
  * carry, so no engine diverges at any payload size a BIGINT length
  * can express).
  *
  * Why it exists: the hex form exists to be REPLAYABLE — it renders
  * the payload as a hex string (~4 bytes of string per payload byte),
  * posexplodes to byte granularity, and aggregates twice, because
  * every primitive replays verbatim in any SQL engine. That is the
  * right shape for the correctness gate and the wrong shape for 100 TB
  * of images: this expression is the production path — the scan IS
  * the fingerprint pass, it stays inside WholeStageCodegen, and
  * `payloadNearDupPairs` goes from "explode + 2 keyed aggs + window"
  * to "narrow projection" before its banded search.
  *
  * A zero-length payload fingerprints to 0L (no block exceeds an empty
  * mean — vacuously no bits); callers drop empties upstream exactly as
  * the hex form filters `length(payload) > 0` (a zero-byte file is
  * dedup'd by exact digest, not perceptually).
  */
case class PayloadCode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_payload_code requires BINARY input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_payload_code"

  override protected def nullSafeEval(input: Any): Any =
    PayloadCode.code(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PayloadCode.code($c)")

  override protected def withNewChildInternal(newChild: Expression): PayloadCode =
    copy(child = newChild)
}

object PayloadCode {

  /** a*b > c*d for non-negative longs, exact in 128 bits. */
  private def gtProd(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b)
    val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

  /** Single pass over the payload bytes; called from both the
    * interpreted path and generated code. */
  def code(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val bs = new Array[Long](60)
    val bc = new Array[Long](60)
    var ts = 0L
    var i = 0
    while (i < n) {
      val v = (bytes(i) & 0xff).toLong
      val b = (i >>> 2) % 60
      bs(b) += v
      bc(b) += 1L
      ts += v
      i += 1
    }
    val tc = n.toLong
    var pcode = 0L
    var b = 0
    while (b < 60) {
      if (bc(b) > 0L && gtProd(bs(b), tc, ts, bc(b))) pcode |= 1L << b
      b += 1
    }
    pcode
  }
}
