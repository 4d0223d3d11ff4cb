package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the random-hyperplane LSH bucket id
  * over an ARRAY<DOUBLE> embedding — the candidate-generation inner
  * loop of `LlmOps.lshBucket` (embedding near-dup, LSH top-k).
  *
  * Bit-identical to the composed higher-order form it replaces
  * (`LlmOps.lshBucketComposed`, which stays as the DuckDB-replayable
  * twin): bit h of the code = [Σ_i e(i)·w(h·dims + i) > 0] with the
  * SAME deterministic hyperplane weights w(j) = (1103515245·j + 12345)
  * mod 2001 − 1000 and the SAME left-to-right IEEE summation from 0.0,
  * so every bucket id — and therefore every oracle-replayed pair set —
  * is unchanged. Null semantics mirror the composed form: a null array
  * or any null element in the first `dims` slots nulls every per-plane
  * sum, and the composed `when(d > 0, bit).otherwise(0)` folds each
  * null to 0 — so the code is 0L, never null (`nullable = false`).
  * Non-finite sums follow Spark SQL's comparison semantics (which
  * DuckDB's float comparisons share): NaN orders GREATER than every
  * double, so a NaN plane-sum sets its bit exactly as the composed
  * `when(d > 0, …)` does — a NaN-bearing embedding (which passes the
  * upstream `nrm > 0` filter under those same semantics) gets the SAME
  * bucket id on all three paths (native, composed, oracle);
  * spec-pinned. ONE deliberate divergence (spec-pinned): an array
  * SHORTER than `dims` folds to 0L here, where the composed form
  * hard-errors under ANSI array indexing — a malformed embedding must
  * not kill a 100 TB job, and a 0L code only routes the row to bucket
  * 0, where the downstream exact verify (cosine / popcount) keeps the
  * output set unaffected.
  *
  * Why it exists: the composed form evaluates planes·dims interpreted
  * lambda calls per vector (a `transform` + `aggregate` pair per
  * plane — up to 60·64 ≈ 4k closure invocations and ~2 array
  * allocations per plane per row). At sf10's 200k-vector corpus the
  * hyperplane pass is the dominant cold cost of
  * `embedNearDupPairs`'s candidate generation; this expression runs
  * the whole code as one primitive loop over the array buffer with the
  * weight table shared per (planes, dims), inside WholeStageCodegen,
  * allocation-free.
  */
case class LshCode(child: Expression, planes: Int, dims: Int)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 62, s"planes out of range: $planes")
  require(dims >= 1, s"dims out of range: $dims")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_code requires ARRAY<DOUBLE> input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lsh_code"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshCode.code(v.asInstanceOf[ArrayData], planes, dims)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val out = ctx.freshName("lshCode")
    ev.copy(
      code = c.code + code"""
        |final long $out = ${c.isNull} ? 0L :
        |  graft.functions.LshCode.code(${c.value}, $planes, $dims);
        |""".stripMargin,
      isNull = FalseLiteral,
      value = JavaCode.variable(out, LongType))
  }

  override protected def withNewChildInternal(newChild: Expression): LshCode =
    copy(child = newChild)
}

object LshCode {

  /** Deterministic hyperplane weight table for (planes, dims), cached
    * per geometry (a handful of instances per session; each ≤ 62·64
    * doubles). w(j) = (1103515245·j + 12345) mod 2001 − 1000 — the
    * exact integer law `LlmOps.hp` renders in SQL. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()
  def weights(planes: Int, dims: Int): Array[Double] =
    cache.computeIfAbsent((planes, dims), { key =>
      val (p, d) = key
      val w = new Array[Double](p * d)
      var j = 0
      while (j < w.length) {
        w(j) = ((1103515245L * j + 12345L) % 2001L - 1000L).toDouble
        j += 1
      }
      w
    })

  /** One primitive pass; called from both the interpreted path and
    * generated code. Mirrors the composed form's null folding: short
    * or null-holed arrays code to 0L. */
  def code(a: ArrayData, planes: Int, dims: Int): Long = {
    if (a.numElements() < dims) return 0L
    var i = 0
    while (i < dims) {
      if (a.isNullAt(i)) return 0L
      i += 1
    }
    val w = weights(planes, dims)
    var out = 0L
    var h = 0
    while (h < planes) {
      var acc = 0.0
      val base = h * dims
      var k = 0
      while (k < dims) {
        acc += a.getDouble(k) * w(base + k)
        k += 1
      }
      // Spark SQL (and DuckDB) order NaN greater than every double, so
      // the composed when(d > 0, …) sets the bit for a NaN sum; Java's
      // acc > 0 alone would clear it — match the SQL semantics so the
      // bit-identity contract holds for non-finite inputs too.
      if (acc > 0 || java.lang.Double.isNaN(acc)) out |= 1L << h
      h += 1
    }
    out
  }
}
