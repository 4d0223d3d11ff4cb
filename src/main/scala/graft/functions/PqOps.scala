package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native PQ encoder: for each of `m` subspaces of a flat
  * ARRAY<DOUBLE> vector, the 1-based rank of the argmin-L2 sub-centroid
  * in the flattened codebook (`cbFlat` = the ncents sorted centroid
  * vectors concatenated, so centroid c's subspace j lives at
  * `c·(m·sub) + j·sub`), plus the reconstruction self-dot.
  *
  * Bit-identical to the higher-order-function form it replaces (the
  * nested `aggregate(cb, struct(...))` argmin in LlmOps.pqEncoded):
  * every inner L2/self-dot sum folds from 0.0 in ascending dimension
  * order and is added to the outer accumulator as ONE closed double
  * (never flattened into a single running sum — (a+b)+c ≠ a+(b+c)),
  * and the argmin is the same strict-improvement scan (earliest rank
  * wins exact ties). The DuckDB oracle rendering is untouched.
  *
  * Why native: the HOF form walks an interpreted expression tree with
  * a struct accumulator allocation per fold step — measured ~3000 s of
  * single-task CPU for one 250k-vector partition at the sf10 probe
  * (the exact "non-codegen expression in the hot path" scale hazard).
  * This eval is one tight primitive loop per ROW (~m·ncents·sub
  * multiply-adds); per-row cost makes CodegenFallback acceptable —
  * the per-PAIR hot path is [[PqAdc]], which IS codegen'd.
  *
  * Null semantics: null input array, null element, a codebook not
  * divisible into m·sub-length centroids, or a vector whose length is
  * not exactly m·sub → null. The length check is strict both ways: a
  * short vector can't be encoded, and an oversized one would silently
  * encode only its prefix — a dims-parameter mismatch should fail
  * loudly (null → filtered empty) rather than produce plausible codes
  * from a truncated vector. */
case class PqEncode(left: Expression, right: Expression, m: Int, sub: Int)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode requires two ARRAY<DOUBLE> inputs, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("code", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("anrm", DoubleType, nullable = false),
    StructField("err2", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val dims = m * sub
    val nc = cb.numElements() / dims
    if (nc == 0 || cb.numElements() != nc * dims ||
      e.numElements() != dims) return null
    var i = 0
    while (i < e.numElements()) {
      if (e.isNullAt(i)) return null; i += 1
    }
    i = 0
    while (i < cb.numElements()) {
      if (cb.isNullAt(i)) return null; i += 1
    }
    val code = new Array[Int](m)
    // quantization error rides along for free: each subspace's argmin
    // distance is a closed double, summed j-ascending
    var err2 = 0.0
    var j = 0
    while (j < m) {
      var bestD = Double.MaxValue
      var best = 0
      var c = 0
      while (c < nc) {
        // this subspace's L2² folds from 0.0 on its own, exactly like
        // the HOF subL2 — one closed double per centroid
        var d = 0.0
        var k = 0
        while (k < sub) {
          val diff = e.getDouble(j * sub + k) -
            cb.getDouble(c * dims + j * sub + k)
          d += diff * diff
          k += 1
        }
        if (d < bestD) { bestD = d; best = c + 1 }
        c += 1
      }
      code(j) = best
      err2 += bestD
      j += 1
    }
    var anrm = 0.0
    j = 0
    while (j < m) {
      val c = code(j) - 1
      var sd = 0.0
      var k = 0
      while (k < sub) {
        val x = cb.getDouble(c * dims + j * sub + k)
        sd += x * x
        k += 1
      }
      anrm += sd // outer fold adds each subspace's CLOSED sum, j asc
      j += 1
    }
    InternalRow(new GenericArrayData(code), anrm, err2)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** Native RESIDUAL PQ encoder — the classic IVF-PQ refinement: the
  * quantized object is `r = e − base` (the vector minus its coarse
  * cell centroid; residuals are much smaller than raw vectors, so the
  * same code budget quantizes them finer), codes are argmin-L2 over
  * RESIDUAL sub-codebooks, and the emitted norm is the FULL
  * reconstruction `|base + r̂|²` (grouped subspace folds, j ascending,
  * each subspace's sum closed before the outer add — the [[PqEncode]]
  * float-ordering discipline). Every elementary step is one IEEE op
  * (`r_i = e_i − base_i` first, then `r_i − c_i`), so the DuckDB
  * oracle replays `((e[i] − base[i]) − ce[i])` verbatim.
  * `err2` is the residual quantization error `|r − r̂|²` — identically
  * the FULL reconstruction error `|e − (base + r̂)|²`, since
  * `e − base − r̂ = r − r̂` — emitted like [[PqEncode]]'s so the two
  * layouts are directly comparable on the same corpus.
  * Null/shape semantics as [[PqEncode]] (strict `m·sub` vector
  * length), plus: base must match the vector's length. */
case class PqEncodeResidual(
    first: Expression, second: Expression, third: Expression,
    m: Int, sub: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
          ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_encode_residual requires three ARRAY<DOUBLE> inputs, " +
          s"got ${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("code", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("anrm", DoubleType, nullable = false),
    StructField("err2", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode_residual"

  override protected def nullSafeEval(a: Any, b: Any, cth: Any): Any = {
    val e = a.asInstanceOf[ArrayData]
    val base = b.asInstanceOf[ArrayData]
    val cb = cth.asInstanceOf[ArrayData]
    val dims = m * sub
    val nc = cb.numElements() / dims
    if (nc == 0 || cb.numElements() != nc * dims ||
      e.numElements() != dims || base.numElements() != e.numElements())
      return null
    var i = 0
    while (i < e.numElements()) {
      if (e.isNullAt(i) || base.isNullAt(i)) return null; i += 1
    }
    i = 0
    while (i < cb.numElements()) {
      if (cb.isNullAt(i)) return null; i += 1
    }
    val code = new Array[Int](m)
    var err2 = 0.0
    var j = 0
    while (j < m) {
      var bestD = Double.MaxValue
      var best = 0
      var c = 0
      while (c < nc) {
        var d = 0.0
        var k = 0
        while (k < sub) {
          val p = j * sub + k
          // r_i first (one IEEE sub), then the centroid diff — the
          // oracle's ((e[i] - base[i]) - ce[i])
          val diff = (e.getDouble(p) - base.getDouble(p)) -
            cb.getDouble(c * dims + p)
          d += diff * diff
          k += 1
        }
        if (d < bestD) { bestD = d; best = c + 1 }
        c += 1
      }
      code(j) = best
      err2 += bestD
      j += 1
    }
    var anrm = 0.0
    j = 0
    while (j < m) {
      val c = code(j) - 1
      var sd = 0.0
      var k = 0
      while (k < sub) {
        val p = j * sub + k
        val x = base.getDouble(p) + cb.getDouble(c * dims + p)
        sd += x * x
        k += 1
      }
      anrm += sd
      j += 1
    }
    InternalRow(new GenericArrayData(code), anrm, err2)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqEncodeResidual =
    copy(first = f, second = s, third = t)
}

/** Native ADC pair scorer: `Σ_j ptabFlat[j·ncents + code_j − 1]` with
  * the fold running j-ascending from 0.0 — bit-identical to the
  * `aggregate(sequence(0,m-1), ...)` table-lookup form it replaces,
  * but one codegen'd primitive loop per PAIR (the data-sized cost of
  * PQ retrieval: every probe × candidate evaluation lands here).
  * `ptabFlat` is the probe's flattened m×ncents dot table ([j][c] →
  * j·ncents + c, the order `flatten` produces). Null array, null
  * element, a table not divisible by the code length, or a code index
  * out of [1, ncents] → null. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_pq_adc requires ARRAY<DOUBLE>, ARRAY<INT> inputs, " +
          s"got ${l.catalogString} and ${r.catalogString}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val tab = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[ArrayData]
    val m = code.numElements()
    if (m == 0 || tab.numElements() % m != 0) return null
    val nc = tab.numElements() / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (code.isNullAt(j)) return null
      val c = code.getInt(j)
      if (c < 1 || c > nc) return null
      val p = j * nc + c - 1
      if (tab.isNullAt(p)) return null
      acc += tab.getDouble(p)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val nc = ctx.freshName("nc")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val p = ctx.freshName("p")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |final int $m = $b.numElements();
         |boolean $bad = ($m == 0 || $a.numElements() % $m != 0);
         |double $acc = 0.0;
         |if (!$bad) {
         |  final int $nc = $a.numElements() / $m;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($b.isNullAt($j)) { $bad = true; break; }
         |    final int $c = $b.getInt($j);
         |    if ($c < 1 || $c > $nc) { $bad = true; break; }
         |    final int $p = $j * $nc + $c - 1;
         |    if ($a.isNullAt($p)) { $bad = true; break; }
         |    $acc += $a.getDouble($p);
         |  }
         |}
         |${ev.isNull} = $bad;
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
