package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_gram_tf_pairs(ws, n)`: array<string> →
  * array<struct<term BIGINT, tf BIGINT>> — the DISTINCT n-word-shingle
  * hashes of one document with their within-document occurrence
  * counts, in first-occurrence order (deterministic).
  *
  * This is `explode(graft_gram_hashes(ws, n))` followed by a
  * `groupBy(doc, term).count()` — computed per row, because that
  * grouping never leaves the row. The r20 sf10 probe
  * (`bench_r20_tfidf_stages_sf10.json`) measured the relational
  * (doc, term) aggregation as the dominant half of the tf-idf weight
  * frame; the per-row form deletes that corpus-shingle-sized shuffle
  * outright (guide §2.4). Hash identity with `graft_gram_hashes` (and
  * so with the composed concat_ws+PolyHash form the DuckDB oracle
  * replays) is by construction: [[GramHashKernel.gramHashes]] IS the
  * hash pass, including its null-element slow path. */
case class GramTfPairs(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be positive: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_tf_pairs requires ARRAY<STRING> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", LongType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_gram_tf_pairs"

  override protected def nullSafeEval(input: Any): Any =
    GramTfPairs.tfPairs(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramTfPairs.tfPairs($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): GramTfPairs = copy(child = newChild)
}

object GramTfPairs {
  def tfPairs(arr: ArrayData, n: Int): ArrayData = {
    val hashes = GramHashKernel.gramHashes(arr, n)
    val m = hashes.numElements()
    if (m == 0) return new GenericArrayData(new Array[Any](0))
    // first-occurrence order keeps the output deterministic
    val counts = new java.util.LinkedHashMap[Long, Array[Long]]()
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      val cur = counts.get(h)
      if (cur == null) counts.put(h, Array(1L))
      else cur(0) += 1L
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = InternalRow(e.getKey, e.getValue()(0))
      k += 1
    }
    new GenericArrayData(out)
  }
}
