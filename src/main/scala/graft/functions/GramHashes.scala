package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native gram-hash kernels for the word-shingle operators: compute
  * [[PolyHash]] of every n-word shingle of a words array in ONE rolling
  * pass per document, instead of building each shingle STRING through
  * an interpreted `transform(sequence(...), i -> concat_ws(" ", ...))`
  * lambda and hashing the copies.
  *
  * The algebra that makes the rolling pass exact: PolyHash is the
  * polynomial fold `acc = (acc*31 + codePoint) mod p` (p = 1e9+7), so
  * for any strings a, b
  *
  *   PolyHash(a ∘ b) = (PolyHash(a) · 31^cp(b) + PolyHash(b)) mod p
  *
  * with cp(b) the CODE POINT count of b (the fold is per code point —
  * non-BMP safe). A shingle `w_i ∘ " " ∘ w_{i+1} ∘ " " ∘ ...` therefore
  * combines from per-word (hash, 31^cp) pairs in O(1) per shingle after
  * one O(chars) pass over the words — bit-identical to hashing the
  * `concat_ws(" ", ...)` string, which is what the DuckDB oracle
  * replays. Every product stays below p·2^30 < 2^60: plain long
  * arithmetic, no overflow.
  *
  * Inputs are `split(lower(text), ' ')` arrays, which never contain
  * null elements. For safety the kernels still reproduce `concat_ws`'s
  * null semantics (null elements are skipped ALONG WITH their
  * separator) via a slow exact path taken only when a null element is
  * actually present.
  */
object GramHashKernel {
  final val Mod = 1000000007L
  final val SpaceCp = 32L

  /** 31^cp(s) mod p and PolyHash(s), both in one code-point pass. */
  private def hashAndPow(s: UTF8String): (Long, Long) = {
    val str = s.toString
    var acc = 0L
    var pow = 1L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      pow = (pow * 31) % Mod
      i += Character.charCount(cp)
    }
    (acc, pow)
  }

  /** Exact slow path for arrays with null elements: the concat_ws
    * string per shingle, hashed directly. */
  private def slowGram(arr: ArrayData, from: Int, n: Int): Long = {
    val sb = new java.lang.StringBuilder
    var j = 0
    var first = true
    while (j < n) {
      if (!arr.isNullAt(from + j)) {
        if (!first) sb.append(' ')
        sb.append(arr.getUTF8String(from + j).toString)
        first = false
      }
      j += 1
    }
    PolyHash.hashUtf8(UTF8String.fromString(sb.toString))
  }

  private def hasNullElement(arr: ArrayData): Boolean = {
    var i = 0
    val n = arr.numElements()
    while (i < n) { if (arr.isNullAt(i)) return true; i += 1 }
    false
  }

  /** Hashes of all n-word shingles: output length max(0, len-n+1)
    * (empty when the array is shorter than n — the [[LlmOps.shinglesOf]]
    * convention). */
  def gramHashes(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val out = math.max(0, len - n + 1)
    if (out == 0) return new GenericArrayData(new Array[Long](0))
    val res = new Array[Long](out)
    if (hasNullElement(arr)) {
      var i = 0
      while (i < out) { res(i) = slowGram(arr, i, n); i += 1 }
      return new GenericArrayData(res)
    }
    val h = new Array[Long](len)
    val p = new Array[Long](len)
    var i = 0
    while (i < len) {
      val hp = hashAndPow(arr.getUTF8String(i))
      h(i) = hp._1; p(i) = hp._2
      i += 1
    }
    i = 0
    while (i < out) {
      var acc = h(i)
      var j = 1
      while (j < n) {
        // acc = acc ∘ " " ∘ w_{i+j}
        acc = ((acc * 31 + SpaceCp) % Mod * p(i + j) + h(i + j)) % Mod
        j += 1
      }
      res(i) = acc
      i += 1
    }
    new GenericArrayData(res)
  }

  /** The stupid-backoff probe tuple per trigram position i:
    * (h3, h2c, h2, h1c, h1) = hashes of (w_i w_{i+1} w_{i+2}),
    * (w_i w_{i+1}), (w_{i+1} w_{i+2}), w_{i+1}, w_{i+2} — every
    * unigram/bigram hashed ONCE per document position instead of
    * twice, and no shingle strings at all. Output length
    * max(0, len-2). */
  def backoffGramHashes(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    val out = math.max(0, len - 2)
    if (out == 0) return new GenericArrayData(new Array[Any](0))
    if (hasNullElement(arr)) {
      val res = new Array[Any](out)
      var i = 0
      while (i < out) {
        res(i) = InternalRow(
          slowGram(arr, i, 3), slowGram(arr, i, 2), slowGram(arr, i + 1, 2),
          slowGram(arr, i + 1, 1), slowGram(arr, i + 2, 1))
        i += 1
      }
      return new GenericArrayData(res)
    }
    val h = new Array[Long](len)
    val p = new Array[Long](len)
    var i = 0
    while (i < len) {
      val hp = hashAndPow(arr.getUTF8String(i))
      h(i) = hp._1; p(i) = hp._2
      i += 1
    }
    // bigram hashes b(i) = hash(w_i ∘ " " ∘ w_{i+1}), i in [0, len-2)
    val b = new Array[Long](len - 1)
    i = 0
    while (i < len - 1) {
      b(i) = ((h(i) * 31 + SpaceCp) % Mod * p(i + 1) + h(i + 1)) % Mod
      i += 1
    }
    val res = new Array[Any](out)
    i = 0
    while (i < out) {
      val tri = ((b(i) * 31 + SpaceCp) % Mod * p(i + 2) + h(i + 2)) % Mod
      res(i) = InternalRow(tri, b(i), b(i + 1), h(i + 1), h(i + 2))
      i += 1
    }
    new GenericArrayData(res)
  }
}

/** `graft_gram_hashes(ws, n)`: array<string> → array<long> of the
  * n-word-shingle [[PolyHash]]es (the hash multiset
  * `transform(shinglesOf(ws, n), s -> PolyHash(s))` produces, without
  * materializing a single shingle string). */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be positive: $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes requires ARRAY<STRING> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GramHashKernel.gramHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramHashKernel.gramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

/** `graft_backoff_gram_hashes(ws)`: array<string> →
  * array<struct<h3,h2c,h2,h1c,h1:long>> — one element per trigram
  * position, the five stupid-backoff lookup hashes
  * ([[graft.operators.TextOps.lmStupidBackoff]]'s probe tuple). */
case class BackoffGramHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_backoff_gram_hashes requires ARRAY<STRING> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h3", LongType, nullable = false),
    StructField("h2c", LongType, nullable = false),
    StructField("h2", LongType, nullable = false),
    StructField("h1c", LongType, nullable = false),
    StructField("h1", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_backoff_gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GramHashKernel.backoffGramHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GramHashKernel.backoffGramHashes($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BackoffGramHashes = copy(child = newChild)
}
