package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** Native LshCode expression: bit-equivalence with the composed
  * higher-order form (the DuckDB oracle's semantics) across sign
  * patterns and degenerate arrays, null folding to 0L, and codegen
  * participation. */
class LshCodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bit-identical bucket ids to the composed transform+aggregate " +
    "form across random vectors, all plane-count regimes, short " +
    "arrays and null holes") {
    val rnd = new scala.util.Random(17)
    val dims = 16
    val vecs: Seq[Option[Seq[Option[Double]]]] =
      (1 to 50).map(_ => Some(Seq.fill(dims)(
        Some(rnd.nextDouble() * 2 - 1)))) ++ Seq(
        Some(Seq.fill(dims)(Some(0.0))),          // all-zero: every d == 0
        Some(Seq.fill(dims + 4)(Some(1.0))),      // longer: extra ignored
        Some(Seq(Some(1.0), None) ++
          Seq.fill(dims - 2)(Some(1.0))),         // null element
        None)                                     // null array
    val df = vecs.toDF("v")
      .select(LlmOps.toDoubleVec(col("v")).as("e"))
    for (planes <- Seq(1, 8, 15, 62)) {
      val rows = df.select(
        LlmOps.lshBucket(col("e"), planes, dims).as("native"),
        LlmOps.lshBucketComposed(col("e"), planes, dims).as("composed"))
        .collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(!r.isNullAt(0), s"native code must never be null (row $i)")
        val nat = r.getLong(0)
        // composed: null folds through when().otherwise(0) to 0 per
        // plane — the sum is never null either
        val comp = if (r.isNullAt(1)) 0L else r.getLong(1)
        assert(nat === comp,
          s"planes=$planes row $i: native $nat != composed $comp")
      }
    }
  }

  test("short arrays: the native form folds to 0L (a malformed " +
    "embedding must not kill the job) where the ANSI composed form " +
    "hard-errors — the ONE deliberate divergence, pinned here") {
    val df = Seq(Seq.fill(3)(1.0)).toDF("e")
    val nat = df.select(LlmOps.lshBucket(col("e"), 8, 16)).collect()
    assert(nat(0).getLong(0) === 0L,
      "short array codes to bucket 0 (downstream exact-verify keeps " +
        "output unaffected)")
    intercept[Exception] {
      df.select(LlmOps.lshBucketComposed(col("e"), 8, 16)).collect()
    }
  }

  test("NaN plane-sums set the bit exactly like the composed form " +
    "(Spark SQL and DuckDB order NaN greater than every double, so " +
    "when(d > 0) is TRUE for a NaN sum) — native matches, pinned so " +
    "the bit-identity contract covers non-finite inputs") {
    val dims = 8
    // one NaN element poisons every plane-sum to NaN; one Infinity
    // element drives sums to ±Inf (weight-sign dependent); a -Inf/+Inf
    // mix can cancel to NaN. All must agree native-vs-composed.
    val vecs = Seq(
      Seq(Double.NaN) ++ Seq.fill(dims - 1)(1.0),
      Seq(Double.PositiveInfinity) ++ Seq.fill(dims - 1)(1.0),
      Seq(Double.NegativeInfinity) ++ Seq.fill(dims - 1)(1.0),
      Seq(Double.NegativeInfinity, Double.PositiveInfinity) ++
        Seq.fill(dims - 2)(1.0))
    val df = vecs.toDF("e")
    for (planes <- Seq(1, 8, 62)) {
      val rows = df.select(
        LlmOps.lshBucket(col("e"), planes, dims).as("native"),
        LlmOps.lshBucketComposed(col("e"), planes, dims).as("composed"))
        .collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(0) === r.getLong(1),
          s"planes=$planes non-finite row $i: native ${r.getLong(0)} " +
            s"!= composed ${r.getLong(1)}")
      }
    }
    // and the all-NaN vector sets EVERY bit (NaN > 0 under SQL
    // semantics), pinning the direction of the agreement
    val allNaN = Seq(Seq.fill(dims)(Double.NaN)).toDF("e")
      .select(LlmOps.lshBucket(col("e"), 8, dims)).collect()
    assert(allNaN(0).getLong(0) === 255L)
  }

  test("stays inside WholeStageCodegen (no interpreted fallback)") {
    val q = spark.range(64)
      .select(array((0 until 8).map(i =>
        (col("id") * (i + 1)).cast("double") - 200.0): _*).as("e"))
      .select(LlmOps.lshBucket(col("e"), 10, 8).as("code"))
      .filter(col("code") >= 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.filter(_.contains("graft_lsh_code"))
      .forall(_.contains("*(")), s"lsh code outside codegen:\n$plan")
    assert(plan.contains("graft_lsh_code"), s"expression missing:\n$plan")
    assert(q.count() === 64)
  }
}
