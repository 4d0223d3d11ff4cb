package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** Trained residual-PQ semantics: the published claim (Jégou et al.
  * 2011) is that at the SAME m×ksub code budget, quantizing residuals
  * `r = e − cell_centroid` with TRAINED sub-codebooks reconstructs
  * finer and ranks in-cell neighbors better than plain PQ on raw
  * vectors. These tests pin that on a crafted clustered corpus where
  * the effect is structural (not sampling luck): coarse cells absorb
  * the between-cluster variance, so plain PQ's two codewords per
  * subspace are spent re-separating cells and saturate within a cell,
  * while the residual book's codewords separate exactly the within-
  * cell directions. Plus the round-12 hardening: empty-seed fail-fast,
  * strict encode length, repartition invariance of trained output. */
class PqTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // Two orthogonal cells (ids 0, 1 = coarse seeds) with members at
  // centroid ± the residual direction (0, .5, 0, ±.5-ish); ids 2, 3
  // are the residual-codebook seeds (one per residual sign). All
  // fractions are powers of two — every residual subtract is IEEE-
  // exact, so codes are deterministic with zero tie risk.
  private lazy val clustered = Seq(
    (0L, Array(4.0f, 0.0f, 0.0f, 0.0f)),      // cell-A centroid
    (1L, Array(0.0f, 0.0f, 4.0f, 0.0f)),      // cell-B centroid
    (2L, Array(4.0f, 0.5f, 0.0f, 0.5f)),      // res seed + (cell A)
    (3L, Array(0.0f, -0.5f, 4.0f, -0.5f)),    // res seed - (cell B)
    (4L, Array(4.0f, 0.5f, 0.0f, 0.5f)),      // A, res + (dup of 2)
    (5L, Array(4.0f, -0.5f, 0.0f, -0.5f)),    // A, res -
    (6L, Array(4.0f, 0.5f, 0.0f, 0.25f)),     // A, res + jittered
    (7L, Array(4.0f, -0.5f, 0.0f, -0.25f)),   // A, res - jittered
    (8L, Array(0.0f, 0.5f, 4.0f, 0.5f)),      // B, res +
    (9L, Array(0.0f, -0.5f, 4.0f, -0.25f)),   // B, res - jittered
    (10L, Array(0.0f, 0.5f, 4.0f, 0.25f)),    // B, res + jittered
    (11L, Array(0.0f, -0.5f, 4.0f, -0.5f))    // B, res - (dup of 3)
  ).toDF("vec_id", "embedding")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("trained residual PQ beats trained plain PQ on recall@2 over a " +
    "clustered corpus, at the identical m x ksub code budget") {
    val truth = pairs(LlmOps.cosineTopK(clustered, "vec_id", "embedding",
      probeFilter = col("vec_id") >= 4, k = 2))
    def run(residual: Boolean) = pairs(LlmOps.annTopKIvfPq(
      clustered, "vec_id", "embedding", probeFilter = _ >= 4, topK = 2,
      kCells = 2, iters = 0, nprobe = 1, m = 2, ksub = 2, dims = 4,
      residual = residual, trainIters = 2))
    def recall(got: Set[(Long, Long)]) =
      got.intersect(truth).size.toDouble / truth.size
    val rPlain = recall(run(residual = false))
    val rRes = recall(run(residual = true))
    info(f"recall@2: plain(trained)=$rPlain%.3f residual(trained)=$rRes%.3f")
    assert(rRes >= rPlain,
      s"trained residual recall $rRes must be >= trained plain $rPlain")
    // the structural gap: residual codes separate the within-cell
    // directions plain PQ saturates, so the win is large, not marginal
    assert(rRes >= rPlain + 0.2,
      s"clustered corpus must show the published residual advantage: " +
        s"plain=$rPlain residual=$rRes")
  }

  test("trained residual reconstruction error is strictly below trained " +
    "plain PQ on the clustered corpus, and training reduces both") {
    def meanErr2(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg("err2")).collect()(0).getDouble(0)
    val plainSeed = meanErr2(LlmOps.pqReconReport(
      clustered, "vec_id", "embedding", m = 2, ksub = 2, dims = 4))
    val plainTrained = meanErr2(LlmOps.pqReconReport(
      clustered, "vec_id", "embedding", m = 2, ksub = 2, dims = 4,
      trainIters = 2))
    val resSeed = meanErr2(LlmOps.pqResidualReconReport(
      clustered, "vec_id", "embedding", kCells = 2, m = 2, ksub = 2,
      dims = 4))
    val resTrained = meanErr2(LlmOps.pqResidualReconReport(
      clustered, "vec_id", "embedding", kCells = 2, m = 2, ksub = 2,
      dims = 4, trainIters = 2))
    info(f"mean err2: plain seed=$plainSeed%.4f trained=$plainTrained%.4f; " +
      f"residual seed=$resSeed%.4f trained=$resTrained%.4f")
    assert(plainTrained <= plainSeed + 1e-12)
    assert(resTrained <= resSeed + 1e-12)
    assert(resTrained < plainTrained,
      s"residual(trained) err $resTrained must be strictly below " +
        s"plain(trained) $plainTrained")
  }

  test("trained-PQ outputs are repartition-invariant on the real corpus " +
    "(1 vs 32 input partitions, rounded scores and exact pair sets)") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def run(parts: Int) = LlmOps.annTopKIvfPq(
      vecs.repartition(parts), "vec_id", "embedding",
      probeFilter = _ < 20, topK = 3, kCells = 8, iters = 0, nprobe = 1,
      residual = true, trainIters = 2)
      .orderBy("probe_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSeq
    assert(run(1) === run(32),
      "trained residual retrieval must not depend on input partitioning")
  }

  test("empty seed range fails fast instead of returning silently empty " +
    "retrievals (ids must be dense from 0)") {
    val shifted = clustered.withColumn("vec_id", col("vec_id") + 1000L)
    val ex = intercept[IllegalArgumentException] {
      LlmOps.annTopKPq(shifted, "vec_id", "embedding",
        probeFilter = _ >= 1004, k = 2, m = 2, ksub = 2, dims = 4).collect()
    }
    assert(ex.getMessage.contains("codebook is empty"), ex.getMessage)
  }

  test("strict encode length: a dims mismatch yields null codes (empty " +
    "result), never plausible prefix codes") {
    val eight = Seq(
      (0L, Array.tabulate(8)(i => (i + 1).toFloat)),
      (1L, Array.tabulate(8)(i => (8 - i).toFloat)),
      (2L, Array.tabulate(8)(i => (i % 3).toFloat))
    ).toDF("vec_id", "embedding")
    // dims=4 on 8-long vectors: pre-round-12 this silently encoded the
    // first 4 elements; now every encode is null and the result empty
    val out = LlmOps.annTopKPq(eight, "vec_id", "embedding",
      probeFilter = _ === 0, k = 2, m = 2, ksub = 2, dims = 4)
    assert(out.count() === 0)
  }
}
