package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.operators.LlmOps.semanticDedup]]'s cell
  * count `k` — the knob the fixed-bucket law names for the clustered
  * screen: the in-cell quadratic cost is Σ|cell|² (≈ N²/k when cells
  * balance), so a growing corpus grows k to hold per-cell volume flat,
  * trading screen recall at cell boundaries. Unlike the `planes`/`bits`
  * knobs the OUTPUT is not invariant in k (different cells screen
  * different mates), so the probe reports the dropped count per config
  * alongside time — the recall side of the trade is part of the
  * measurement, not a footnote.
  *
  * Protocol: each config is timed TWICE, interleaved (A,B,A,B in one
  * JVM) and reported min-of-2 — the first-run JVM warm-up penalty
  * measured in `bench_r8_tfidf_band_probe.json` lands on neither
  * config. The Σ|cell|² candidate volume is computed from each
  * config's own assignment so measured seconds can be read against
  * the cost model.
  *
  * args: sfDir [kA=8] [kB=64] [threshold=0.9]
  */
object SemDedupScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val kA = if (args.length > 1) args(1).toInt else 8
    val kB = if (args.length > 2) args(2).toInt else 64
    val threshold = if (args.length > 3) args(3).toDouble else 0.9
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVecs = vecs.count()
    def timed(k: Int): Double = {
      val t0 = System.nanoTime()
      graft.operators.LlmOps
        .semanticDedup(vecs, "vec_id", "embedding", threshold, k).count()
      (System.nanoTime() - t0) / 1e9
    }
    def stats(k: Int): (Long, Long) = {
      val out = graft.operators.LlmOps
        .semanticDedup(vecs, "vec_id", "embedding", threshold, k)
      val vol = out.groupBy("cell").agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) / 2")).cast("long")).collect()(0).getLong(0)
      val dropped = out.filter(!col("kept")).count()
      (vol, dropped)
    }
    val tA1 = timed(kA); val tB1 = timed(kB)
    val tA2 = timed(kA); val tB2 = timed(kB)
    val (volA, dropA) = stats(kA)
    val (volB, dropB) = stats(kB)
    println(s"""{"probe":"semdedup_k","dir":"$dir","n_vecs":$nVecs,""" +
      s""""k_a":$kA,"vol_a":$volA,"sec_a":[$tA1,$tA2],"dropped_a":$dropA,""" +
      s""""k_b":$kB,"vol_b":$volB,"sec_b":[$tB1,$tB2],"dropped_b":$dropB}""")
    spark.stop()
  }
}
