package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale probe for the banded SimHash pair search: candidate volume is
  * ∝ N² / 2^(bits/bands) because the bucket space is FIXED by the code
  * width — at 32-bit codes / 4 bands there are only 2^8·4 buckets, so a
  * 100× corpus packs ~100× more docs per bucket and the in-bucket
  * quadratic dominates. The production knob is the code width: this
  * main times simHashPairs at two widths on the same corpus so the
  * claim is measured, not argued.
  *
  * args: sfDir [bitsA=32] [bitsB=56] [bands=4] [maxHamming=3]
  */
object SimhashScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val bitsA = if (args.length > 1) args(1).toInt else 32
    val bitsB = if (args.length > 2) args(2).toInt else 56
    val bands = if (args.length > 3) args(3).toInt else 4
    val maxH = if (args.length > 4) args(4).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def run(bits: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.operators.LlmOps
        .simHashPairs(docs, "doc_id", "text", maxH, bits, bands,
          wideTokenHash = bits > 32) // A replicates the oracle-query config
        .count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (tA, nA) = run(bitsA)
    val (tB, nB) = run(bitsB)
    println(s"""{"probe":"simhash_width","dir":"$dir",""" +
      s""""bits_a":$bitsA,"sec_a":$tA,"pairs_a":$nA,""" +
      s""""bits_b":$bitsB,"sec_b":$tB,"pairs_b":$nB}""")
    spark.stop()
  }
}
