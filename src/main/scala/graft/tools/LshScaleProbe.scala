package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale probe for the hyperplane-LSH embedding ops: bucket count is
  * 2^planes — fixed — so in-bucket candidate volume is ∝ N²/2^planes
  * and a growing corpus must grow `planes` (each extra plane doubles
  * the buckets for one more narrow pass over the vectors). Times
  * [[graft.operators.LlmOps.embedNearDupPairs]] at two plane counts on
  * the same corpus so the knob is measured, not argued.
  *
  * args: sfDir [planesA=8] [planesB=16] [threshold=0.9]
  */
object LshScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val planesA = if (args.length > 1) args(1).toInt else 8
    val planesB = if (args.length > 2) args(2).toInt else 16
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
    def run(planes: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.operators.LlmOps
        .embedNearDupPairs(vecs, "vec_id", "embedding", threshold, planes)
        .count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (tA, nA) = run(planesA)
    val (tB, nB) = run(planesB)
    println(s"""{"probe":"lsh_planes","dir":"$dir",""" +
      s""""planes_a":$planesA,"sec_a":$tA,"pairs_a":$nA,""" +
      s""""planes_b":$planesB,"sec_b":$tB,"pairs_b":$nB}""")
    spark.stop()
  }
}
