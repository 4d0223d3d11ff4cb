package graft.tools

import org.apache.spark.sql.SparkSession

/** Recall-vs-cost probe for [[graft.operators.LlmOps.embedNearDupPairs]]'s
  * `bands` knob — the r14 fix that restored recall (any-slice-agrees
  * across `bands` independent LSH tables instead of all-planes-agree in
  * one) at ~bands× the candidate-generation cost. The probe measures
  * BOTH sides of that trade on real scaled data: per arm
  * (bands ∈ {1, 2, 4} at auto width) it reports the verified pair count
  * (precision is exact — every candidate is cosine-checked, so the pair
  * count IS the recall axis) and min-of-2 interleaved wall time
  * (A,B,C,A,B,C in one JVM — the warm-up penalty lands on no arm).
  *
  * args: sfDir [threshold=0.2] [bandsList=1,2,4]
  */
object EmbedBandsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.2
    val bandsList = (if (args.length > 2) args(2) else "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = vecs.count()
    val ap = graft.operators.LlmOps.autoPlanes(n)
    def run(bands: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val pairs = graft.operators.LlmOps.embedNearDupPairs(
        vecs, "vec_id", "embedding", threshold, bands = bands, n = n).count()
      ((System.nanoTime() - t0) / 1e9, pairs)
    }
    val r1 = bandsList.map(b => b -> run(b))
    val r2 = bandsList.map(b => b -> run(b))
    val arms = bandsList.map { b =>
      val w = math.max(1, math.min(62 / b, ap))
      val (s1, p1) = r1.find(_._1 == b).get._2
      val (s2, p2) = r2.find(_._1 == b).get._2
      require(p1 == p2, s"non-deterministic pair count at bands=$b: $p1 vs $p2")
      s"""{"bands":$b,"width":$w,"sec":[$s1,$s2],""" +
        s""""sec_min":${math.min(s1, s2)},"pairs":$p1}"""
    }
    println(s"""{"probe":"embed_bands","dir":"$dir","n":$n,""" +
      s""""auto_planes":$ap,"threshold":$threshold,""" +
      s""""arms":[${arms.mkString(",")}]}""")
    spark.stop()
  }
}
