package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale probe for the hyperplane-LSH embedding ops: bucket count is
  * 2^planes, so in-bucket candidate volume is ∝ N²/2^planes and a
  * growing corpus must grow `planes` — which
  * [[graft.operators.LlmOps.autoPlanes]] now does by default
  * (planes = bitlength(n−1) − 1). Times
  * [[graft.operators.LlmOps.embedNearDupPairs]] at each requested
  * plane count (0 = auto) on each requested corpus IN ONE JVM, so
  * both the knob and the DECADE ratio under auto scaling are matched
  * same-session measurements.
  *
  * args: sfDirs(comma-sep) [planesList(comma-sep, default "8,0")]
  *       [threshold=0.2]
  */
object LshScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = args(0).split(',').toSeq
    val planesList =
      (if (args.length > 1) args(1) else "8,0").split(',').map(_.toInt).toSeq
    val threshold = if (args.length > 2) args(2).toDouble else 0.2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cells = for (dir <- dirs; planes <- planesList) yield {
      val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = vecs.count()
      val effective =
        if (planes > 0) planes else graft.operators.LlmOps.autoPlanes(n)
      val t0 = System.nanoTime()
      val pairs = graft.operators.LlmOps
        .embedNearDupPairs(vecs, "vec_id", "embedding", threshold, planes)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      s"""{"dir":"$dir","n":$n,"planes":$planes,""" +
        s""""planes_effective":$effective,"sec":$sec,"pairs":$pairs}"""
    }
    println(s"""{"probe":"lsh_planes","threshold":$threshold,""" +
      s""""runs":[${cells.mkString(",")}]}""")
    spark.stop()
  }
}
