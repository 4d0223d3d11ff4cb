package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full-corpus scale probe for the winnowing operators: fingerprints
  * (explode + one keyed window) and the df-capped overlap pair search
  * over the WHOLE input — no doc-id slice, unlike the oracle queries.
  * Reports fingerprint volume, pair volume, and wall time per stage so
  * the window-pass and pair-join costs can be read against corpus size
  * across sf dirs.
  *
  * args: sfDir [k=8] [w=4] [maxDocsPerFp=50] [minShared=2]
  */
object WinnowScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 8
    val w = if (args.length > 2) args(2).toInt else 4
    val cap = if (args.length > 3) args(3).toLong else 50L
    val minShared = if (args.length > 4) args(4).toLong else 2L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val nFps = graft.operators.TextOps
      .winnowFingerprints(docs, "doc_id", "text", k, w).count()
    val tFps = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val nPairs = graft.operators.TextOps
      .winnowPairs(docs, "doc_id", "text", k, w, cap, minShared).count()
    val tPairs = (System.nanoTime() - t1) / 1e9
    println(s"""{"probe":"winnow_scale","dir":"$dir","n_docs":$nDocs,""" +
      s""""k":$k,"w":$w,"cap":$cap,"min_shared":$minShared,""" +
      s""""n_fps":$nFps,"sec_fps":$tFps,"n_pairs":$nPairs,"sec_pairs":$tPairs}""")
    spark.stop()
  }
}
