package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{LlmOps, TextOps}

/** Production-path probe for the count-min heavy hitters (LT27): the
  * harness query (llm_cms_ngrams) is the CALIBRATION form — its
  * candidate set is the full exact-count frame, so its cost is
  * dominated by the exact n-gram groupBy it exists to validate
  * against, not by the sketch. The production form never counts
  * exactly: candidates come from a SAMPLED slice of the corpus (any
  * true heavy hitter appears in a 1% document sample with
  * overwhelming probability), so the cost is one sketch pass
  * (d·w-bounded) + a sampled distinct. This main times both shapes on
  * the same corpus and reports the top-k agreement, so the
  * "calibration cost ≠ production cost" note in SURVEY LT27 is a
  * measured number.
  *
  * args: sfDir [sampleMod=100]
  */
object CmsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val sampleMod = if (args.length > 1) args(1).toInt else 100
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // calibration shape (= llm_cms_ngrams): exact counts ARE the
    // candidate set, cost carries the full exact groupBy
    val (calTop, tCal) = timed {
      val exact = LlmOps.shingleHashes(docs, "doc_id", "text", 2,
        dedup = false)
        .groupBy("h").agg(count(lit(1)).as("exact_freq"))
      TextOps.cmsHeavyHitters(docs, "doc_id", "text", n = 2, k = 20,
        candidates = Some(exact))
        .select("h").collect().map(_.getLong(0)).toSet
    }
    // production shape: sketch + candidates sampled from 1/sampleMod
    // of the documents — no exact counting anywhere
    val (prodTop, tProd) = timed {
      val cand = LlmOps.shingleHashes(
        docs.filter(pmod(col("doc_id"), lit(sampleMod.toLong)) === 0),
        "doc_id", "text", 2, dedup = false)
        .select("h").distinct()
      TextOps.cmsHeavyHitters(docs, "doc_id", "text", n = 2, k = 20,
        candidates = Some(cand))
        .select("h").collect().map(_.getLong(0)).toSet
    }
    println(s"""{"probe":"cms_production","dir":"$dir",""" +
      s""""sample_mod":$sampleMod,""" +
      s""""sec_calibration":$tCal,"sec_production":$tProd,""" +
      s""""topk_overlap":${calTop.intersect(prodTop).size},""" +
      s""""k":${calTop.size}}""")
    spark.stop()
  }
}
