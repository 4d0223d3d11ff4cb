package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Full-corpus scale probe for the round-10 operators:
  *  - dupSpans vs winnowPairs on the SAME corpus — measures the claim
  *    that the span report (fp-keyed attribution + doc-keyed islands,
  *    no pair join) costs less than the pair search it complements;
  *  - incrementalNearDedup with a doc_id %% 5 new/history split —
  *    measures the registry-probe + verify-sliver path end-to-end.
  *
  * args: sfDir
  */
object NewOpsScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
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

    // SPARK_GRAFT_PROBE_ORDER=pairs_first deconfounds cold-JVM warmup
    // (the first heavy job pays JIT/codegen; see SURVEY §6) by swapping
    // which of the two comparable operators runs first.
    val pairsFirst = sys.env.get("SPARK_GRAFT_PROBE_ORDER").contains("pairs_first")
    def timed(f: => Long): (Long, Double) = {
      val t = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t) / 1e9)
    }
    def runSpans() = timed(
      graft.operators.TextOps.dupSpans(docs, "doc_id", "text").count())
    def runPairs() = timed(
      graft.operators.TextOps.winnowPairs(docs, "doc_id", "text").count())
    val ((nSpans, tSpans), (nPairs, tPairs)) =
      if (pairsFirst) { val p = runPairs(); val s = runSpans(); (s, p) }
      else { val s = runSpans(); val p = runPairs(); (s, p) }

    val fresh = docs.filter(col("doc_id") % 5 === 0)
    val hist = docs.filter(col("doc_id") % 5 =!= 0)
    val t2 = System.nanoTime()
    val nKept = graft.operators.LlmOps
      .incrementalNearDedup(fresh, hist, "doc_id", "text").count()
    val tNd = (System.nanoTime() - t2) / 1e9

    println(s"""{"probe":"newops_scale","dir":"$dir","n_docs":$nDocs,""" +
      s""""n_spans":$nSpans,"sec_dup_spans":$tSpans,""" +
      s""""n_pairs":$nPairs,"sec_winnow_pairs":$tPairs,""" +
      s""""n_new_kept":$nKept,"sec_incr_neardedup":$tNd}""")
    spark.stop()
  }
}
