package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.LlmOps

/** coarseK sensitivity of the PQ rerank recall repair. Recorded at
  * sf0.01 (round 11): recall@5 0.28 raw ADC → 0.56 @ coarseK=20 →
  * 0.80 @ 50 → 0.88 @ 100 on the noise-bound synthetic corpus — the
  * exact-math budget (coarseK·probes rows) buys recall back
  * monotonically, the production trade.
  *
  * args: sfDir
  */
object PqRerankProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(args(0) + "/embeddings.parquet")
    val exact = LlmOps.cosineTopK(emb, "vec_id", "embedding",
      col("vec_id") < 5, 5)
      .select("probe_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (ck <- Seq(5, 20, 50, 100)) {
      val rr = LlmOps.pqRerankTopK(emb, "vec_id", "embedding", _ < 5,
        k = 5, coarseK = ck)
        .select("probe_id", "cand_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[pqrerank] coarseK=$ck%-4d recall@5=${(exact & rr).size / exact.size.toDouble}%.3f")
    }
    spark.stop()
  }
}
