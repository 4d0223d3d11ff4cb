package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Production-size tokenizer probe: can the native
  * [[graft.functions.BpeEncodeIds]] expression carry a GPT-2-sized
  * (~32k) merge/vocab table without a plan-size or codegen blowup —
  * the same hazard class the classifier literal had before its 65536
  * cap (TextOps.classifierScore)?
  *
  * The tables ride as CONSTRUCTOR FIELDS reached through codegen
  * reference objects (not literal plan nodes), so the prediction is:
  * plan strings stay truncated, codegen is table-size-independent,
  * and the only growth is the serialized task binary (one broadcast
  * per stage). This probe MEASURES that instead of arguing it:
  * trains what the corpus supports via [[TextOps.bpeTrainLocal]]
  * (the synthetic corpus vocabulary exhausts near ~1.8k merges),
  * pads to the target size with never-firing merges (distinct
  * symbols outside the corpus alphabet — identical encode OUTPUT,
  * production-sized TABLES), and times plan build + full encode at
  * both table sizes in the same JVM.
  *
  * args: sfDir [nMerges=32768]
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val target = if (args.length > 1) args(1).toInt else 32768
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    val t0 = System.nanoTime()
    val trained = TextOps.bpeTrainLocal(docs, "text", nMerges = target)
    val tTrain = (System.nanoTime() - t0) / 1e9
    val padded = trained ++ (trained.size until target).map(i =>
      (s"¤$i¤", s"¤${i + 1}¤"))

    def run(merges: Seq[(String, String)]): (Double, Long, Double, Long) = {
      val vocab = TextOps.bpeVocab(docs, "text", merges)
      val p0 = System.nanoTime()
      val enc = TextOps.bpeEncodeIds(docs, "doc_id", "text", merges, vocab)
      val planChars = enc.queryExecution.executedPlan.toString.length
      val tPlan = (System.nanoTime() - p0) / 1e9
      val e0 = System.nanoTime()
      val n = enc.count()
      ((System.nanoTime() - e0) / 1e9, n, tPlan, planChars.toLong)
    }

    val (tBase, nBase, planBase, charsBase) = run(TextOps.BpeMergesEn)
    val (tBig, nBig, planBig, charsBig) = run(padded)
    println(s"""{"probe":"bpe_table_size","dir":"$dir",""" +
      s""""target":$target,"trained":${trained.size},""" +
      s""""sec_train_local":$tTrain,""" +
      s""""base_table":${TextOps.BpeMergesEn.size},""" +
      s""""sec_encode_base":$tBase,"tokens_base":$nBase,""" +
      s""""sec_plan_base":$planBase,"plan_chars_base":$charsBase,""" +
      s""""sec_encode_32k":$tBig,"tokens_32k":$nBig,""" +
      s""""sec_plan_32k":$planBig,"plan_chars_32k":$charsBig}""")
    spark.stop()
  }
}
