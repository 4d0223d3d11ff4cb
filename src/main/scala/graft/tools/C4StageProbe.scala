package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LlmOps, TextOps}

/** Before/after measurement for the r19 `C4CleanText` kernel — the one
  * r19 change that shipped with correctness evidence but NO committed
  * timing (r19 verdict "What's wrong" #1). The BEFORE arm is the exact
  * pre-kernel relational form (6c6e2b4~1), kept inline as a permanent
  * twin the same way LmGateStageProbe pins the r18 score shape; the
  * AFTER arm is production `TextOps.c4Clean` (the compiled kernel).
  * Riders measured end-to-end: `llm_c4_clean`'s shape (c4Clean over
  * documents) — `llm_curation2_e2e` and streaming ST14 ingest share
  * the same per-row stage, so the arm delta transfers.
  *
  * Equality is checked IN the artifact: count, Σn_total, Σn_kept and
  * an order-free text_clean polyhash checksum must match across arms.
  *
  * args: sfDir
  */
object C4StageProbe {
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
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def timed2(label: String)(f: => Unit): Double = {
      spark.sparkContext.setJobDescription(label)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      spark.sparkContext.setJobDescription(null)
      ts.min
    }

    // ---- BEFORE arm: the pre-r19 relational form, verbatim ----
    def c4Relational(
        df: DataFrame, idCol: String, textCol: String,
        window: Int = 10, minSegWords: Int = 5, minSegs: Int = 3,
        blacklist: Seq[String] =
          Seq("lorem", "ipsum", "javascript", "{", "}")): DataFrame = {
      val ws = split(col(textCol), " ")
      val wsl = split(lower(col(textCol)), " ")
      val blk = array(blacklist.map(lit): _*)
      val n = size(ws).cast("long")
      val nseg = ceil(n / lit(window.toDouble)).cast("long")
      val keptIdx = filter(sequence(lit(0L), nseg - 1L), i =>
        least(lit(window.toLong), n - i * window) >= minSegWords &&
          !exists(slice(wsl, (i * window + 1L).cast("int"), lit(window)),
            w => array_contains(blk, w)))
      df.select(col(idCol), ws.as("__ws"),
          nseg.as("n_total"), keptIdx.as("__keep"))
        .select(col(idCol), col("n_total"),
          size(col("__keep")).cast("long").as("n_kept"),
          array_join(transform(col("__keep"), i =>
            array_join(slice(col("__ws"), (i * window + 1L).cast("int"),
              lit(window)), " ")), " ").as("text_clean"))
        .filter(col("n_kept") >= minSegs)
    }

    def before = c4Relational(docs, "doc_id", "text")
    def after = TextOps.c4Clean(docs, "doc_id", "text")

    val beforeSec = timed2("c4: relational HOF form (before, noop)")(
      noop(before))
    val afterSec = timed2("c4: native kernel (after, noop)")(noop(after))
    val beforeCountSec = timed2("c4: relational (count)") { before.count(); () }
    val afterCountSec = timed2("c4: kernel (count)") { after.count(); () }

    // order-free equality checksum across arms
    def chk(d: DataFrame): String = {
      val r = d.agg(count(lit(1)), sum("n_total"), sum("n_kept"),
        sum(pmod(LlmOps.strHash(col("text_clean")), lit(1000000007L)))).head()
      s"${r.getLong(0)}/${r.getLong(1)}/${r.getLong(2)}/${
        if (r.isNullAt(3)) 0L else r.getLong(3)}"
    }
    val beforeChk = chk(before)
    val afterChk = chk(after)

    println(
      s"""{"probe":"c4_clean_stages","dir":"$dir","n_docs":$nDocs,""" +
        s""""before_relational_sec":$beforeSec,"after_kernel_sec":$afterSec,""" +
        s""""before_count_sec":$beforeCountSec,"after_count_sec":$afterCountSec,""" +
        s""""chk_before":"$beforeChk","chk_after":"$afterChk",""" +
        s""""chk_equal":${beforeChk == afterChk}}""")
    spark.stop()
  }
}
