package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Scale probe for curriculum packing's ORDERING stage. Three arms of
  * the same gate → rank → token-exact pack pipeline in one JVM:
  *
  *  - `global`: the pinned llm_curriculum_pack oracle form verbatim —
  *    one no-partition rank window over the UNPINNED scored frame
  *    (every reuse recomputes the LM scorer; the rank is one task);
  *  - `global_pinned`: same single-task global rank, but the narrow
  *    (id, difficulty) frame localCheckpointed first — isolates what
  *    pinning alone buys;
  *  - `banded`: [[TextOps.curriculumLayout]] — pinned AND banded, the
  *    production twin (rank windows partition by difficulty band, so
  *    no corpus-sized single-task sort exists in the plan).
  *
  * The first sf10 run measured the UNPINNED banded form at 244.7 s vs
  * global's 166.0 s — the extra boundary-agg pass over the LM scorer
  * cost more than the funnel it removed; that is why the helper pins
  * internally and why this probe separates the two effects.
  *
  * args: sfDir [nBands=32] [budget=256]
  */
object CurriculumProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBands = if (args.length > 1) args(1).toInt else 32
    val budget = if (args.length > 2) args(2).toLong else 256L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def run(mode: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val scored = TextOps.lmStupidBackoff(docs, "doc_id", "text",
        trainPred = col("source") === "src0", threshBits = 8)
        .filter(col("kept") === 1L)
      import org.apache.spark.sql.expressions.Window
      def globalRank(base: org.apache.spark.sql.DataFrame) =
        base.select(col("doc_id"), lit(0L).as("shard"),
          row_number().over(
            Window.orderBy(col("bits_per_gram"), col("doc_id")))
            .cast("long").as("pos"))
      val order = mode match {
        case "banded" =>
          TextOps.curriculumLayout(scored, "doc_id", "bits_per_gram", nBands)
        case "global_pinned" =>
          globalRank(scored.select(col("doc_id"), col("bits_per_gram"))
            .localCheckpoint(true))
        case _ => globalRank(scored)
      }
      val sel = docs.join(order.select("doc_id"), Seq("doc_id"))
      val n = TextOps.packTokenIdsBy(sel, "doc_id", "text",
        budget = budget, order = order).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val (tGlobal, nGlobal) = run("global")
    val (tPinned, nPinned) = run("global_pinned")
    val (tBanded, nBanded) = run("banded")
    println(s"""{"probe":"curriculum_layout","dir":"$dir",""" +
      s""""n_bands":$nBands,"budget":$budget,""" +
      s""""sec_global":$tGlobal,"tokens_global":$nGlobal,""" +
      s""""sec_global_pinned":$tPinned,"tokens_global_pinned":$nPinned,""" +
      s""""sec_banded":$tBanded,"tokens_banded":$nBanded}""")
    spark.stop()
  }
}
