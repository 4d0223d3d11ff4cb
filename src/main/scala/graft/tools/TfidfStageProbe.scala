package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LlmOps, TextOps}

/** Stage attribution probe for `TextOps.sparseCosinePairs`'s candidate
  * SCORING join — the r19 verdict's top remaining sf10 cost (34–38 s
  * of the 337–343 s heavy-set pair). The shingle pass got the native
  * kernel in r19; the Σdf² (doc_a, doc_b) scoring join has never been
  * probed past the df-band law (r8, `bench_r8_tfidf_band_probe.json`).
  * Before anyone restructures it, name where the seconds go — the
  * LmGateStageProbe discipline.
  *
  * Stages (noop-forced, min of 2; the weight frame is PINNED with an
  * eager localCheckpoint so scoring arms time ONLY the join+agg):
  *
  *  - `wt_sec`: the banded integer-idf weight frame (kernel shingle
  *    pass + tf agg + df agg + band filter) — everything before the
  *    self-join;
  *  - `dots_onelevel_sec`: pinned wt → self-join on term → a<b →
  *    groupBy(a,b) Σ wa·wb — the production shape's scoring core;
  *  - `dots_twolevel_sec`: same join, but a FIRST aggregation keyed
  *    (a, b, pmod(term, salts)) then a second to (a, b) — the
  *    term-salted two-level pre-aggregation the verdict prescribed
  *    probing (guide §2: partial agg before the wide shuffle);
  *  - `score_onelevel_sec` / `score_twolevel_sec`: the full scoring
  *    tail over pinned wt (dots + two norm joins + sim filter);
  *  - `prod_noop_sec` / `prod_count_sec`: production end to end,
  *    unpinned (count = the bench methodology).
  *
  * Equality is checked IN the artifact: pair count, Σdot, and the
  * order-free Σ round(sim·1e6) checksum must match across arms.
  *
  * args: sfDir [salts=32] [minSim=0.35]
  */
object TfidfStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val salts = if (args.length > 1) args(1).toInt else 32
    val minSim = if (args.length > 2) args(2).toDouble else 0.35
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

    // the production weight frame, inline (sparseCosinePairs defaults)
    def mkWt: DataFrame = {
      val tf = LlmOps.shingleHashes(docs, "doc_id", "text", 3, dedup = false)
        .withColumnRenamed("h", "term")
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nd = docs.select(col("doc_id")).agg(count(lit(1)).as("n_docs"))
      tf.join(dfreq, Seq("term"))
        .crossJoin(broadcast(nd))
        .filter(col("df") >= 2L &&
          col("df") <= floor(lit(0.05) * col("n_docs")))
        .select(col("doc_id"), col("term"),
          expr("tf * (1000000 div df)").as("w"))
    }
    // weight-frame breakdown: the shingle+tf half vs the df join half
    def mkTf: DataFrame =
      LlmOps.shingleHashes(docs, "doc_id", "text", 3, dedup = false)
        .withColumnRenamed("h", "term")
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val tfSec = timed2("tfidf: tf frame (shingles + (doc,term) agg)")(
      noop(mkTf))
    val wtSec = timed2("tfidf: weight frame build")(noop(mkWt))
    val wt = mkWt.localCheckpoint(true)
    val nWt = wt.count()

    def dotsOne(w: DataFrame): DataFrame = w
      .select(col("doc_id").as("doc_a"), col("term"), col("w").as("wa"))
      .join(w.select(col("doc_id").as("doc_b"), col("term"), col("w").as("wb")),
        Seq("term"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(sum(col("wa") * col("wb")).as("dot"))
    def dotsTwo(w: DataFrame): DataFrame = w
      .select(col("doc_id").as("doc_a"), col("term"), col("w").as("wa"))
      .join(w.select(col("doc_id").as("doc_b"), col("term"), col("w").as("wb")),
        Seq("term"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"),
        pmod(col("term"), lit(salts.toLong)).as("__salt"))
      .agg(sum(col("wa") * col("wb")).as("__d"))
      .groupBy("doc_a", "doc_b").agg(sum(col("__d")).as("dot"))

    val dotsOneSec = timed2("tfidf: dots one-level (pinned wt)")(
      noop(dotsOne(wt)))
    val dotsTwoSec = timed2("tfidf: dots two-level salted (pinned wt)")(
      noop(dotsTwo(wt)))

    def tail(dots: DataFrame, w: DataFrame,
        bcastNorms: Boolean = false): DataFrame = {
      val nrm0 = w.groupBy(col("doc_id")).agg(sum(col("w") * col("w")).as("n2"))
      val nrm = if (bcastNorms) broadcast(nrm0) else nrm0
      val sim = col("dot").cast("double") /
        (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double")))
      dots
        .join(nrm.select(col("doc_id").as("doc_a"), col("n2").as("na")),
          Seq("doc_a"))
        .join(nrm.select(col("doc_id").as("doc_b"), col("n2").as("nb")),
          Seq("doc_b"))
        .filter(sim >= minSim)
        .select(col("doc_a"), col("doc_b"), round(sim, 6).as("sim"))
    }
    val scoreOneSec = timed2("tfidf: full score one-level (pinned wt)")(
      noop(tail(dotsOne(wt), wt)))
    val scoreTwoSec = timed2("tfidf: full score two-level (pinned wt)")(
      noop(tail(dotsTwo(wt), wt)))
    // §3.1 arm: the two norm joins against the pair-sized dots frame,
    // with the DOC-sized norm table explicitly broadcast
    val scoreBcastSec = timed2("tfidf: full score bcast-norms (pinned wt)")(
      noop(tail(dotsOne(wt), wt, bcastNorms = true)))

    def prod = TextOps.sparseCosinePairs(docs, "doc_id", "text",
      n = 3, minDf = 2L, maxDfFrac = 0.05, minSim = minSim)
    val prodNoopSec = timed2("tfidf: production (noop)")(noop(prod))
    val prodCountSec = timed2("tfidf: production (count)") { prod.count(); () }

    // order-free equality checksum across arms
    def chk(d: DataFrame): String = {
      val r = d.agg(count(lit(1)), sum("dot")).head()
      s"${r.getLong(0)}/${if (r.isNullAt(1)) 0L else r.getLong(1)}"
    }
    def chkSim(d: DataFrame): String = {
      val r = d.agg(count(lit(1)),
        sum(round(col("sim") * 1e6).cast("long"))).head()
      s"${r.getLong(0)}/${if (r.isNullAt(1)) 0L else r.getLong(1)}"
    }
    val oneChk = chk(dotsOne(wt))
    val twoChk = chk(dotsTwo(wt))
    val prodChk = chkSim(prod)
    val oneSimChk = chkSim(tail(dotsOne(wt), wt))
    val twoSimChk = chkSim(tail(dotsTwo(wt), wt))
    val bcastSimChk = chkSim(tail(dotsOne(wt), wt, bcastNorms = true))
    // which join strategy production actually plans for the norm joins
    val prodPlan = prod.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val prodSmj = "SortMergeJoin".r.findAllIn(prodPlan).length
    val prodBhj = "BroadcastHashJoin".r.findAllIn(prodPlan).length

    println(
      s"""{"probe":"tfidf_score_stages","dir":"$dir","n_docs":$nDocs,""" +
        s""""n_wt":$nWt,"salts":$salts,""" +
        s""""tf_sec":$tfSec,"wt_sec":$wtSec,""" +
        s""""dots_onelevel_sec":$dotsOneSec,"dots_twolevel_sec":$dotsTwoSec,""" +
        s""""score_onelevel_sec":$scoreOneSec,"score_twolevel_sec":$scoreTwoSec,""" +
        s""""score_bcast_norms_sec":$scoreBcastSec,""" +
        s""""prod_noop_sec":$prodNoopSec,"prod_count_sec":$prodCountSec,""" +
        s""""prod_plan_smj":$prodSmj,"prod_plan_bhj":$prodBhj,""" +
        s""""dots_chk_one":"$oneChk","dots_chk_two":"$twoChk",""" +
        s""""sim_chk_one":"$oneSimChk","sim_chk_two":"$twoSimChk",""" +
        s""""sim_chk_bcast":"$bcastSimChk","sim_chk_prod":"$prodChk",""" +
        s""""chk_equal":${oneChk == twoChk && oneSimChk == twoSimChk &&
          oneSimChk == prodChk && oneSimChk == bcastSimChk}}""")
    spark.stop()
  }
}
