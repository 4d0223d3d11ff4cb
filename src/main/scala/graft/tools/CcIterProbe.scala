package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LlmOps, MultimodalOps}

/** Per-iteration stage attribution for the CC query family — r19
  * verdict next-round item #5: `llm_crossmodal_groups` (3.08 s sf0.1)
  * and `llm_dedup_groups` (1.87 s) are the two most expensive untouched
  * queries. Each is pair-generation + the pointer-jumping CC loop; the
  * r11 probe pinned pointer-jumping vs large/small-star on the MinHash
  * graph, but nobody has separated PAIR BUILD from LOOP, or named the
  * per-round cost/convergence profile, at sf10.
  *
  * For each arm (minhash graph = llm_dedup_groups's, union
  * simhash+payload graph = llm_crossmodal_groups's):
  *
  *  - `pairs_sec`: building + pinning the pair graph (the non-CC part);
  *  - `rounds`: per-round [seconds, labels-changed] from an
  *    instrumented inline copy of the `LlmOps.dedupGroups` loop (same
  *    messages/agg/checkpoint/release discipline, same loop-scoped
  *    child session with static planning and edge-proportional width);
  *  - `cc_sec`: the loop total; `prod_count_sec`: the production query
  *    shape end to end (pair build + dedupGroups + count).
  *
  * Label equality between the instrumented loop and production
  * `dedupGroups` is checked IN the artifact.
  *
  * args: sfDir
  */
object CcIterProbe {
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

    def secsOf[T](f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      ((System.nanoTime() - t0) / 1e9, r)
    }

    val armFilter = if (args.length > 1) args(1) else "all"

    // instrumented inline copy of LlmOps.dedupGroups (same discipline)
    def ccRounds(ids: DataFrame, pairs: DataFrame):
        (Seq[(Double, Long)], Boolean, DataFrame) = {
      val sess = ids.sparkSession
      val edges0 = pairs
        .select(explode(array(
          struct(col("doc_a").as("src"), col("doc_b").as("dst")),
          struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .localCheckpoint(false)
      val edgeCount = edges0.count()
      val defParts = sess.conf.get("spark.sql.shuffle.partitions", "200").toInt
      val loopParts = math.min(defParts.toLong,
        math.max(4L, edgeCount / 2000000L + 1L))
      val loopSess = sess.newSession()
      loopSess.conf.set("spark.sql.adaptive.enabled", "false")
      loopSess.conf.set("spark.sql.shuffle.partitions", loopParts.toString)
      val edges = org.apache.spark.sql.graftbridge.DatasetBridge
        .rehost(edges0, loopSess)
      var labels = edges
        .groupBy(col("src").as("id")).agg(min("dst").as("nmin"))
        .select(col("id"), least(col("id"), col("nmin")).as("label"))
        .localCheckpoint(false)
      var labelsCp = labels
      def messages(l: DataFrame): DataFrame = {
        val selfMsgs = l
          .select(col("id"), col("label").as("msg"), lit(true).as("self"))
        val neighborMsgs = edges
          .join(l.select(col("id").as("src"), col("label").as("msg")), "src")
          .select(col("dst").as("id"), col("msg"), lit(false).as("self"))
        val jumpMsgs = l.alias("l1")
          .join(l.alias("l2"), col("l1.label") === col("l2.id"))
          .select(col("l1.id").as("id"), col("l2.label").as("msg"),
            lit(false).as("self"))
        selfMsgs.union(neighborMsgs).union(jumpMsgs)
      }
      val rounds = scala.collection.mutable.ArrayBuffer[(Double, Long)]()
      var converged = false
      var iter = 0
      // 40, not production's 25: when production would throw
      // non-convergence, the probe's job is to SHOW the trajectory past
      // the cap, not to die with it
      while (!converged && iter < 40) {
        val (sec, changed) = secsOf {
          val next = messages(labels)
            .groupBy("id")
            .agg(min("msg").as("newLabel"),
              min(when(col("self"), col("msg"))).as("oldLabel"))
            .localCheckpoint(false)
          val c = next.filter(col("newLabel") < col("oldLabel")).count()
          LlmOps.releaseCheckpoint(labelsCp)
          labelsCp = next
          labels = next.select(col("id"), col("newLabel").as("label"))
          c
        }
        rounds += ((sec, changed))
        converged = changed == 0
        iter += 1
      }
      LlmOps.releaseCheckpoint(edges0)
      val finalLabels = org.apache.spark.sql.graftbridge.DatasetBridge
        .rehost(labelsCp, sess)
        .select(col("id"), col("newLabel").as("label"))
      val isolated = ids.select(col("doc_id").as("id"))
        .join(finalLabels.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), col("id").as("label"))
      (rounds.toSeq, converged, finalLabels.union(isolated)
        .select(col("id").as("doc_id"), col("label").as("canonical_id")))
    }

    def chk(d: DataFrame): String = {
      val r = d.agg(count(lit(1)),
        sum(pmod(xxhash64(col("doc_id"), col("canonical_id")),
          lit(1000000007L)))).head()
      s"${r.getLong(0)}/${if (r.isNullAt(1)) 0L else r.getLong(1)}"
    }

    def runArm(name: String, mkPairs: () => DataFrame,
        prodLabels: () => DataFrame): String = {
      spark.sparkContext.setJobDescription(s"cc $name: pair build")
      val (pairsSec, pinned) = secsOf {
        val p = mkPairs().localCheckpoint(true)
        p.count()
        p
      }
      val nPairs = pinned.count()
      spark.sparkContext.setJobDescription(s"cc $name: instrumented loop")
      val (ccSec, (rounds, converged, instLabels)) =
        secsOf(ccRounds(docs.select("doc_id"), pinned))
      val instChk = if (converged) chk(instLabels) else "not_converged"
      spark.sparkContext.setJobDescription(s"cc $name: production (count)")
      // production caps at 25 rounds and THROWS past it — record the
      // failure instead of dying (the trajectory above is the story)
      val (prodSec, prodChk) =
        try {
          val (s, _) = secsOf { prodLabels().count() }
          (s, chk(prodLabels()))
        } catch {
          case t: Throwable =>
            (-1.0, s"error: ${t.getClass.getSimpleName}")
        }
      spark.sparkContext.setJobDescription(null)
      val roundsJson = rounds.map { case (s, c) =>
        s"""[${math.round(s * 1000) / 1000.0},$c]""" }.mkString("[", ",", "]")
      s""""$name":{"pairs_sec":$pairsSec,"n_pairs":$nPairs,""" +
        s""""cc_sec":$ccSec,"converged":$converged,"rounds":$roundsJson,""" +
        s""""prod_count_sec":$prodSec,""" +
        s""""chk_inst":"$instChk","chk_prod":"$prodChk",""" +
        s""""chk_equal":${instChk == prodChk}}"""
    }

    val arms = scala.collection.mutable.ArrayBuffer[String]()
    if (armFilter == "all" || armFilter == "minhash")
      arms += runArm("dedup_groups_minhash",
        () => LlmOps.minHashCandidatePairs(docs, "doc_id", "text")
          .select("doc_a", "doc_b"),
        () => LlmOps.dedupGroups(docs.select("doc_id"), "doc_id",
          LlmOps.minHashCandidatePairs(docs, "doc_id", "text")))

    val withPayload = docs.withColumn("payload",
      MultimodalOps.withPayload(col("text")))
    if (armFilter == "all" || armFilter == "crossmodal")
      arms += runArm("crossmodal_union",
        () => {
          val nn = nDocs
          LlmOps.simHashPairsAuto(withPayload, "doc_id", "text",
            maxHamming = 3, n = nn).select("doc_a", "doc_b")
            .unionByName(MultimodalOps.payloadNearDupPairs(
              withPayload, "doc_id", "payload", 3, nn)
              .select("doc_a", "doc_b"))
        },
        () => MultimodalOps.crossModalDupGroups(withPayload, "doc_id", "text",
          "payload"))

    println(
      s"""{"probe":"cc_iterations","dir":"$dir","n_docs":$nDocs,""" +
        s"""${arms.mkString(",")}}""")
    spark.stop()
  }
}
