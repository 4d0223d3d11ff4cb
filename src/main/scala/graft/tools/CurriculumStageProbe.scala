package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Stage attribution probe for `llm_curriculum_pack_banded` — the
  * r17 heavy set's largest surviving line item (121/116 s at sf10).
  * The r16→r17 embed fix worked because the probe named the exact
  * dominant cost first (the interpreted hyperplane lambda); this probe
  * does the same for the banded curriculum pipeline before anyone
  * optimizes it.
  *
  * The full query is: LM gate (train trigram LM on src0, score every
  * doc, threshold) → banded range layout (min/max boundary agg + rank
  * within band) → selection join → token-exact pack (vocab train +
  * count-kernel prefix sums + the REAL BPE encode pass + offset join).
  * Stages share upstreams, so naive sequential timing double-counts;
  * each stage below is timed against a PINNED (localCheckpoint) input,
  * so its number is the stage's own marginal cost:
  *
  *  - `lm_gate_sec`: lmStupidBackoff + kept-filter, forced by count
  *    (the train + score pass, nothing downstream);
  *  - `layout_sec`: curriculumLayoutRange over the PINNED scored
  *    frame (boundary min/max + banded rank only);
  *  - `vocab_sec`: bpeVocab over the pinned selection (char-distinct
  *    collect + merge-table assembly);
  *  - `count_kernel_sec`: the bpeTokenCountCol pass (full merge loop
  *    per word, count only — the offset side of the pack);
  *  - `encode_sec`: the bpeEncodeIds pass forced by count (the real
  *    tokenize — one row per token);
  *  - `pack_tail_sec`: packTokenIdsBy over pinned inputs minus the
  *    two kernel passes it contains — reported as measured total;
  *  - `full_sec`: the pinned-nothing end-to-end query, the number the
  *    bench suite sees (min of 2).
  *
  * args: sfDir [budget=256]
  */
object CurriculumStageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val budget = if (args.length > 1) args(1).toLong else 256L
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
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // -- stage 1: LM gate (train + score + threshold), nothing pinned
    def mkScored = TextOps.lmStupidBackoff(docs, "doc_id", "text",
      trainPred = col("source") === "src0", threshBits = 8)
      .filter(col("kept") === 1L)
    val (g1, _) = timed(mkScored.count())
    val (g2, nKept) = timed(mkScored.count())

    // pinned scored frame for the downstream stages
    val scored = mkScored.select("doc_id", "bits_per_gram")
      .localCheckpoint(true)

    // -- stage 2: banded layout over the pinned gate output
    def mkOrder = TextOps.curriculumLayoutRange(
      scored, "doc_id", "bits_per_gram", nBands = 4)
    val (l1, _) = timed(mkOrder.count())
    val (l2, _) = timed(mkOrder.count())
    val order = mkOrder.localCheckpoint(true)

    // pinned selection (the frame the pack tokenizes)
    val sel = docs.join(order.select("doc_id"), Seq("doc_id"))
      .select("doc_id", "text").localCheckpoint(true)

    // -- stage 3: vocabulary assembly (char-distinct + merge table)
    val (v1, vocab) = timed(
      TextOps.bpeVocab(sel, "text", TextOps.BpeMergesEn))
    val (v2, _) = timed(TextOps.bpeVocab(sel, "text", TextOps.BpeMergesEn))

    // -- stage 4: the COUNT-ONLY kernel pass (offset side of the pack)
    def countPass = sel.select(
      TextOps.bpeTokenCountCol(col("text"), TextOps.BpeMergesEn).as("n"))
      .agg(sum("n")).head().getLong(0)
    val (c1, nTok) = timed(countPass)
    val (c2, _) = timed(countPass)

    // -- stage 5: the REAL encode pass (one row per token)
    def encodePass = TextOps.bpeEncodeIds(
      sel, "doc_id", "text", TextOps.BpeMergesEn, vocab).count()
    val (e1, nTok2) = timed(encodePass)
    val (e2, _) = timed(encodePass)
    require(nTok == nTok2, s"count kernel vs encode disagree: $nTok / $nTok2")

    // -- stage 6: the pack over pinned inputs (contains stages 3-5
    //    internally plus the prefix-sum machinery and the offset join)
    def packPinned = TextOps.packTokenIdsBy(
      sel, "doc_id", "text", budget, order).count()
    val (p1, nOut) = timed(packPinned)
    val (p2, _) = timed(packPinned)

    // -- the end-to-end query exactly as the bench suite runs it
    def full = {
      val sc = TextOps.lmStupidBackoff(docs, "doc_id", "text",
        trainPred = col("source") === "src0", threshBits = 8)
        .filter(col("kept") === 1L)
      val or = TextOps.curriculumLayoutRange(
        sc, "doc_id", "bits_per_gram", nBands = 4)
      val se = docs.join(or.select("doc_id"), Seq("doc_id"))
      TextOps.packTokenIdsBy(se, "doc_id", "text", budget, order = or)
        .count()
    }
    val (f1, nFull) = timed(full)
    val (f2, _) = timed(full)

    println(
      s"""{"probe":"curriculum_stages","dir":"$dir","n_docs":$nDocs,""" +
        s""""n_kept":$nKept,"n_tokens":$nTok,"n_packed":$nOut,""" +
        s""""n_full":$nFull,"vocab_size":${vocab.size},""" +
        s""""lm_gate_sec":${math.min(g1, g2)},""" +
        s""""layout_sec":${math.min(l1, l2)},""" +
        s""""vocab_sec":${math.min(v1, v2)},""" +
        s""""count_kernel_sec":${math.min(c1, c2)},""" +
        s""""encode_sec":${math.min(e1, e2)},""" +
        s""""pack_pinned_sec":${math.min(p1, p2)},""" +
        s""""full_sec":${math.min(f1, f2)}}""")
    spark.stop()
  }
}
