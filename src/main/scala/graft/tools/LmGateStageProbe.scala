package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LlmOps, TextOps}

/** Stage attribution probe for the stupid-backoff LM gate
  * (`TextOps.lmStupidBackoff`) — the cost the r18 round named as the
  * curriculum path's dominant stage post-pack-fix (75–108 s of the
  * sf10 `llm_curriculum_pack*` path) but did not fix. Before anyone
  * restructures the five-join scoring pass, this probe names where the
  * seconds actually go, exactly as `CurriculumStageProbe` did for the
  * pack (whose suspected cost — the rank/band machinery — turned out
  * to be 0.4 s of a 121 s stage).
  *
  * Stages (each forced with the noop sink so nothing is pruned and no
  * output cost is timed; min of 2 passes each):
  *
  *  - `uni_sec`/`bi_sec`/`tri_sec`: the three train-split count tables
  *    (explode + keyed agg + the log2Fixed fixed-point fold per count
  *    row) — the model-TRAINING side;
  *  - `pos_sec`: the position frame alone (words split + the
  *    5-string-per-trigram struct transform + explode + 5 PolyHash
  *    columns) — the probe-side SCAN work, no joins;
  *  - `score_sec`: the score side over PINNED (localCheckpoint) count
  *    tables and a PINNED position frame — the five joins + backoff
  *    CASE + doc agg, nothing else. This stage is timed against the
  *    r18-shape INLINE TWIN below (five sequential left joins), so the
  *    before-arm stays measurable after `TextOps.lmStupidBackoff`
  *    itself is restructured;
  *  - `prod_full_sec`: `TextOps.lmStupidBackoff` end to end, unpinned,
  *    forced by noop — whatever shape production currently has;
  *  - `prod_count_sec`: same, forced by `.count()` — the bench suite's
  *    methodology, for comparability with BENCH_*.json numbers.
  *
  * args: sfDir
  */
object LmGateStageProbe {
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

    // ---- the r18 shape, inline (the permanent before-arm twin) ----
    val F = 1L << 20
    val trainPred = col("source") === "src0"
    def counts(n: Int): DataFrame = {
      val base = docs.filter(trainPred)
        .select(LlmOps.words(col("text")).as("__ws"))
      val grams =
        if (n == 1) base.select(explode(col("__ws")).as("__g"))
        else base.select(explode(LlmOps.shinglesOf(col("__ws"), n)).as("__g"))
      grams.select(LlmOps.strHash(col("__g")).as("h"))
        .groupBy("h").agg(count(lit(1)).as("c"))
    }
    def mkUni = counts(1).select(col("h"), col("c"),
      TextOps.log2Fixed(col("c")).as("f"),
      TextOps.log2Fixed(col("c") + 1L).as("fp"))
    def mkBi = counts(2).select(col("h"), TextOps.log2Fixed(col("c")).as("f"))
    def mkTri = counts(3).select(col("h"), TextOps.log2Fixed(col("c")).as("f"))
    def mkTot = counts(1).agg(sum(col("c")).as("__n"), count(lit(1)).as("__v"))
      .select(TextOps.log2Fixed(col("__n") + col("__v")).as("__ft"))
    def mkPos = docs
      .select(col("doc_id"), LlmOps.words(col("text")).as("__ws"))
      .filter(size(col("__ws")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("__ws")) - 3),
        i => {
          val ws = col("__ws")
          struct(
            concat_ws(" ", ws(i), ws(i + 1), ws(i + 2)).as("s3"),
            concat_ws(" ", ws(i), ws(i + 1)).as("s2c"),
            concat_ws(" ", ws(i + 1), ws(i + 2)).as("s2"),
            ws(i + 1).as("s1c"),
            ws(i + 2).as("s1"))
        })).as("__g"))
      .select(col("doc_id"),
        LlmOps.strHash(col("__g.s3")).as("h3"),
        LlmOps.strHash(col("__g.s2c")).as("h2c"),
        LlmOps.strHash(col("__g.s2")).as("h2"),
        LlmOps.strHash(col("__g.s1c")).as("h1c"),
        LlmOps.strHash(col("__g.s1")).as("h1"))

    val uniSec = timed2("lmgate: uni counts")(noop(mkUni))
    val biSec = timed2("lmgate: bi counts")(noop(mkBi))
    val triSec = timed2("lmgate: tri counts")(noop(mkTri))
    val posSec = timed2("lmgate: position frame")(noop(mkPos))

    // pinned inputs for the score-side isolation
    val uni = mkUni.localCheckpoint(true)
    val bi = mkBi.localCheckpoint(true)
    val tri = mkTri.localCheckpoint(true)
    val tot = mkTot.localCheckpoint(true)
    val pos = mkPos.localCheckpoint(true)
    val nPos = pos.count()
    val nUni = uni.count(); val nBi = bi.count(); val nTri = tri.count()

    def scoreR18(p: DataFrame): DataFrame = p
      .join(tri.select(col("h").as("h3"), col("f").as("f3")), Seq("h3"), "left")
      .join(bi.select(col("h").as("h2c"), col("f").as("f2c")), Seq("h2c"), "left")
      .join(bi.select(col("h").as("h2"), col("f").as("f2")), Seq("h2"), "left")
      .join(uni.select(col("h").as("h1c"), col("f").as("f1c")), Seq("h1c"), "left")
      .join(uni.select(col("h").as("h1"), col("fp").as("f1p")), Seq("h1"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"),
        when(col("f3").isNotNull, col("f3") - col("f2c"))
          .when(col("f2").isNotNull, col("f2") - col("f1c") - lit(F))
          .otherwise(coalesce(col("f1p"), lit(0L)) - col("__ft") - lit(2L * F))
          .as("__s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_grams"), sum(col("__s")).as("__sum"))
    val scoreSec = timed2("lmgate: r18 five-join score (pinned inputs)")(
      noop(scoreR18(pos)))

    // r19 shape: the native-kernel position frame (no shingle strings)
    def mkPosNew = docs
      .select(col("doc_id"), LlmOps.words(col("text")).as("__ws"))
      .filter(size(col("__ws")) >= 3)
      .select(col("doc_id"),
        posexplode(LlmOps.backoffGramHashesOf(col("__ws")))
          .as(Seq("__pos", "__g")))
      .select(col("doc_id"), col("__pos"),
        col("__g.h3").as("h3"), col("__g.h2c").as("h2c"),
        col("__g.h2").as("h2"), col("__g.h1c").as("h1c"),
        col("__g.h1").as("h1"))
    val posNewSec = timed2("lmgate: r19 native position frame")(noop(mkPosNew))

    def prod = TextOps.lmStupidBackoff(docs, "doc_id", "text",
      trainPred = trainPred, threshBits = 8)
    val prodFullSec = timed2("lmgate: production full (noop)")(noop(prod))
    val prodCountSec = timed2("lmgate: production full (count)") {
      prod.count(); ()
    }
    // both join-strategy branches, forced (broadcast / tag-union join)
    def prodB = TextOps.lmStupidBackoffImpl(docs, "doc_id", "text",
      trainPred, 8, maxBroadcastRows = Long.MaxValue)
    def prodS = TextOps.lmStupidBackoffImpl(docs, "doc_id", "text",
      trainPred, 8, maxBroadcastRows = 0L)
    val bcastSec = timed2("lmgate: r19 broadcast branch (noop)")(noop(prodB))
    val shufSec = timed2("lmgate: r19 tag-union join branch (noop)")(noop(prodS))
    // bit-identity cross-check IN the artifact: the inline r18 twin and
    // whatever shape production has must agree exactly on the integer
    // gate (kept count from the UNROUNDED sums), the gram totals, and
    // the rounded per-doc score sum. Any restructure of
    // TextOps.lmStupidBackoff that shifts one integer shows here.
    val twinRow = scoreR18(pos)
      .select(col("n_grams"),
        round(-col("__sum").cast("double") / (col("n_grams") * lit(F)), 6)
          .as("bits_per_gram"),
        (-col("__sum") <= col("n_grams") * lit(8L * F))
          .cast("long").as("kept"))
      .agg(sum("n_grams"), sum("kept"),
        sum(round(col("bits_per_gram") * 1e6).cast("long"))).head()
    // order-free checksum: per-doc bits_per_gram is a rounded double
    // (identical per row across shapes), but a float SUM depends on
    // partition order — scale to integral micro-units first so the
    // checksum itself is deterministic
    def chk(d: org.apache.spark.sql.DataFrame): String = {
      val r = d.agg(sum("n_grams"), sum("kept"),
        sum(round(col("bits_per_gram") * 1e6).cast("long"))).head()
      s"${r.getLong(0)}/${r.getLong(1)}/${r.getLong(2)}"
    }
    val twinChk = s"${twinRow.getLong(0)}/${twinRow.getLong(1)}/${twinRow.getLong(2)}"
    val prodChk = chk(prod)
    val bcastChk = chk(prodB)
    val shufChk = chk(prodS)

    println(
      s"""{"probe":"lm_gate_stages","dir":"$dir","n_docs":$nDocs,""" +
        s""""n_pos":$nPos,"n_uni":$nUni,"n_bi":$nBi,"n_tri":$nTri,""" +
        s""""uni_sec":$uniSec,"bi_sec":$biSec,"tri_sec":$triSec,""" +
        s""""pos_sec":$posSec,"pos_new_sec":$posNewSec,""" +
        s""""score_sec":$scoreSec,""" +
        s""""prod_full_sec":$prodFullSec,"prod_count_sec":$prodCountSec,""" +
        s""""bcast_branch_sec":$bcastSec,"shuffle_branch_sec":$shufSec,""" +
        s""""twin_chk":"$twinChk","prod_chk":"$prodChk",""" +
        s""""bcast_chk":"$bcastChk","shuffle_chk":"$shufChk",""" +
        s""""chk_equal":${twinChk == prodChk && twinChk == bcastChk &&
          twinChk == shufChk}}""")
    spark.stop()
  }
}
