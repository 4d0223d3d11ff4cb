package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LlmOps, TextOps}

/** Stage attribution probe for `TextOps.classifierTrain` — r19 verdict
  * next-round item #4: `llm_classifier_train` reads 2.7 s at sf0.1 and
  * its 8-core/32-core scaling ratio (0.35 — 8 cores ~3× FASTER) is the
  * one genuinely anomalous scaling reading, suggesting the cost is
  * iteration-count-driven driver/JVM overhead (each of the 3 training
  * rounds runs an eager localCheckpoint of the 256-row weight table
  * plus two keyed aggregations), not data. Name the seconds, then
  * decide whether in-plan weight chaining (no per-round checkpoint,
  * one lazy plan for all rounds) wins.
  *
  * Stages (noop-forced, min of 2):
  *
  *  - `feats_sec`: the distinct (y, doc, bucket) feature frame — the
  *    only corpus-sized input;
  *  - `train_sec`: production `classifierTrain` (3 rounds, eager
  *    per-round localCheckpoint) forced by materializing the weights;
  *  - `train_fused_sec`: the SAME arithmetic as one lazy plan — three
  *    chained join+agg rounds over the persisted feature frame with no
  *    checkpoints, forced once at the end;
  *  - `prod_count_sec`: the full `llm_classifier_train` query shape
  *    (train + score all docs), `.count()`-forced (bench methodology);
  *  - `prod_fused_count_sec`: same, with the fused trainer.
  *
  * Equality is checked IN the artifact: per-bucket weights from both
  * trainers must be bit-identical (order-free checksum Σ(w·bucket
  * hash) + Σw + count).
  *
  * args: sfDir
  */
object ClassifierTrainProbe {
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
    val pos = docs.filter(col("source") === "src0")
    val neg = docs.filter(col("source") === "src1")
    val nBuckets = 256
    val iters = 3
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

    // ---- feature frame, replicated verbatim from classifierTrain ----
    def feats(df: DataFrame, y: Int): DataFrame = df
      .select(col("doc_id").as("__r"), col("text"))
      .select(col("__r"), explode(LlmOps.words(col("text"))).as("__w"))
      .select(lit(y).as("y"), col("__r"),
        pmod(LlmOps.strHash(col("__w")), lit(nBuckets.toLong)).as("bucket"))
      .distinct()
    def mkF = feats(pos, 1).unionByName(feats(neg, 0))
    val featsSec = timed2("classifier_train: feature frame")(noop(mkF))

    // ---- fused trainer: same arithmetic, ONE lazy plan, no checkpoints
    val FP = 1L << 20
    def trainFused(f: DataFrame): DataFrame = {
      val nd = f.groupBy(col("y"), col("__r"))
        .agg(count(lit(1)).as("__n"))
      var w: DataFrame = spark.range(nBuckets)
        .select(col("id").as("bucket"), lit(0L).as("w"))
      for (_ <- 1 to iters) {
        val z = f.join(broadcast(w), Seq("bucket"))
          .groupBy(col("y"), col("__r"))
          .agg(sum(col("w")).as("__zn"))
          .join(nd, Seq("y", "__r"))
        val p = greatest(lit(0.0), least(lit(1.0),
          lit(0.5) + col("__zn").cast("double") /
            (lit(4.0 * (1L << 20)) * col("__n"))))
        val err = z.select(col("y"), col("__r"),
          (round(p * FP, 0).cast("long") - col("y") * FP).as("__e"))
        val grad = f.join(err, Seq("y", "__r"))
          .groupBy(col("bucket"))
          .agg(sum(col("__e")).as("__g"))
        w = w.join(grad, Seq("bucket"), "left")
          .select(col("bucket"),
            (col("w") - expr(s"coalesce(__g, 0L) * 1 div 4096")).as("w"))
      }
      w
    }

    val fPinned = mkF.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    fPinned.count()

    val trainSec = timed2("classifier_train: production (checkpointed rounds)") {
      noop(TextOps.classifierTrain(pos, neg, "doc_id", "text",
        nBuckets = nBuckets, iters = iters))
    }
    val trainFusedSec = timed2("classifier_train: fused one-plan rounds") {
      noop(trainFused(mkF))
    }
    // fused over the PINNED frame: separates the fusion gain from the
    // feature-frame recompute (production persists f internally too)
    val trainFusedPinnedSec = timed2("classifier_train: fused (pinned feats)") {
      noop(trainFused(fPinned))
    }

    def score(wts: DataFrame): DataFrame =
      TextOps.classifierScore(docs, "doc_id", "text", wts,
        nBuckets = nBuckets, scale = 1048576.0, bias = 0.0)
        .orderBy("doc_id")
    val prodCountSec = timed2("classifier_train: full query (count)") {
      score(TextOps.classifierTrain(pos, neg, "doc_id", "text",
        nBuckets = nBuckets, iters = iters)).count(); ()
    }
    val prodFusedCountSec = timed2("classifier_train: full query fused (count)") {
      score(trainFused(mkF)).count(); ()
    }

    // bit-identity of the trained weights across arms
    def chk(w: DataFrame): String = {
      val r = w.agg(count(lit(1)), sum("w"),
        sum(pmod(xxhash64(col("bucket"), col("w")), lit(1000000007L)))).head()
      s"${r.getLong(0)}/${if (r.isNullAt(1)) 0L else r.getLong(1)}/${
        if (r.isNullAt(2)) 0L else r.getLong(2)}"
    }
    val prodChk = chk(TextOps.classifierTrain(pos, neg, "doc_id", "text",
      nBuckets = nBuckets, iters = iters))
    val fusedChk = chk(trainFused(mkF))
    fPinned.unpersist(false)

    println(
      s"""{"probe":"classifier_train_stages","dir":"$dir","n_docs":$nDocs,""" +
        s""""feats_sec":$featsSec,"train_sec":$trainSec,""" +
        s""""train_fused_sec":$trainFusedSec,""" +
        s""""train_fused_pinned_sec":$trainFusedPinnedSec,""" +
        s""""prod_count_sec":$prodCountSec,""" +
        s""""prod_fused_count_sec":$prodFusedCountSec,""" +
        s""""chk_prod":"$prodChk","chk_fused":"$fusedChk",""" +
        s""""chk_equal":${prodChk == fusedChk}}""")
    spark.stop()
  }
}
