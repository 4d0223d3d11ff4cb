package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the inverted-index sparse-cosine join
  * ([[graft.operators.TextOps.sparseCosinePairs]]).
  *
  * The pair aggregation's exact pre-filter row count is
  * Σ df·(df−1)/2 over terms inside the df band [minDf, maxDfFrac·N] —
  * that sum IS the cost model, and because the band's upper edge is a
  * FRACTION of the corpus, a fixed frac admits ever-heavier terms as N
  * grows (worst surviving bucket ∝ (frac·N)²). This tool makes the
  * model inspectable before any join runs: it computes the df
  * HISTOGRAM once (one shingle pass + two keyed aggs, then a
  * driver-side fold over the ≤ thousands of distinct df values) and
  * prints the candidate volume for every requested cap; it then times
  * the real operator at each cap so measured seconds can be read
  * against predicted volume.
  *
  * Findings pinned in SURVEY §6 (sf10, 500k docs): caps 250 and 25000
  * bound volumes within 2.6% of each other (128.3M vs 131.7M pairs,
  * identical 29,254 output pairs) and warm runtimes within noise
  * (76-80 s) — on a shingled natural-text corpus the df distribution
  * is so heavy-tailed that everything dangerous sits far ABOVE any
  * sane cap, and the first timed run's +65% is pure JVM warm-up
  * (confirmed by running the two caps in both orders). The production
  * rule this probe supports: pick the cap by VOLUME (predictable from
  * the histogram for pennies), not by intuition about the fraction.
  *
  * The binding case the cap EXISTS for is boilerplate: a phrase shared
  * by a fraction p of the corpus creates terms with df = p·N — df
  * grows WITH the corpus, and each such term alone contributes
  * (p·N)²/2 candidate pairs. `boilerplateFrac` injects exactly that
  * (a fixed 12-word preamble on a deterministic p-slice of docs) so
  * the cap's effect is measurable on demand: the injected terms sit at
  * df = p·N, a cap below that excludes them, and the excluded volume
  * is pure noise (the preamble's cosine contribution is far below any
  * useful minSim, so output pairs are unchanged).
  *
  * args: sfDir [capList=250,25000] [minSim=0.35] [timed=all|none]
  *       [boilerplateFrac=0]
  *   capList — comma-separated ABSOLUTE df caps; volumes print for
  *   all, the operator is timed per cap unless timed=none.
  */
object TfidfScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val caps: Seq[Long] =
      (if (args.length > 1) args(1) else "250,25000")
        .split(",").toSeq.map(_.trim.toLong)
    val minSim = if (args.length > 2) args(2).toDouble else 0.35
    val timed = if (args.length > 3) args(3) else "all"
    val boilerFrac = if (args.length > 4) args(4).toDouble else 0.0
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val raw = spark.read.parquet(s"$dir/documents.parquet")
    val docs =
      if (boilerFrac <= 0.0) raw
      else raw.withColumn("text",
        when(pmod(abs(hash(col("doc_id"))), lit(10000)) <
            lit((boilerFrac * 10000).round),
          concat(lit("terms of service apply to all content on this " +
            "site please review them carefully "), col("text")))
          .otherwise(col("text")))
    val nDocs = docs.count()

    // df histogram: (df, number of terms with that df), collected once.
    // Distinct df values are bounded by the heaviest term's df — small
    // enough to fold on the driver for any corpus.
    val hist: Array[(Long, Long)] = graft.operators.LlmOps
      .shingleHashes(docs, "doc_id", "text", 3, dedup = false)
      .groupBy(col("doc_id"), col("h")).agg(count(lit(1)).as("tf"))
      .groupBy("h").agg(count(lit(1)).as("df"))
      .groupBy("df").agg(count(lit(1)).as("terms"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    // volume(cap) = Σ terms(df) · df·(df−1)/2 for 2 <= df <= cap
    def volume(cap: Long): Long = hist.collect {
      case (df, terms) if df >= 2L && df <= cap => terms * (df * (df - 1) / 2)
    }.sum
    val maxDf = hist.map(_._1).max

    def run(cap: Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = graft.operators.TextOps
        .sparseCosinePairs(docs, "doc_id", "text",
          maxDfFrac = cap.toDouble / nDocs, minSim = minSim)
        .count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val vols = caps.map(c => s""""$c":${volume(c)}""").mkString(",")
    val runs =
      if (timed == "none") ""
      else caps.map { c =>
        val (t, n) = run(c)
        s""""$c":{"sec":$t,"pairs":$n}"""
      }.mkString(",")
    println(s"""{"probe":"tfidf_df_band","dir":"$dir","n_docs":$nDocs,""" +
      s""""max_df":$maxDf,"volumes":{$vols},"timed":{$runs}}""")
    spark.stop()
  }
}
