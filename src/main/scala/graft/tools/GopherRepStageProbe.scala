package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LlmOps, TextOps}

/** Stage attribution probe for `TextOps.gopherRepetition` — r19
  * verdict next-round item #6: the 18-lead window (one sort of the
  * corpus word frame, partitioned by doc) feeds the 2..10-gram stream;
  * a segment-array (native kernel) formulation could delete that sort,
  * but the LmGateStageProbe discipline says name the seconds first.
  *
  * Stages (noop-forced, min of 2):
  *
  *  - `words_sec`: posexplode to (doc, chars, pos, wordhash, wordlen)
  *    rows — the pre-window scan work;
  *  - `led_sec`: the same frame + the 18 `lead` columns over
  *    Window.partitionBy(doc).orderBy(pos) — `led_sec - words_sec`
  *    isolates the window sort + shuffle;
  *  - `counts_sec`: through the gram-key fold + explode + first keyed
  *    agg to (doc, n, gram) counts;
  *  - `prod_noop_sec` / `prod_count_sec`: production end to end.
  *
  * The inline stage frames replicate the production internals verbatim
  * (same fold, same explode) so the attribution reflects the real plan.
  *
  * args: sfDir
  */
object GopherRepStageProbe {
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
    import org.apache.spark.sql.expressions.Window
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

    // ---- production internals, replicated verbatim ----
    val ns = (2 to 10).toSeq
    val maxN = 10
    def mkWords = docs
      .select(col("doc_id"), length(col("text")).cast("long").as("__chars"),
        posexplode(LlmOps.words(col("text"))).as(Seq("__pos", "__w")))
      .select(col("doc_id"), col("__chars"), col("__pos"),
        LlmOps.strHash(col("__w")).as("__wh"),
        length(col("__w")).cast("long").as("__wl"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("__pos"))
    val leadCols = (1 until maxN).flatMap(k => Seq(
      lead(col("__wh"), k).over(win).as(s"__h$k"),
      lead(col("__wl"), k).over(win).as(s"__l$k")))
    def mkLed = mkWords.select(
      Seq(col("doc_id"), col("__chars"), col("__wh"), col("__wl")) ++
        leadCols: _*)
    def ghash(n: Int): Column = (1 until n).foldLeft(col("__wh"))(
      (acc, k) => (acc * 31L + col(s"__h$k")) % LlmOps.HashP)
    def glen(n: Int): Column = (1 until n).foldLeft(col("__wl"))(
      (acc, k) => acc + col(s"__l$k")) + lit((n - 1).toLong)
    val gramArr = array(ns.map { n =>
      when(col(s"__h${n - 1}").isNotNull,
        struct(lit(n).as("n"), ghash(n).as("h"), glen(n).as("l")))
    }: _*)
    def mkCounts = mkLed
      .select(col("doc_id"), col("__chars"),
        explode(filter(gramArr, x => x.isNotNull)).as("__g"))
      .select(col("doc_id"), col("__chars"), col("__g.n").as("__n"),
        col("__g.h").as("__h"), col("__g.l").as("__l0"))
      .groupBy(col("doc_id"), col("__chars"), col("__n"), col("__h"))
      .agg(count(lit(1)).as("__c"), max(col("__l0")).as("__l"))

    val wordsSec = timed2("gopher_rep: word frame (pre-window)")(noop(mkWords))
    val ledSec = timed2("gopher_rep: word frame + 18-lead window")(noop(mkLed))
    val countsSec = timed2("gopher_rep: through (doc,n,gram) counts")(
      noop(mkCounts))

    // ---- full relational twin (the pre-r20 shape, end to end) ----
    val topThresholds = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
    val dupThresholds = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13, 8 -> 0.12,
      9 -> 0.11, 10 -> 0.10)
    def mkRelational: DataFrame = {
      val base = docs.select(col("doc_id"),
        length(col("text")).cast("long").as("__chars"))
      val cov = col("__c") * col("__l")
      val perN = mkCounts
        .groupBy(col("doc_id"), col("__chars"), col("__n"))
        .agg(max(cov).as("__top"),
          sum(when(col("__c") >= 2, cov)).as("__dup"))
      val aggs: Seq[Column] =
        topThresholds.keys.toSeq.sorted.map(n =>
          coalesce(max(when(col("__n") === n, col("__top"))), lit(0L))
            .as(s"__top_$n")) ++
          dupThresholds.keys.toSeq.sorted.map(n =>
            coalesce(max(when(col("__n") === n, col("__dup"))), lit(0L))
              .as(s"__dup_$n"))
      val perDoc = perN.groupBy(col("doc_id"), col("__chars"))
        .agg(aggs.head, aggs.tail: _*)
      val chars = col("__chars").cast("double")
      val fracs =
        topThresholds.keys.toSeq.sorted.map(n =>
          (s"top_${n}gram_frac", s"__top_$n", topThresholds(n))) ++
          dupThresholds.keys.toSeq.sorted.map(n =>
            (s"dup_${n}gram_frac", s"__dup_$n", dupThresholds(n)))
      val keep = fracs.map { case (_, c, th) => col(c) / chars <= th }
        .reduce(_ && _)
      def renderedFrac(c: String): Column =
        when(col("__chars") > 0,
          expr(s"CAST((2000000 * $c + __chars) DIV (2 * __chars) AS DOUBLE)")
            / lit(1e6))
          .otherwise(round(col(c) / chars, 6))
      base.select(col("doc_id"), col("__chars"))
        .join(perDoc.drop("__chars"), Seq("doc_id"), "left")
        .na.fill(0L, (2 to 10).flatMap(n => Seq(s"__top_$n", s"__dup_$n"))
          .filter(perDoc.columns.contains))
        .select(col("doc_id") +:
          fracs.map { case (name, c, _) => renderedFrac(c).as(name) } :+
          coalesce(keep, lit(false)).as("keep"): _*)
    }
    val relationalSec = timed2("gopher_rep: relational form e2e (noop)")(
      noop(mkRelational))

    def prod = TextOps.gopherRepetition(docs, "doc_id", "text")
    val prodNoopSec = timed2("gopher_rep: production (noop)")(noop(prod))
    val prodCountSec = timed2("gopher_rep: production (count)") {
      prod.count(); ()
    }

    // order-free output checksum (for any later restructure to match):
    // count, Σkeep, Σ over all 9 fraction columns of round(frac·1e6)
    val fracCols = Seq("top_2gram_frac", "top_3gram_frac", "top_4gram_frac",
      "dup_5gram_frac", "dup_6gram_frac", "dup_7gram_frac",
      "dup_8gram_frac", "dup_9gram_frac", "dup_10gram_frac")
    def chk(d: DataFrame): String = {
      val fsum = fracCols.map(c => round(col(c) * 1e6).cast("long"))
        .reduce(_ + _)
      val r = d.agg(count(lit(1)), sum(col("keep").cast("long")),
        sum(fsum)).head()
      s"${r.getLong(0)}/${r.getLong(1)}/${if (r.isNullAt(2)) 0L else r.getLong(2)}"
    }
    val prodChk = chk(prod)
    val relationalChk = chk(mkRelational)

    println(
      s"""{"probe":"gopher_rep_stages","dir":"$dir","n_docs":$nDocs,""" +
        s""""words_sec":$wordsSec,"led_sec":$ledSec,"counts_sec":$countsSec,""" +
        s""""relational_e2e_sec":$relationalSec,""" +
        s""""prod_noop_sec":$prodNoopSec,"prod_count_sec":$prodCountSec,""" +
        s""""prod_chk":"$prodChk","relational_chk":"$relationalChk",""" +
        s""""chk_equal":${prodChk == relationalChk}}""")
    spark.stop()
  }
}
