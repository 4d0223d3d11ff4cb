package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.operators.{LlmOps, TextOps}

/** Native per-doc coverage kernel ([[graft.functions.GopherRepCoverage]])
  * vs the r13 relational form it replaced (posexplode + 18-lead window
  * + (doc, n, gram) hash agg): the FULL gopherRepetition output —
  * all nine rendered fractions plus keep — must be bit-identical on
  * every doc, including empty words from doubled spaces, unicode and
  * non-BMP words, single-word/empty/NULL texts, and heavy repetition.
  * The relational twin is what the DuckDB oracle replays, so equality
  * here carries the oracle-parity argument for `llm_gopher_rep` and
  * the curation riders. */
class GopherRepCoverageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val topThresholds = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  private val dupThresholds = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13,
    8 -> 0.12, 9 -> 0.11, 10 -> 0.10)

  /** The pre-r20 relational pipeline, verbatim. */
  private def relational(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ns = (topThresholds.keySet ++ dupThresholds.keySet).toSeq.sorted
    val maxN = ns.max
    val base = df.select(col("doc_id"),
      length(col("text")).cast("long").as("__chars"))
    val wordsF = df
      .select(col("doc_id"), length(col("text")).cast("long").as("__chars"),
        posexplode(LlmOps.words(col("text"))).as(Seq("__pos", "__w")))
      .select(col("doc_id"), col("__chars"), col("__pos"),
        LlmOps.strHash(col("__w")).as("__wh"),
        length(col("__w")).cast("long").as("__wl"))
    val win = Window.partitionBy(col("doc_id")).orderBy(col("__pos"))
    val leadCols = (1 until maxN).flatMap(k => Seq(
      lead(col("__wh"), k).over(win).as(s"__h$k"),
      lead(col("__wl"), k).over(win).as(s"__l$k")))
    val led = wordsF.select(
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
    val counts = led
      .select(col("doc_id"), col("__chars"),
        explode(filter(gramArr, x => x.isNotNull)).as("__g"))
      .select(col("doc_id"), col("__chars"), col("__g.n").as("__n"),
        col("__g.h").as("__h"), col("__g.l").as("__l0"))
      .groupBy(col("doc_id"), col("__chars"), col("__n"), col("__h"))
      .agg(count(lit(1)).as("__c"), max(col("__l0")).as("__l"))
    val cov = col("__c") * col("__l")
    val perN = counts
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
      .na.fill(0L, ns.flatMap(n => Seq(s"__top_$n", s"__dup_$n"))
        .filter(perDoc.columns.contains))
      .select(col("doc_id") +:
        fracs.map { case (name, c, _) => renderedFrac(c).as(name) } :+
        coalesce(keep, lit(false)).as("keep"): _*)
  }

  private def bothEqual(df: DataFrame): Unit = {
    val a = TextOps.gopherRepetition(df, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val b = relational(df).orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("kernel equals relational form on crafted edge docs: repetition, " +
    "doubled spaces (empty words), unicode/non-BMP, tiny docs") {
    // (zero-char text is outside the operator's domain: the shared
    // fraction rendering divides by chars under ANSI — identically in
    // both forms, and in no declared corpus)
    bothEqual(Seq(
      (1L, "spam spam spam spam"),
      (2L, "a b c d e x a b c d e y"),
      (3L, "one"),
      (5L, "double  space  makes  empty  words  here  double  space"),
      (6L, "ünï こんにちは a😀b ünï こんにちは a😀b ünï こんにちは a😀b"),
      (7L, (1 to 25).map(i => s"w$i").mkString(" ")),
      (8L, Seq.fill(30)("x").mkString(" ")),
      (9L, "exactly ten words here to cover the max gram size"),
      (10L, "nine words only here to cover boundary gram sizes"))
      .toDF("doc_id", "text"))
  }

  test("kernel equals relational form on NULL text (NULL fractions, " +
    "keep=false, not NaN)") {
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(9L, null: String),
        org.apache.spark.sql.Row(1L, "spam spam spam spam")),
      new org.apache.spark.sql.types.StructType()
        .add("doc_id", "long").add("text", "string"))
    bothEqual(df)
  }

  test("kernel equals relational form on random docs (fixed seed, " +
    "property)") {
    val rng = new Random(20260819L)
    val vocab = Seq("the", "of", "and", "a", "b", "ünï", "😀", "xx",
      "yy", "zz", "")
    val docs = (1L to 64L).map { i =>
      val nw = rng.nextInt(40)
      // "end" guarantees chars > 0 (zero-char text is outside the
      // operator's ANSI domain, identically in both forms)
      (i, (Seq.fill(nw)(vocab(rng.nextInt(vocab.size))) :+ "end")
        .mkString(" "))
    }
    bothEqual(docs.toDF("doc_id", "text"))
  }

  test("kernel participates in whole-stage codegen (no interpreted " +
    "fallback on the hot path)") {
    // Range input — a local Seq would be constant-folded into a
    // LocalTableScan (which itself proves the kernel is foldable)
    val df = spark.range(4).select(col("id").as("doc_id"),
      concat(lit("a b c a b c x"), col("id")).as("text"))
    val plan = TextOps.gopherRepetition(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the "*(n)" operator prefix is executedPlan.toString's rendering
    // of WholeStageCodegen membership
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("graft_gopher_rep_coverage"), plan)
  }
}
