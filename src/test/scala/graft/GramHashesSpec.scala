package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

import graft.operators.LlmOps

/** Native rolling gram-hash kernels ([[graft.functions.GramHashes]],
  * [[graft.functions.BackoffGramHashes]]): bit-equality with the
  * composed `shinglesOf + strHash` / `concat_ws + strHash` forms they
  * replaced on the lmStupidBackoff and shingleHashes hot paths —
  * including empty words (doubled spaces in text), unicode/non-BMP
  * code points, and short arrays — plus codegen participation. The
  * composed forms are what the DuckDB oracle replays, so equality here
  * is what carries the oracle parity argument. */
class GramHashesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The r18 composed form: shingle strings then PolyHash. */
  private def composedGramHashes(ws: org.apache.spark.sql.Column, n: Int) =
    transform(LlmOps.shinglesOf(ws, n), s => LlmOps.strHash(s))

  /** Deterministic random docs: alphanumerics, empties, unicode and
    * non-BMP words (fixed seed — reproducible). */
  private def randomDocs(rng: Random, nDocs: Int): Seq[Seq[String]] = {
    val specials = Seq("", "the", "of", "ünïcödé", "漢字テキスト", "a😀b",
      "x'y\"z", "tab\tchar")
    Seq.fill(nDocs) {
      Seq.fill(rng.nextInt(13)) {
        if (rng.nextInt(3) == 0) specials(rng.nextInt(specials.size))
        else rng.alphanumeric.take(1 + rng.nextInt(11)).mkString
      }
    }
  }

  test("gramHashesOf equals composed shinglesOf+strHash for n=1..4") {
    val docs = Seq(
      Seq("a", "b", "c", "d"), Seq("hello"), Seq(), Seq("", "", ""),
      Seq("the", "quick", "brown", "fox", "jumps"),
      Seq("ünï", "こんにちは", "a😀b"), Seq("x", ""), Seq("", "y"))
    val df = docs.toDF("ws")
    (1 to 4).foreach { n =>
      val out = df.select(
        LlmOps.gramHashesOf(col("ws"), n).as("native"),
        composedGramHashes(col("ws"), n).as("ref")).collect()
      out.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n row=$r")
      }
    }
  }

  test("gramHashesOf equals composed form on random word arrays (property)") {
    val rng = new Random(20260819L)
    (1 to 8).foreach { _ =>
      val df = randomDocs(rng, 24).map(ws => Tuple1(ws)).toDF("ws")
      (1 to 3).foreach { n =>
        val out = df.select(
          LlmOps.gramHashesOf(col("ws"), n).as("native"),
          composedGramHashes(col("ws"), n).as("ref")).collect()
        out.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
      }
    }
  }

  test("backoffGramHashesOf equals the r18 five-string struct form") {
    def composedBackoff(ws: org.apache.spark.sql.Column) =
      transform(
        sequence(lit(0), size(ws) - 3),
        i => struct(
          LlmOps.strHash(concat_ws(" ", ws(i), ws(i + 1), ws(i + 2))).as("h3"),
          LlmOps.strHash(concat_ws(" ", ws(i), ws(i + 1))).as("h2c"),
          LlmOps.strHash(concat_ws(" ", ws(i + 1), ws(i + 2))).as("h2"),
          LlmOps.strHash(ws(i + 1)).as("h1c"),
          LlmOps.strHash(ws(i + 2)).as("h1")))
    val rng = new Random(424242L)
    (1 to 8).foreach { _ =>
      // the composed form indexes blindly, so only size >= 3 rows are
      // comparable (production filters size >= 3 before both forms)
      val df = randomDocs(rng, 24).filter(_.size >= 3)
        .map(ws => Tuple1(ws)).toDF("ws")
      val out = df.select(
        LlmOps.backoffGramHashesOf(col("ws")).as("native"),
        composedBackoff(col("ws")).as("ref")).collect()
      out.foreach { r =>
        val nat = r.getSeq[Row](0).map(x => (0 until 5).map(x.getLong))
        val ref = r.getSeq[Row](1).map(x => (0 until 5).map(x.getLong))
        assert(nat === ref)
      }
    }
  }

  test("short arrays produce empty probe output; null array is null") {
    val df = Seq(
      (1L, Some(Seq("a", "b"))), (2L, Some(Seq[String]())),
      (3L, None), (4L, Some(Seq("a", "b", "c")))).toDF("id", "ws")
    val rows = df.select(col("id"), LlmOps.backoffGramHashesOf(col("ws")))
      .collect().sortBy(_.getLong(0))
    assert(rows(0).getSeq[Row](1).isEmpty)
    assert(rows(1).getSeq[Row](1).isEmpty)
    assert(rows(2).isNullAt(1))
    assert(rows(3).getSeq[Row](1).size === 1)
  }

  test("kernels stay inside WholeStageCodegen (no interpreted fallback)") {
    val plan = spark.range(10)
      .select(split(concat(lit("a b c d"), col("id")), " ").as("ws"))
      .select(explode(LlmOps.gramHashesOf(col("ws"), 2)).as("h"))
      .filter(col("h") >= 0)
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.filter(_.contains("graft_gram_hashes"))
      .forall(_.contains("*(")), s"kernel outside codegen:\n$plan")
  }
}
