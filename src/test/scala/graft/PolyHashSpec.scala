package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** Native PolyHash expression: equivalence with the SQL-composable fold
  * it replaced, null semantics, codegen participation, and SQL-surface
  * registration via GraftExtensions. */
class PolyHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The original HOF form (and the DuckDB oracle's semantics). */
  private def referenceHash(c: org.apache.spark.sql.Column) =
    aggregate(
      filter(split(c, ""), ch => length(ch) > 0),
      lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch).cast("long")) % LlmOps.HashP)

  test("matches the aggregate(split(...)) fold on corpus-like strings") {
    val df = Seq("", "a", "hello world", "The quick brown fox!",
      "tabs\tand\nnewlines", "ünïcödé tëxt").toDF("s")
    val out = df.select(
      LlmOps.strHash(col("s")).as("native"),
      referenceHash(col("s")).as("ref")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("null input hashes to null; empty string hashes to 0") {
    val df = Seq(Some("x"), None, Some("")).toDF("s")
    val rows = df.select(LlmOps.strHash(col("s"))).collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
    assert(rows(2).getLong(0) === 0L)
  }

  test("stays inside WholeStageCodegen (no interpreted fallback)") {
    // non-literal input, or constant folding evaluates the hash at
    // plan time (which itself proves the interpreted eval path works)
    val plan = spark.range(10)
      .select(LlmOps.strHash(concat(lit("s"), col("id"))).as("h"))
      .filter(col("h") > 0)
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string;
    // both the Project and the Filter carrying the hash must be starred
    assert(plan.linesIterator.filter(_.contains("graft_polyhash"))
      .forall(_.contains("*(")), s"hash outside codegen:\n$plan")
  }

  test("GraftExtensions registers graft_polyhash for SQL use") {
    // getOrCreate returns the existing default session (ignoring
    // extensions), so detach it first; a fresh session then builds on
    // the SAME SparkContext with the extensions applied. No stop() —
    // that would stop the shared context and kill later suites.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val v = s2.sql("SELECT graft_polyhash('hello world') AS h")
        .collect()(0).getLong(0)
      val expect = spark.range(1)
        .select(LlmOps.strHash(lit("hello world"))).collect()(0).getLong(0)
      assert(v === expect)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
