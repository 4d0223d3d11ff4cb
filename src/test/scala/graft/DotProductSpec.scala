package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LlmOps

/** Native DotProduct expression: bit-equivalence with the
  * aggregate(zip_with(...)) fold it replaced, null semantics (null
  * array / null element / length mismatch → null), and codegen
  * participation. */
class DotProductSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The original HOF form (and the DuckDB oracle's semantics). */
  private def referenceDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the zip_with + aggregate fold, including " +
    "catastrophic-cancellation-ordering cases") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq.empty[Double], Seq.empty[Double]),
      (Seq(1e16, 1.0, -1e16), Seq(1.0, 1.0, 1.0)), // order-sensitive sum
      (Seq(0.1, 0.2, 0.3, 0.7), Seq(0.9, 0.8, 0.7, 0.3)))
      .toDF("a", "b")
    val out = df.select(
      LlmOps.dot(col("a"), col("b")).as("native"),
      referenceDot(col("a"), col("b")).as("ref")).collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"native ${r.getDouble(0)} != reference ${r.getDouble(1)}")
    }
  }

  test("null semantics mirror zip_with: null array, null element, or " +
    "mismatched lengths give null") {
    val df = Seq(
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),
      (None, Some(Seq(Some(1.0)))),                      // null array
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(1.0), Some(2.0)))), // null elem
      (Some(Seq(Some(1.0))), Some(Seq(Some(1.0), Some(2.0))))) // length mismatch
      .toDF("a", "b")
    val rows = df.select(LlmOps.dot(col("a"), col("b"))).collect()
    assert(rows(0).getDouble(0) === 11.0)
    assert(rows(1).isNullAt(0))
    assert(rows(2).isNullAt(0))
    assert(rows(3).isNullAt(0))
  }

  test("stays inside WholeStageCodegen (no interpreted fallback)") {
    // non-literal input so ConvertToLocalRelation can't fold the plan
    // into a LocalTableScan
    val q = spark.range(10)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"),
        array(lit(3.0), col("id").cast("double")).as("b"))
      .select(LlmOps.dot(col("a"), col("b")).as("d"))
      .filter(col("d") >= 0)
    val plan = q.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(plan.linesIterator.filter(_.contains("graft_dot"))
      .forall(_.contains("*(")), s"dot outside codegen:\n$plan")
    assert(plan.contains("graft_dot"), s"expression missing:\n$plan")
    assert(q.count() === 10)
  }

  test("GraftExtensions registers graft_dot for SQL use") {
    // same session dance as the graft_polyhash registration test:
    // detach the shared default session, rebuild on the same context
    // with extensions, restore after
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val v = s2.sql(
        "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect()(0).getDouble(0)
      assert(v === 11.0)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }
}
