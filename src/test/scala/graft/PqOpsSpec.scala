package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native PqEncode / PqAdc expressions: bit-equivalence with the
  * higher-order-function forms they replaced (the interpreted argmin
  * that burned ~3000 s/partition at the sf10 probe), argmin tie-break,
  * grouped-fold float ordering, and null/shape semantics. */
class PqOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def encode(e: Column, cbFlat: Column, m: Int, sub: Int): Column =
    ColumnBridge.column(graft.functions.PqEncode(
      ColumnBridge.expression(e), ColumnBridge.expression(cbFlat), m, sub))

  private def adc(tab: Column, code: Column): Column =
    ColumnBridge.column(graft.functions.PqAdc(
      ColumnBridge.expression(tab), ColumnBridge.expression(code)))

  /** The HOF argmin/self-dot PqEncode replaced — the DuckDB oracle's
    * semantics (subspace folds close before the outer fold adds them). */
  private def refEncode(e: Column, cb: Column, m: Int, sub: Int)
      : (Column, Column) = {
    def subL2(x: Column, y: Column, j: Column): Column =
      aggregate(sequence(lit(0), lit(sub - 1)), lit(0.0),
        (acc, i) => {
          val d = element_at(x, (j * sub + i + 1).cast("int")) -
            element_at(y, (j * sub + i + 1).cast("int"))
          acc + d * d
        })
    def subDot(x: Column, y: Column, j: Column): Column =
      aggregate(sequence(lit(0), lit(sub - 1)), lit(0.0),
        (acc, i) => acc +
          element_at(x, (j * sub + i + 1).cast("int")) *
          element_at(y, (j * sub + i + 1).cast("int")))
    def codeJ(j: Column): Column =
      aggregate(cb,
        struct(lit(Double.MaxValue).as("d"), lit(0).as("best"), lit(0).as("i")),
        (acc, c) => {
          val d = subL2(e, c.getField("ce"), j)
          val i = acc.getField("i") + 1
          when(d < acc.getField("d"), struct(d.as("d"), i.as("best"), i.as("i")))
            .otherwise(struct(acc.getField("d").as("d"),
              acc.getField("best").as("best"), i.as("i")))
        },
        acc => acc.getField("best"))
    val code = transform(sequence(lit(0), lit(m - 1)), codeJ(_))
    val anrm = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => {
        val ce = element_at(cb, element_at(code, (j + 1).cast("int")))
          .getField("ce")
        acc + subDot(ce, ce, j)
      })
    (code, anrm)
  }

  test("PqEncode: bit-identical codes and reconstruction norm vs the " +
    "HOF argmin, including order-sensitive float sums") {
    val cents = Seq(
      (0L, Seq(1.0, 0.0, 1e16, 1.0)),
      (1L, Seq(0.7, 0.7, -1e16, 1.0)),
      (2L, Seq(0.1, 0.9, 3.0, 0.1)))
    val df = Seq(
      Seq(1.0, 0.05, 1e16, 1.0),
      Seq(0.5, 0.8, 2.9, 0.2),
      Seq(0.7, 0.7, -1e16, 0.99))
      .toDF("e")
      .withColumn("cb", typedLit(cents).cast(
        "array<struct<cid:bigint,ce:array<double>>>"))
    val cbFlat = flatten(transform(col("cb"), c => c.getField("ce")))
    val (refCode, refAnrm) = refEncode(col("e"), col("cb"), 2, 2)
    val rows = df.select(
      encode(col("e"), cbFlat, 2, 2).as("n"),
      refCode.as("rc"), refAnrm.as("ra")).collect()
    rows.foreach { r =>
      val n = r.getStruct(0)
      assert(n.getSeq[Int](0) === r.getSeq[Int](1),
        s"codes differ: $r")
      assert(java.lang.Double.doubleToLongBits(n.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"anrm differs: $r")
    }
  }

  test("PqEncode: exact-tie argmin keeps the earliest rank") {
    // two identical centroids: both subspaces must pick rank 1
    val cents = Seq((0L, Seq(2.0, 2.0)), (1L, Seq(2.0, 2.0)))
    val df = Seq(Seq(5.0, 5.0)).toDF("e")
      .withColumn("cb", typedLit(cents).cast(
        "array<struct<cid:bigint,ce:array<double>>>"))
    val cbFlat = flatten(transform(col("cb"), c => c.getField("ce")))
    val out = df.select(encode(col("e"), cbFlat, 2, 1)).collect()(0)
      .getStruct(0)
    assert(out.getSeq[Int](0) === Seq(1, 1))
  }

  test("PqEncode null/shape semantics: null array, null element, or a " +
    "codebook not divisible into centroids gives null") {
    val good = Seq(1.0, 2.0)
    val df = Seq(
      (Some(good), Some(Seq(1.0, 1.0, 2.0, 2.0))),
      (None, Some(Seq(1.0, 1.0))),
      (Some(good), None),
      (Some(good), Some(Seq(1.0, 1.0, 2.0)))) // 3 doubles, dims=2
      .toDF("e", "cbf")
    val rows = df.select(encode(col("e"), col("cbf"), 2, 1)).collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0) && rows(3).isNullAt(0))
  }

  test("PqAdc: bit-identical to the fold of table lookups; bad code " +
    "index or shape gives null; codegen participates") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0, 10.0, 20.0, 30.0), Seq(2, 3)), // 1·3+2-1=... j0:tab[1]=2.0; j1:tab[3+2]=30.0
      (Seq(1e16, 1.0, -1e16, 1.0), Seq(1, 2)),
      (Seq(1.0, 2.0), Seq(3)),       // code out of range
      (Seq(1.0, 2.0, 3.0), Seq(1, 2))) // 3 % 2 != 0
      .toDF("tab", "code")
    val refFold = (m: Int) => aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => acc + element_at(col("tab"),
        (j * (size(col("tab")) / m).cast("int") +
          element_at(col("code"), (j + 1).cast("int"))).cast("int")))
    val rows = df.select(adc(col("tab"), col("code")).as("n")).collect()
    assert(rows(0).getDouble(0) === 32.0)
    assert(java.lang.Double.doubleToLongBits(rows(1).getDouble(0)) ===
      java.lang.Double.doubleToLongBits((0.0 + 1e16) + 1.0))
    assert(rows(2).isNullAt(0))
    assert(rows(3).isNullAt(0))
    val q = spark.range(4)
      .select(array(lit(1.0), col("id").cast("double")).as("tab"),
        array(lit(1)).as("code"))
      .select(adc(col("tab"), col("code")).as("d"))
    // the `*(n)` prefix marks a WholeStageCodegen stage in the compact
    // plan rendering: the Project evaluating graft_pq_adc must carry it
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_pq_adc") && l.trim.startsWith("*(")), plan)
    assert(q.collect().map(_.getDouble(0)).toSeq === Seq(1.0, 1.0, 1.0, 1.0))
  }
}
