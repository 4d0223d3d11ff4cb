package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Ops
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every harness query (Spark plan + optional DuckDB oracle). */
  def allDefs: Seq[QDef] =
    CoreQueries.defs ++ LlmQueries.defs ++ TextQueries.defs ++ ExtQueries.defs

  /** Flagship: the SURVEY §7.5 minimum slice as one declarative chain —
    * parquet scan → rename P1 → filter (l_quantity > 20, mirroring the
    * reference's hardcoded F2 at simple_pipeline.rs:113-116) → dedup D2 →
    * sort O1 → limit F4. Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val renamed = Ops.rename(Map("l_orderkey" -> "order_id", "l_quantity" -> "qty"))(li)
    val filtered = renamed.filter(col("qty") > 20)
    val deduped = Ops.dedupFields(Seq("order_id"), Seq(col("qty").desc, col("l_linenumber")))(filtered)
    Ops.limitRows(1000)(Ops.sortBy("order_id")(deduped))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(o => d.name -> o)).toMap
}
