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

  /** Flagship: the training-data curation chain the engine exists for —
    * reference-parity row shaping (P1 rename, X1 clean_text, F filter)
    * fused with the round-2 curation operators (language ID, quality
    * scoring, exact-dedup fingerprints) in one declarative plan.
    * Driver smoke-checks rows > 0 on sf0.001. */
  def entry(spark: SparkSession): DataFrame = {
    import graft.operators.TextOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val shaped = Ops.cleanText(
      Ops.rename(Map("source" -> "origin"))(docs))
    // exact dedup: keep the min-id representative of each fingerprint
    val reps = Ops.dedupFields(Seq("fp"), Seq(col("doc_id")))(
      TextOps.fingerprints(shaped, "doc_id", "text"))
      .select("doc_id", "fp")
    shaped
      .withColumn("lang_pred", TextOps.langId(col("text")))
      .withColumn("quality", round(TextOps.qualityScore(col("text")), 6))
      .filter(col("quality") >= 0.2)
      .join(reps, Seq("doc_id"))
      .select("doc_id", "origin", "lang", "lang_pred", "quality", "fp")
      .orderBy("doc_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(o => d.name -> o)).toMap
}
