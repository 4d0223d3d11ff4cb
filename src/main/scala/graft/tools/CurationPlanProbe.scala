package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{LlmOps, TextOps}

/** Plan + wall-clock probe for the streaming-curation composition: how
  * many times does the C4 reassembly (`array_join(transform(...))`)
  * appear in the optimized plan, and what does each shaping variant
  * cost? The pin-before-gate discipline (llm_curation2_e2e) is batch-
  * only — this probe measures what the STREAMING-legal shapes pay.
  *
  * args: sfDir
  */
object CurationPlanProbe {
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
    val weights = (0 until 1024).map(i =>
      i.toLong -> ((i.toLong * 1103515245L + 12345L) % 2001L - 1000L)).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("ts", timestamp_seconds(lit(1704067200L) + col("doc_id")))

    def reassemblies(df: DataFrame): Int = {
      val p = df.queryExecution.optimizedPlan.toString
      "array_join\\(transform\\(".r.findAllIn(p).length
    }
    def timed(label: String, df: DataFrame): Unit = {
      val n = reassemblies(df)
      val t0 = System.nanoTime()
      val c = df.count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"""{"variant":"$label","reassemblies":$n,"rows":$c,"sec":$t%.2f}""")
    }

    // A: the shipped composition (filters chained after c4Clean)
    timed("chained_filters", graft.streaming.Streams.curationIngest(
      docs, "doc_id", "text", "ts", weights, nBuckets = 1024,
      minScore = 0.5, minWords = 40, minStopwords = 1))

    // C: flags computed in one select over the cleaning projection,
    // single trailing filter — does modern CollapseProject's cost
    // guard save us without a barrier?
    locally {
      val cleaned = TextOps.c4Clean(docs, "doc_id", "text",
        carry = Seq("ts"))
      val flagged = cleaned.select(col("doc_id"), col("ts"), col("n_kept"),
        col("text_clean"),
        TextOps.gopherKeep(col("text_clean"),
          minWords = 40, minStopwords = 1).as("__keep"),
        TextOps.classifierScoreRow(col("text_clean"),
          weights, 1024, 1000.0, 0.0).as("__c"),
        LlmOps.strHash(regexp_replace(trim(lower(col("text_clean"))),
          "\\s+", " ")).as("fp"))
      val gated = flagged.filter(col("__keep") && col("__c.w_sum") >= 0)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp").orderBy(col("ts"), col("doc_id"))
      timed("one_select_flags", gated
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"))
    }

    // D: streaming-legal pushdown barrier — a NON-DETERMINISTIC dummy
    // column in the cleaning projection blocks PushPredicateThroughNonJoin
    // (it only pushes through all-deterministic projections)
    locally {
      val cleaned = TextOps.c4Clean(docs, "doc_id", "text",
        carry = Seq("ts"))
        .withColumn("__barrier", spark_partition_id())
      val gated = cleaned
        .filter(TextOps.gopherKeep(col("text_clean"),
          minWords = 40, minStopwords = 1))
        .withColumn("__c", TextOps.classifierScoreRow(col("text_clean"),
          weights, 1024, 1000.0, 0.0))
        .filter(col("__c.w_sum") >= 0)
        .withColumn("fp", LlmOps.strHash(
          regexp_replace(trim(lower(col("text_clean"))), "\\s+", " ")))
        .drop("__barrier")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp").orderBy(col("ts"), col("doc_id"))
      val full = gated
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("/tmp/curation_plan_d.txt"),
        full.queryExecution.optimizedPlan.toString.getBytes)
      timed("nondeterministic_barrier", full)
    }

    // E: typed map(identity) round-trip — an opaque-lambda barrier the
    // optimizer cannot push predicates through or collapse across;
    // legal on BOTH batch and streaming frames
    locally {
      val cleaned0 = TextOps.c4Clean(docs, "doc_id", "text",
        carry = Seq("ts"))
      val enc = org.apache.spark.sql.Encoders.row(cleaned0.schema)
      val cleaned = cleaned0.map(identity(_))(enc)
      val gated = cleaned
        .filter(TextOps.gopherKeep(col("text_clean"),
          minWords = 40, minStopwords = 1))
        .withColumn("__c", TextOps.classifierScoreRow(col("text_clean"),
          weights, 1024, 1000.0, 0.0))
        .filter(col("__c.w_sum") >= 0)
        .withColumn("fp", LlmOps.strHash(
          regexp_replace(trim(lower(col("text_clean"))), "\\s+", " ")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp").orderBy(col("ts"), col("doc_id"))
      timed("typed_barrier", gated
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"))
    }

    // B: batch pin after clean (curation2 discipline; batch-only)
    locally {
      val cleaned = TextOps.c4Clean(docs, "doc_id", "text",
        carry = Seq("ts")).localCheckpoint(true)
      val gated = cleaned
        .filter(TextOps.gopherKeep(col("text_clean"),
          minWords = 40, minStopwords = 1))
        .withColumn("__c", TextOps.classifierScoreRow(col("text_clean"),
          weights, 1024, 1000.0, 0.0))
        .filter(col("__c.w_sum") >= 0)
        .withColumn("fp", LlmOps.strHash(
          regexp_replace(trim(lower(col("text_clean"))), "\\s+", " ")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("fp").orderBy(col("ts"), col("doc_id"))
      timed("pinned_clean", gated
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"))
    }
    spark.stop()
  }
}
