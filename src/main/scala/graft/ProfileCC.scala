package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch profiler for llm_dedup_groups phases (not part of the
  * harness contract). */
object ProfileCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def timed[A](label: String)(f: => A): A = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val a = f
      System.err.println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, ${jobs.get() - j0} jobs")
      a
    }
    import graft.operators.LlmOps
    val docs = graft.queries.Tables.t(spark, sfDir, "documents")
    timed("warmup full") {
      LlmOps.dedupGroups(docs, "doc_id",
        LlmOps.minHashCandidatePairs(docs, "doc_id", "text")).count()
    }
    timed("pairs count") {
      LlmOps.minHashCandidatePairs(docs, "doc_id", "text").count()
    }
    val pinned = timed("pairs pinned") {
      LlmOps.minHashCandidatePairs(docs, "doc_id", "text").localCheckpoint(true)
    }
    timed("cc over pinned") {
      LlmOps.dedupGroups(docs, "doc_id", pinned).count()
    }
    timed("full steady 1") {
      LlmOps.dedupGroups(docs, "doc_id",
        LlmOps.minHashCandidatePairs(docs, "doc_id", "text")).count()
    }
    timed("full steady 2") {
      LlmOps.dedupGroups(docs, "doc_id",
        LlmOps.minHashCandidatePairs(docs, "doc_id", "text")).count()
    }
    spark.stop()
  }
}
