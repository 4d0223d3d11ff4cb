package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}

/** CANARY for the two deliberate Spark-private seams.
  *
  * graft reaches into `org.apache.spark.sql` package scope in exactly two
  * places (see the VERDICT-documented upgrade risk):
  *
  *   - `ColumnBridge` → `org.apache.spark.sql.classic.ExpressionUtils`
  *     (Expression ⇄ Column factory; Spark 4 sealed the public path)
  *   - `DatasetBridge` → `org.apache.spark.sql.classic.Dataset.ofRows` +
  *     `org.apache.spark.sql.execution.LogicalRDD.newInstance`
  *     (re-host a checkpoint-backed frame in a sibling session)
  *
  * These internals carry no compatibility promise. This suite exercises
  * every behavior graft depends on, with failure messages that name the
  * seam — if a Spark upgrade moves the internals, the FIRST failure a
  * maintainer sees says exactly which private API shifted, instead of a
  * downstream miscomputation in the CC loop. */
class BridgeCanarySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ColumnBridge: Expression -> Column -> Expression round-trips and " +
    "evaluates (seam: o.a.s.sql.classic.ExpressionUtils)") {
    import org.apache.spark.sql.catalyst.expressions.{Add, Literal}
    val col2 = ColumnBridge.column(Add(Literal(40), Literal(2)))
    val out = spark.range(1).select(col2.as("v")).head().getInt(0)
    assert(out === 42,
      "ExpressionUtils.column no longer wraps a raw Catalyst Expression " +
        "into an evaluable Column — the Spark-private Column factory moved")
    val back = ColumnBridge.expression(col2)
    assert(back.isInstanceOf[Add],
      s"ExpressionUtils.expression returned ${back.getClass.getName}, not " +
        "the original Add — the Column->Expression extractor moved")
  }

  test("ColumnBridge: the PolyHash custom Expression is usable without " +
    "function registration (the production use of the seam)") {
    val df = Seq("abc").toDF("s")
      .select(graft.operators.LlmOps.strHash(col("s")).as("h"))
    // acc = (acc*31 + ascii) % 1e9+7 over 'a','b','c'
    val expected = (((97L * 31) + 98) * 31 + 99) % 1000000007L
    assert(df.head().getLong(0) === expected,
      "strHash (PolyHash via ColumnBridge) stopped evaluating — the " +
        "Expression->Column bridge or codegen contract changed")
  }

  test("DatasetBridge.rehost: a checkpoint-backed frame re-plans in a " +
    "sibling session sharing the SparkContext and the SAME blocks " +
    "(seam: classic.Dataset.ofRows + LogicalRDD.newInstance)") {
    val src = spark.range(100).select(col("id"), (col("id") % 7).as("k"))
      .localCheckpoint(true)
    val sibling = spark.newSession()
    sibling.conf.set("spark.sql.shuffle.partitions", "2")
    val hosted = DatasetBridge.rehost(src.toDF(), sibling)
    assert(hosted.sparkSession eq sibling,
      "rehost did not bind the frame to the target session — " +
        "Dataset.ofRows session binding changed")
    assert(hosted.sparkSession.sparkContext eq spark.sparkContext,
      "sibling session no longer shares the SparkContext — newSession " +
        "semantics changed")
    // same materialized blocks: content identical, and the rehosted plan
    // is still a LogicalRDD scan (no recompute of the original lineage)
    assert(hosted.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      "rehosted plan is not a LogicalRDD scan — newInstance() now wraps " +
        "or rewrites the node")
    assert(TestSpark.rowsOf(hosted.orderBy("id"))
      === TestSpark.rowsOf(src.toDF().orderBy("id")),
      "rehosted frame read different rows than the source checkpoint — " +
        "LogicalRDD stopped being session-free")
    // attribute ids are refreshed, so joining the rehosted frame back
    // against a derivative of the ORIGINAL must not conflict
    val joined = hosted.join(src.toDF().select(col("id")), "id")
    assert(joined.count() === 100,
      "newInstance() no longer refreshes attribute ids — self-join " +
        "against the origin frame broke")
  }

  test("DatasetBridge.rehost: rejects non-checkpoint-backed frames with " +
    "a clear error (guards the LogicalRDD assumption)") {
    val plain = spark.range(10).toDF()
    val e = intercept[IllegalArgumentException] {
      DatasetBridge.rehost(plain, spark.newSession())
    }
    assert(e.getMessage.contains("checkpoint-backed"),
      "rehost's LogicalRDD guard changed its failure mode")
  }

  test("DatasetBridge.rehost: the re-hosted frame plans under the TARGET " +
    "session's conf (the loop-scoped-planning contract of the CC loop)") {
    val src = spark.range(1000).select((col("id") % 10).as("k"))
      .localCheckpoint(true)
    val sibling = spark.newSession()
    sibling.conf.set("spark.sql.shuffle.partitions", "3")
    sibling.conf.set("spark.sql.adaptive.enabled", "false")
    val agg = DatasetBridge.rehost(src.toDF(), sibling)
      .groupBy("k").count()
    val shuffles = agg.queryExecution.executedPlan.collect {
      case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => ex
    }
    assert(shuffles.nonEmpty, "expected a shuffle in the grouped plan")
    assert(shuffles.head.outputPartitioning.numPartitions === 3,
      "rehosted frame ignored the target session's shuffle width — " +
        "per-session SQLConf binding through Dataset.ofRows changed")
  }
}
