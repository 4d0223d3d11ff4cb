package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.LlmOps

/** Measurement probe (VERDICT r10 #6): large-star/small-star connected
  * components (Kiveris et al., "Connected Components in MapReduce and
  * Beyond") vs the engine's pointer-jumping [[LlmOps.dedupGroups]], on
  * the REAL MinHash pair graph, interleaved min-of-2. The probe decides
  * keep/switch by measurement — the engine plan is not churned without
  * the number.
  *
  * Both variants run under the same discipline the production loop
  * uses: the pair graph is pinned ONCE (localCheckpoint) so both
  * consume identical materialized edges and neither pays the MinHash
  * pipeline; the star loop gets the same loop-scoped child session
  * (static planning, edge-proportional shuffle width) so the
  * comparison measures the ALGORITHM, not AQE job-scheduling overhead.
  *
  * Star CC, per round: large-star connects every neighbor larger than
  * u to m(u) = min(Γ(u) ∪ {u}); small-star orients edges
  * larger→smaller and connects each neighbor (and u itself) to the
  * minimum. Rounds repeat until the edge multiset is stable (count +
  * order-independent hash sum); at the fixpoint the edges are stars
  * (node → component min), which IS the labeling. */
object CcProbe {

  /** Large-star/small-star CC over symmetric `pairs` (doc_a, doc_b):
    * returns (id, label) for every edge-connected node. */
  def starLabels(sess: SparkSession, pairs: DataFrame,
      maxIters: Int = 25): DataFrame = {
    val edges0 = pairs
      .select(col("doc_a").as("u"), col("doc_b").as("v"))
      .filter(col("u") =!= col("v"))
      .localCheckpoint(false)
    val edgeCount = edges0.count()
    val defParts = sess.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val loopParts = math.min(defParts.toLong,
      math.max(4L, edgeCount / 2000000L + 1L))
    val loopSess = sess.newSession()
    loopSess.conf.set("spark.sql.adaptive.enabled", "false")
    loopSess.conf.set("spark.sql.shuffle.partitions", loopParts.toString)

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(explode(array(
        struct(col("u").as("a"), col("v").as("b")),
        struct(col("v").as("a"), col("u").as("b")))).as("s"))
        .select(col("s.a").as("u"), col("s.b").as("v"))
      val mins = sym.groupBy("u").agg(min("v").as("nm"))
        .select(col("u"), least(col("u"), col("nm")).as("m"))
      sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val or = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = or.groupBy("u").agg(min("v").as("m"))
      or.join(mins, "u")
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("s"))
        .select(col("s.a").as("u"), col("s.b").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var edges = org.apache.spark.sql.graftbridge.DatasetBridge
      .rehost(edges0, loopSess)
    var edgesCp = edges
    def signature(e: DataFrame): (Long, Long) = {
      // mod-reduced terms keep the order-independent sum inside long
      // range under ANSI arithmetic
      val r = e.agg(count(lit(1)),
        sum(pmod(xxhash64(col("u"), col("v")), lit(1000000007L)))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var sig = (-1L, 0L)
    var converged = false
    var iter = 0
    try {
      while (!converged && iter < maxIters) {
        val next = smallStar(largeStar(edges)).localCheckpoint(false)
        val nextSig = signature(next)
        LlmOps.releaseCheckpoint(edgesCp)
        edgesCp = next
        edges = next
        converged = nextSig == sig
        sig = nextSig
        iter += 1
      }
      if (!converged)
        throw new IllegalStateException(
          s"star CC did not converge within $maxIters rounds")
    } catch { case t: Throwable =>
      LlmOps.releaseCheckpoint(edgesCp)
      LlmOps.releaseCheckpoint(edges0)
      throw t
    }
    LlmOps.releaseCheckpoint(edges0)
    // at the fixpoint edges are (node, component-min) stars; roots only
    // ever appear on the v side — they label themselves
    val back = org.apache.spark.sql.graftbridge.DatasetBridge
      .rehost(edgesCp, sess)
    val memberLabels = back.groupBy(col("u").as("id"))
      .agg(min("v").as("label"))
    val roots = back.select(col("v").as("id")).distinct()
      .join(memberLabels.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("label"))
    memberLabels.union(roots)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.t(spark, sfDir, "documents")
    // pin the pair graph once — the probe measures the CC loops only
    val pairs = LlmOps.minHashCandidatePairs(docs, "doc_id", "text")
      .localCheckpoint(true)
    val nPairs = pairs.count()
    val ids = docs.select("doc_id").localCheckpoint(true)
    val nDocs = ids.count()

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val pj = scala.collection.mutable.ArrayBuffer[Double]()
    val st = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { _ =>
      // interleaved: host-state drift hits both variants equally
      pj += time(LlmOps.dedupGroups(ids, "doc_id", pairs).count())._1
      st += time(starLabels(spark, pairs).count())._1
    }
    // agreement check on the edge-connected set (dedupGroups additionally
    // labels isolated docs with themselves; the star variant labels only
    // edge-connected nodes — compare on the intersection)
    val a = LlmOps.dedupGroups(ids, "doc_id", pairs)
      .select(col("doc_id").as("id"), col("canonical_id").as("la"))
    val b = starLabels(spark, pairs).select(col("id"), col("label").as("lb"))
    val joined = a.join(b, Seq("id"))
    val nCompared = joined.count()
    val nDisagree = joined.filter(col("la") =!= col("lb")).count()
    val json =
      s"""{"probe":"cc_large_small_star_vs_pointer_jumping","sf":"$sfDir",""" +
      s""""n_docs":$nDocs,"n_pairs":$nPairs,""" +
      s""""pointer_jumping_s":[${pj.map(x => f"$x%.3f").mkString(",")}],""" +
      s""""large_small_star_s":[${st.map(x => f"$x%.3f").mkString(",")}],""" +
      s""""pointer_jumping_min_s":${f"${pj.min}%.3f"},""" +
      s""""large_small_star_min_s":${f"${st.min}%.3f"},""" +
      s""""labels_compared":$nCompared,"labels_disagree":$nDisagree}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT",
      java.nio.file.Paths.get("bench_r11_cc_probe.json").toAbsolutePath.toString)
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"ccprobe: could not write $out: $e") }
    spark.stop()
  }
}
