package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ScaleData

/** The scale-up generator must preserve per-replica structure (or the
  * scale proof it feeds measures data artifacts, not plans): FK
  * consistency, word multisets, embedding norms — while decorrelating
  * the similarity feature bases across replicas. */
class ScaleDataSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val srcDir = "/root/testdata/sf0.001"
  private lazy val outDir = {
    val d = java.nio.file.Files.createTempDirectory("graft_scale").toString
    ScaleData.scale(spark, srcDir, d, factor = 3)
    d
  }
  private def t(dir: String, n: String) =
    spark.read.parquet(s"$dir/$n.parquet")

  test("row counts: facts scale by the factor, fixed dims don't") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(t(outDir, n).count() === 3L * t(srcDir, n).count(), n)
    for (n <- Seq("region", "nation"))
      assert(t(outDir, n).count() === t(srcDir, n).count(), n)
  }

  test("foreign keys stay consistent: every scaled order resolves its " +
    "customer, every lineitem its order/part/supplier") {
    val o = t(outDir, "orders"); val c = t(outDir, "customer")
    assert(o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
      .count() === 0L, "dangling o_custkey")
    val l = t(outDir, "lineitem")
    assert(l.join(o, l("l_orderkey") === o("o_orderkey"), "left_anti")
      .count() === 0L, "dangling l_orderkey")
    assert(l.join(t(outDir, "part"),
      l("l_partkey") === col("p_partkey"), "left_anti").count() === 0L)
    assert(l.join(t(outDir, "supplier"),
      l("l_suppkey") === col("s_suppkey"), "left_anti").count() === 0L)
  }

  test("documents: replica 0 is byte-identical; replicas preserve token " +
    "counts, stopword counts and n_chars=length(text), while both the " +
    "unigram bag and the word order are decorrelated") {
    import graft.operators.{LlmOps, TextOps}
    val src = t(srcDir, "documents")
    val out = t(outDir, "documents")
    val stride = src.agg(max($"doc_id")).head.getLong(0) + 1L
    // replica 0 byte-identical
    assert(out.filter($"doc_id" < stride).exceptAll(src).count() === 0L)
    // n_chars invariant holds everywhere
    assert(out.filter($"n_chars" =!= length($"text")).count() === 0L)
    val r1 = out.filter($"doc_id" >= stride && $"doc_id" < 2 * stride)
      .select(($"doc_id" - stride).as("doc_id"), $"text".as("text1"))
    def stopCount(c: org.apache.spark.sql.Column) =
      size(filter(LlmOps.words(c),
        w => array_contains(typedLit(TextOps.StopEn ++ TextOps.StopDe ++
          TextOps.StopEs ++ TextOps.StopFr), w)))
    val joined = src.select($"doc_id", $"text").join(r1, "doc_id").cache()
    // statistics the curation operators key on are preserved per doc
    assert(joined.filter(
      size(split($"text", " ")) =!= size(split($"text1", " "))).count() === 0L,
      "token count must be preserved")
    assert(joined.filter(
      stopCount($"text") =!= stopCount($"text1")).count() === 0L,
      "stopword counts (language-ID feature base) must be preserved")
    // suffix strips back to the original multiset (1:1 word rewrite)
    assert(joined.filter(not(
      array_sort(transform(split($"text1", " "),
        w => regexp_replace(w, "xr1$", ""))) <=>
        array_sort(split($"text", " ")))).count() === 0L,
      "replica words must strip back to the source multiset")
    // unigram-bag decorrelation: docs with content words must NOT share
    // their full word bag with the source (SimHash would collide)
    val contentful = joined.filter(
      size(split($"text", " ")) - stopCount($"text") > 0)
    assert(contentful.filter(
      array_sort(split($"text", " ")) <=> array_sort(split($"text1", " ")))
      .count() === 0L,
      "content-word bags must differ across replicas")
    joined.unpersist()
  }

  test("embeddings: replica copies preserve the norm exactly (rotation) " +
    "and replica 0 is identical") {
    val src = t(srcDir, "embeddings")
    val out = t(outDir, "embeddings")
    val stride = src.agg(max($"vec_id")).head.getLong(0) + 1L
    def nrm(c: org.apache.spark.sql.Column) =
      aggregate(transform(c, x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, x) => a + x)
    val r2 = out.filter($"vec_id" >= 2 * stride)
      .select(($"vec_id" - 2 * stride).as("vec_id"),
        $"embedding".as("e2"))
    val both = src.select($"vec_id", $"embedding").join(r2, "vec_id")
    // rotation: same multiset of components -> identical sorted arrays
    assert(both.filter(not(
      array_sort($"embedding") <=> array_sort($"e2"))).count() === 0L)
    assert(both.filter(
      abs(nrm($"embedding") - nrm($"e2")) > 1e-9).count() === 0L)
    assert(out.filter($"vec_id" < stride)
      .exceptAll(src).count() === 0L, "replica 0 must be identical")
  }
}
