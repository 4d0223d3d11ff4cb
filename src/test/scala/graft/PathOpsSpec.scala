package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ops

/** P2/P3/P4 path-extraction edge table — mirrors the reference's
  * inline suite (src/core/contextual_pipeline.rs:1291-1944): simple and
  * deep paths, array indices incl. negative and out-of-bounds, `[*]`
  * flat-map incl. empty arrays and missing fields. */
class PathOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val df = {
    val json = Seq(
      """{"id":1,"user":{"profile":{"name":"ada","age":36}},
         |"employees":[{"name":"e0"},{"name":"e1"},{"name":"e2"}],
         |"tags":["x","y","z"]}""".stripMargin.replace("\n", ""),
      """{"id":2,"user":{"profile":{"name":"bob"}},
         |"employees":[],"tags":[]}""".stripMargin.replace("\n", ""),
      """{"id":3,"user":{},"employees":[{"name":"solo"}],"tags":["only"]}"""
    )
    import spark.implicits._
    spark.read.json(spark.createDataset(json))
  }

  test("parsePath: fields, indices, negative, star") {
    import Ops._
    assert(parsePath("a.b.c") === Seq(Field("a"), Field("b"), Field("c")))
    assert(parsePath("emp[0].name") === Seq(Field("emp"), Index(0), Field("name")))
    assert(parsePath("emp[-1]") === Seq(Field("emp"), Index(-1)))
    assert(parsePath("emp[*].name") === Seq(Field("emp"), Star, Field("name")))
  }

  test("P2: deep nested path extraction; missing mid-path gives null") {
    val out = df.select(col("id"), Ops.pathCol("user.profile.name").as("n"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq((1L, "ada"), (2L, "bob"), (3L, null)))
  }

  test("P3: positive index, negative index, out-of-bounds gives null") {
    val out = df
      .select(col("id"),
        Ops.pathCol("employees[0].name").as("first"),
        Ops.pathCol("employees[-1].name").as("last"),
        Ops.pathCol("employees[5].name").as("oob"),
        Ops.pathCol("tags[1]").as("tag1"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
    assert(out.toSeq === Seq(
      (1L, "e0", "e2", null, "y"),
      (2L, null, null, null, null),
      (3L, "solo", "solo", null, null)))
  }

  test("P4: [*] projects field across array; empty array stays empty; bare arr[*] is the array") {
    val out = df
      .select(col("id"),
        Ops.pathCol("employees[*].name").as("names"),
        Ops.pathCol("tags[*]").as("allTags"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[String](2)))
    assert(out.toSeq === Seq(
      (1L, Seq("e0", "e1", "e2"), Seq("x", "y", "z")),
      (2L, Seq(), Seq()),
      (3L, Seq("solo"), Seq("only"))))
  }

  test("extractPaths: extracted columns are ADDED, source columns kept (reference semantics)") {
    val out = Ops.extractPaths(Map("user.profile.name" -> "full_name"))(df)
    assert(out.columns.contains("full_name") && out.columns.contains("user"))
  }

  test("pathCol rejects paths not starting with a field") {
    intercept[IllegalArgumentException](Ops.pathCol("[0].x"))
  }
}
