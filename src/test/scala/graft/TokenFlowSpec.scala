package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.engine.Orchestrator

/** C1+T3 golden flow — the reference's flagship integration test
  * (tests/auth_header_template_test.rs:94-156): pipeline A's intermediate
  * branch exports an auth token into shared data; pipeline B sends
  * `Authorization: Bearer {{token}}`, asserted by the stub server. */
class TokenFlowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeAuthFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_auth").toString
    import spark.implicits._
    val df = Seq(
      ("auth", "tok_sec_99", 1L),
      ("noise", "not_a_token", 2L)
    ).toDF("kind", "token", "id")
    df.write.mode("overwrite").json(s"$dir/auth.json")
    s"$dir/auth.json"
  }

  test("token exported by pipeline A reaches pipeline B's Authorization header") {
    val rec = new TestHttp.Recorded
    TestHttp.withServer(
      "/data" -> TestHttp.recording(rec, """[{"id":10,"v":"x"},{"id":11,"v":"y"}]""")
    ) { base =>
      val seq = SequenceDef(
        name = "auth-flow",
        executionOrder = Seq("auth", "fetch"),
        pipelines = Seq(
          PipelineDef(
            name = "auth",
            source = FileSource(writeAuthFixture(), "json"),
            transform = TransformDef(
              addProcessedFlags = false,
              intermediate = Some(IntermediateDef(
                conditions = Map("kind" -> "auth")))),
            load = None),
          PipelineDef(
            name = "fetch",
            source = ApiSource(HttpRequestDef(s"$base/data",
              headers = Map("Authorization" -> "Bearer {{token}}"))),
            extract = ExtractDef(onApiFailure = "fail"),
            transform = TransformDef(addProcessedFlags = false),
            load = None,
            conditions = ConditionsDef(whenPreviousSucceeded = true))))

      val ctx = Orchestrator.execute(spark, seq, executionId = "exec-token")
      // C1: only the row passing the F1 branch exports; token key wins
      assert(ctx.shared("token") === "tok_sec_99")
      // T3: the stub saw the templated header
      assert(rec.headers("Authorization") === "Bearer tok_sec_99")
      assert(ctx.results("fetch").status === "succeeded")
      assert(ctx.results("fetch").recordCount === 2)
    }
  }

  test("non-token fields export under '{shared_key}_{field}' (prefixed keys)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sh").toString
    import spark.implicits._
    Seq(("cfg", "eu-west", 7L)).toDF("kind", "region", "id")
      .write.mode("overwrite").json(s"$dir/cfg.json")
    val seq = SequenceDef(
      name = "shared-prefix",
      executionOrder = Seq("cfg"),
      pipelines = Seq(
        PipelineDef(
          name = "cfg",
          source = FileSource(s"$dir/cfg.json", "json"),
          transform = TransformDef(
            addProcessedFlags = false,
            intermediate = Some(IntermediateDef(
              conditions = Map("kind" -> "cfg"), sharedKey = "app"))))))
    val ctx = Orchestrator.execute(spark, seq)
    assert(ctx.shared("app_region") === "eu-west")
    assert(ctx.shared("app_id") === 7L)
    assert(ctx.shared("app_kind") === "cfg")
  }
}
