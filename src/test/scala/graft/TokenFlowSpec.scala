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

  // ----- failure scenario (reference auth_integration_test.rs:354-458) -
  test("auth failure: token fetch 401 aborts under stop; " +
    "use_sample_data falls back to a sample token instead") {
    val rec = new TestHttp.Recorded
    TestHttp.withServer(
      "/auth/token" -> (TestHttp.respond(_, 401,
        """{"error":"invalid_client","error_description":"Client authentication failed"}""")),
      "/protected" -> TestHttp.recording(rec, """[{"id":1}]""")
    ) { base =>
      def seqWith(onApiFailure: String, sample: Seq[String]) = SequenceDef(
        name = "auth-failure",
        executionOrder = Seq("auth_token", "protected_api"),
        pipelines = Seq(
          PipelineDef(
            name = "auth_token",
            source = ApiSource(HttpRequestDef(s"$base/auth/token", method = "POST",
              payload = Some("""{"client_id": "invalid_client"}"""))),
            extract = ExtractDef(
              fieldMapping = Map("response.access_token" -> "access_token"),
              onApiFailure = onApiFailure, sampleData = sample),
            transform = TransformDef(addProcessedFlags = false,
              intermediate = Some(IntermediateDef()))),
          PipelineDef(
            name = "protected_api",
            source = ApiSource(HttpRequestDef(s"$base/protected",
              headers = Map("Authorization" -> "Bearer {{token}}"))),
            extract = ExtractDef(onApiFailure = "fail"),
            transform = TransformDef(addProcessedFlags = false))))

      // reference behavior: the 401 fails the pipeline and aborts the run
      val e = intercept[Orchestrator.SequenceFailed](
        Orchestrator.execute(spark, seqWith("fail", Nil)))
      assert(e.ctx.results("auth_token").status === "failed")
      assert(!e.ctx.results.contains("protected_api")) // never ran
      assert(rec.calls === 0) // no call without a token

      // S8 path: sample data stands in for the failed fetch and its
      // token flows into the next pipeline's Bearer header (sample
      // mirrors the wrapped object shape a real fetch would produce)
      val ctx = Orchestrator.execute(spark,
        seqWith("use_sample_data", Seq("""{"response":{"access_token":"sample_tok_1"}}""")))
      assert(ctx.results("auth_token").status === "succeeded")
      assert(ctx.shared("token") === "sample_tok_1")
      assert(rec.headers("Authorization") === "Bearer sample_tok_1")
    }
  }

  // ----- refresh scenario (reference auth_integration_test.rs:460-620) -
  test("token refresh mid-sequence: re-export overwrites shared token and " +
    "the next call carries the new Bearer") {
    val recData = new TestHttp.Recorded
    val recRefresh = new TestHttp.Recorded
    val recMore = new TestHttp.Recorded
    TestHttp.withServer(
      "/auth/token" -> (TestHttp.respond(_, 200, """{"access_token":"initial_token_123"}""")),
      "/data" -> TestHttp.recording(recData, """[{"data":"first_call"}]"""),
      "/auth/refresh" -> { ex =>
        recRefresh.synchronized {
          recRefresh.calls += 1
          val hs = ex.getRequestHeaders
          recRefresh.headers = hs.keySet().toArray(Array.empty[String])
            .map(k => k -> hs.getFirst(k)).toMap
        }
        TestHttp.respond(ex, 200, """{"access_token":"refreshed_token_456"}""")
      },
      "/more-data" -> TestHttp.recording(recMore, """[{"data":"second_call_with_new_token"}]""")
    ) { base =>
      def authPipeline(name: String, path: String) = PipelineDef(
        name = name,
        source = ApiSource(HttpRequestDef(s"$base$path", method = "POST",
          headers = if (name == "token_refresh")
            Map("Authorization" -> "Bearer {{token}}") else Map.empty)),
        extract = ExtractDef(
          fieldMapping = Map("response.access_token" -> "access_token"),
          onApiFailure = "fail"),
        transform = TransformDef(addProcessedFlags = false,
          intermediate = Some(IntermediateDef()))) // unconditioned export
      def apiPipeline(name: String, path: String) = PipelineDef(
        name = name,
        source = ApiSource(HttpRequestDef(s"$base$path",
          headers = Map("Authorization" -> "Bearer {{token}}"))),
        extract = ExtractDef(onApiFailure = "fail"),
        transform = TransformDef(addProcessedFlags = false))

      val seq = SequenceDef(
        name = "token-refresh",
        executionOrder = Seq("auth_token", "api_call_1", "token_refresh", "api_call_2"),
        pipelines = Seq(
          authPipeline("auth_token", "/auth/token"),
          apiPipeline("api_call_1", "/data"),
          authPipeline("token_refresh", "/auth/refresh"),
          apiPipeline("api_call_2", "/more-data")))

      val ctx = Orchestrator.execute(spark, seq)
      assert(ctx.results.values.forall(_.status == "succeeded"))
      // first call used the initial token
      assert(recData.headers("Authorization") === "Bearer initial_token_123")
      // refresh presented the initial token and re-exported the new one
      assert(recRefresh.headers("Authorization") === "Bearer initial_token_123")
      assert(ctx.shared("token") === "refreshed_token_456")
      // second call carried the refreshed Bearer
      assert(recMore.headers("Authorization") === "Bearer refreshed_token_456")
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
