package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.config.HttpRequestDef
import graft.sources.Http

/** S1-S4/S8/J2 HTTP source semantics against a local stub server —
  * mirrors the reference's httpmock suites (src/core/pipeline.rs:86-502,
  * tests/simple_api_chain_test.rs). */
class HttpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ----- S1: array vs object dispatch ---------------------------------
  test("S1: JSON array becomes one row per element") {
    TestHttp.withServer(
      "/arr" -> (TestHttp.respond(_, 200, """[{"id":1,"v":"a"},{"id":2,"v":"b"}]"""))
    ) { base =>
      val df = Http.readApi(spark, HttpRequestDef(s"$base/arr"))
      assert(df.count() === 2)
      assert(df.columns.sorted.toSeq === Seq("id", "v"))
    }
  }

  test("S1: single JSON object is wrapped under 'response'") {
    TestHttp.withServer(
      "/obj" -> (TestHttp.respond(_, 200, """{"status":"ok","n":5}"""))
    ) { base =>
      val df = Http.readApi(spark, HttpRequestDef(s"$base/obj"))
      assert(df.count() === 1)
      assert(df.columns.toSeq === Seq("response"))
    }
  }

  // ----- S2: headers + query params -----------------------------------
  test("S2: custom headers and query params reach the server") {
    val rec = new TestHttp.Recorded
    TestHttp.withServer("/q" -> TestHttp.recording(rec, """[{"ok":true}]""")) { base =>
      Http.readApi(spark, HttpRequestDef(s"$base/q",
        headers = Map("X-Api-Key" -> "k123"),
        queryParams = Map("limit" -> "10", "kind" -> "x y")))
      assert(rec.headers("X-api-key") === "k123")
      assert(rec.uri.contains("limit=10"))
      assert(rec.uri.contains("kind=x+y")) // URL-encoded
    }
  }

  // ----- S3: method dispatch + payload --------------------------------
  test("S3: POST sends payload with default JSON content type; unknown method falls back to GET") {
    val rec = new TestHttp.Recorded
    TestHttp.withServer("/m" -> TestHttp.recording(rec, """[{"ok":true}]""")) { base =>
      Http.readApi(spark, HttpRequestDef(s"$base/m", method = "POST",
        payload = Some("""{"q":"search"}""")))
      assert(rec.method === "POST")
      assert(rec.body === """{"q":"search"}""")
      assert(rec.headers("Content-type") === "application/json")

      Http.readApi(spark, HttpRequestDef(s"$base/m", method = "TELEPORT"))
      assert(rec.method === "GET") // reference: unknown → GET
    }
  }

  // ----- S8: sample-data fallback -------------------------------------
  test("S8: HTTP failure falls back to configured sample data") {
    TestHttp.withServer("/boom" -> (TestHttp.respond(_, 500, "err"))) { base =>
      val df = Http.readApiWithFallback(spark, HttpRequestDef(s"$base/boom"),
        sampleData = Seq("""{"id":1,"sample":true}""", """{"id":2,"sample":true}"""))
      assert(df.count() === 2)
      assert(df.filter(col("sample")).count() === 2)
    }
  }

  test("S8: failure without sample data propagates") {
    TestHttp.withServer("/boom" -> (TestHttp.respond(_, 500, "err"))) { base =>
      intercept[Http.HttpFailure] {
        Http.readApi(spark, HttpRequestDef(s"$base/boom"))
      }
    }
  }

  // ----- S4/J2: parameterized fan-out ---------------------------------
  test("S4: fan-out issues one call per previous record with {param} filled") {
    import spark.implicits._
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    TestHttp.withServer("/users" -> { ex =>
      val id = ex.getRequestURI.getPath.split('/').last
      seen.add(id)
      TestHttp.respond(ex, 200, s"""[{"user_id":$id,"detail":"d$id"}]""")
    }) { base =>
      val prev = Seq(1, 2, 3).toDF("uid")
      val out = Http.fanOut(spark, prev,
        HttpRequestDef(s"$base/users/{uid}"))
      assert(out.count() === 3)
      assert(seen.size() === 3)
      assert(out.columns.sorted.toSeq === Seq("detail", "user_id"))
    }
  }

  test("S4: concurrent_requests controls the fan-out's partition count") {
    import spark.implicits._
    TestHttp.withServer("/u" -> { ex =>
      val id = ex.getRequestURI.getPath.split('/').last
      TestHttp.respond(ex, 200, s"""[{"user_id":$id}]""")
    }) { base =>
      val prev = Seq.tabulate(8)(identity).toDF("uid").repartition(8)
      val out = Http.fanOut(spark, prev,
        HttpRequestDef(s"$base/u/{uid}"), concurrency = Some(2))
      // the calls ran in exactly 2 partitions = 2 HTTP streams
      assert(out.rdd.getNumPartitions === 2)
      assert(out.count() === 8)
    }
  }

  test("S4: a missing {param} fails the fan-out (reference: hard error)") {
    import spark.implicits._
    TestHttp.withServer("/u" -> (TestHttp.respond(_, 200, "[]"))) { base =>
      val prev = Seq(1).toDF("uid")
      val ex = intercept[Exception] {
        Http.fanOut(spark, prev, HttpRequestDef(s"$base/u/{nope}")).count()
      }
      assert(ex.getMessage.contains("nope")
        || Option(ex.getCause).exists(_.getMessage.contains("nope")))
    }
  }
}
