package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataSource V2 HTTP connector: spark.read.format("graft-http"). */
class HttpDsv2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("reads a JSON array endpoint with inferred widest-type schema") {
    TestHttp.withServer("/v2" -> (TestHttp.respond(_, 200,
      """[{"id":1,"name":"a","score":1.5,"ok":true},
        |{"id":2,"name":"b","score":2,"ok":false,"extra":"late"}]"""
        .stripMargin.replace("\n", "")))) { base =>
      val df = spark.read.format("graft-http")
        .option("endpoint", s"$base/v2").load()
      assert(df.schema.map(f => f.name -> f.dataType.typeName).toMap ===
        Map("id" -> "long", "name" -> "string", "score" -> "double",
          "ok" -> "boolean", "extra" -> "string"))
      val rows = df.orderBy("id").collect()
      assert(rows.length === 2)
      assert(rows(0).getAs[Long]("id") === 1L)
      assert(rows(0).getAs[Double]("score") === 1.5)
      assert(rows(0).getAs[Boolean]("ok") === true)
      assert(rows(0).getAs[String]("extra") === null) // drift → null
      assert(rows(1).getAs[String]("extra") === "late")
    }
  }

  test("single object wraps under 'response' as a JSON string column") {
    TestHttp.withServer("/obj" -> (TestHttp.respond(_, 200,
      """{"status":"ok","n":5}"""))) { base =>
      val df = spark.read.format("graft-http")
        .option("endpoint", s"$base/obj").load()
      assert(df.columns.toSeq === Seq("response"))
      val v = df.collect()(0).getString(0)
      assert(v.contains("\"status\":\"ok\""))
    }
  }

  test("POST with payload and headers; one fetch per read") {
    val rec = new TestHttp.Recorded
    TestHttp.withServer("/p" -> TestHttp.recording(rec, """[{"got":1}]""")) { base =>
      val df = spark.read.format("graft-http")
        .option("endpoint", s"$base/p")
        .option("method", "POST")
        .option("payload", """{"q":"x"}""")
        .option("header.X-Token", "t1")
        .option("param.limit", "5")
        .load()
      assert(df.count() === 1)
      assert(rec.method === "POST")
      assert(rec.body === """{"q":"x"}""")
      assert(rec.headers("X-token") === "t1")
      assert(rec.uri.contains("limit=5"))
      assert(rec.calls === 1, "driver must fetch exactly once per read")
    }
  }

  test("missing endpoint option is a clear error") {
    val e = intercept[Exception] {
      spark.read.format("graft-http").load().collect()
    }
    assert(e.getMessage.contains("endpoint"))
  }
}
