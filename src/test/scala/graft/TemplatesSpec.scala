package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.Templates

/** T1-T6 template semantics — mirrors the reference's unit table
  * (reference: tests/auth_header_template_test.rs:281-331 and
  * src/core/contextual_pipeline.rs:1946-2015). */
class TemplatesSpec extends AnyFunSuite {

  // ----- T1: ${VAR} env substitution ---------------------------------
  test("T1: ${VAR} substitutes from env map; unknown vars left intact") {
    val env = Map("BASE_URL" -> "http://api.test", "API_VERSION" -> "v2")
    assert(Templates.substEnv("${BASE_URL}/${API_VERSION}/users", env)
      === "http://api.test/v2/users")
    assert(Templates.substEnv("${MISSING}/x", env) === "${MISSING}/x")
    assert(Templates.substEnv("no vars here", env) === "no vars here")
  }

  // ----- T2: shared-variables pass (two-phase) ------------------------
  test("T2: shared variables substitute after env, same syntax") {
    val shared = Map("ENDPOINT" -> "users", "LIMIT" -> "10")
    assert(Templates.substShared("/api/${ENDPOINT}?limit=${LIMIT}", shared)
      === "/api/users?limit=10")
  }

  // ----- T3/T4: {{key}} with shared-over-record precedence ------------
  test("T3/T4: {{key}} resolves shared first, then record; unresolved left as-is") {
    val shared = Map[String, Any]("token" -> "abc123")
    val record = Map[String, Any]("token" -> "WRONG", "user_id" -> 42)
    assert(Templates.substDoubleBrace("Bearer {{token}}", shared, record)
      === "Bearer abc123") // shared wins over record
    assert(Templates.substDoubleBrace("user={{user_id}}", shared, record)
      === "user=42") // record fills what shared lacks
    assert(Templates.substDoubleBrace("{{nope}}", shared, record) === "{{nope}}")
  }

  test("T3/T4: numeric values render without decimal point when whole") {
    assert(Templates.substDoubleBrace("id={{id}}", Map("id" -> 7.0)) === "id=7")
    assert(Templates.substDoubleBrace("id={{id}}", Map("id" -> 7.5)) === "id=7.5")
  }

  // ----- T5: {param} endpoint templates — unresolved is a hard error --
  test("T5: {param} resolves from record; unresolved single-brace throws") {
    assert(Templates.substEndpoint(
      "http://api/users/{user_id}/posts", Map("user_id" -> 5))
      === "http://api/users/5/posts")
    val e = intercept[Templates.UnresolvedParamException] {
      Templates.substEndpoint("http://api/users/{missing}", Map("other" -> 1))
    }
    assert(e.param === "missing")
  }

  test("T5: {{param}} in endpoints resolves leniently before {param}") {
    val out = Templates.substEndpoint(
      "http://api/{{version}}/users/{id}",
      record = Map("id" -> 3),
      shared = Map("version" -> "v1"))
    assert(out === "http://api/v1/users/3")
  }

  // ----- T6: filename pattern ----------------------------------------
  test("T6: filename pattern substitutes name/id/timestamp (UTC yyyyMMdd_HHmmss)") {
    val now = java.time.Instant.parse("2026-08-12T06:30:00Z")
    assert(Templates.substFilename(
      "{pipeline_name}_{execution_id}_{timestamp}", "p1", "e9", now)
      === "p1_e9_20260812_063000")
  }
}
