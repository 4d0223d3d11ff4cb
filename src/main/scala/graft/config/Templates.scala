package graft.config

/** Template / parameter substitution (SURVEY §2.8, T1-T6).
  *
  * Pure string functions: they parameterize I/O and config on the driver
  * (and ride along the S4 fan-out on executors), never touching row data
  * through the interpreter. Semantics match the reference:
  *  - `${VAR}` env/shared substitution leaves unknown vars intact
  *    (reference: toml_config.rs:137-149, sequence_config.rs:195-276)
  *  - `{{key}}` header/payload templates resolve shared data first, then
  *    record data; unresolved left as-is (contextual_pipeline.rs:155-339)
  *  - `{param}` endpoint params resolve from the record; an unresolved
  *    single-brace param is a hard error (contextual_pipeline.rs:341-431)
  */
object Templates {

  private val DollarVar = """\$\{([A-Za-z0-9_]+)\}""".r
  private val DoubleBrace = """\{\{([A-Za-z0-9_.]+)\}\}""".r
  private val SingleBrace = """\{([A-Za-z0-9_.]+)\}""".r

  final case class UnresolvedParamException(param: String, template: String)
      extends RuntimeException(
        s"unresolved endpoint parameter {$param} in '$template'")

  /** T1 — `${VAR}` from the environment; unknown vars left intact. */
  def substEnv(text: String, env: Map[String, String] = sys.env): String =
    DollarVar.replaceAllIn(text, m =>
      java.util.regex.Matcher.quoteReplacement(
        env.getOrElse(m.group(1), m.matched)))

  /** T2 — shared-variable pass, applied after the env pass (the
    * reference's two-phase config parse). */
  def substShared(text: String, shared: Map[String, String]): String =
    substEnv(text, shared)

  /** T3/T4 — `{{key}}` with shared-over-record precedence; unresolved
    * placeholders left as-is. */
  def substDoubleBrace(
      text: String,
      shared: Map[String, Any],
      record: Map[String, Any] = Map.empty): String =
    DoubleBrace.replaceAllIn(text, m => {
      val k = m.group(1)
      val v = shared.get(k).orElse(record.get(k))
      java.util.regex.Matcher.quoteReplacement(
        v.map(render).getOrElse(m.matched))
    })

  /** T5 — endpoint templating: `{{param}}` resolved leniently first, then
    * `{param}` from the record; an unresolved single-brace param throws
    * (surfaced as a task failure in the fan-out). */
  def substEndpoint(
      template: String,
      record: Map[String, Any],
      shared: Map[String, Any] = Map.empty): String = {
    val afterDouble = substDoubleBrace(template, shared, record)
    SingleBrace.replaceAllIn(afterDouble, m => {
      val k = m.group(1)
      record.get(k).orElse(shared.get(k)) match {
        case Some(v) => java.util.regex.Matcher.quoteReplacement(render(v))
        case None    => throw UnresolvedParamException(k, template)
      }
    })
  }

  /** T6 — output filename pattern. Timestamp format matches the
    * reference's UTC `%Y%m%d_%H%M%S` (contextual_pipeline.rs:1143-1154). */
  def substFilename(
      pattern: String,
      pipelineName: String,
      executionId: String,
      now: java.time.Instant = java.time.Instant.now()): String = {
    val ts = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd_HHmmss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(now)
    pattern
      .replace("{pipeline_name}", pipelineName)
      .replace("{execution_id}", executionId)
      .replace("{timestamp}", ts)
  }

  /** Scalar rendering for substitution: strings bare, others via
    * toString (matching serde_json Value rendering for scalars). */
  private def render(v: Any): String = v match {
    case s: String => s
    case d: Double if d.isWhole => d.toLong.toString
    case other => String.valueOf(other)
  }
}
