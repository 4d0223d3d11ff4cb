package graft.queries

/** Shared DuckDB renderings of the engine's deterministic primitives.
  * SINGLE SOURCE OF TRUTH for oracle-side hashing/folding: these must
  * stay in lockstep with graft.functions.PolyHash and LlmOps' fold
  * order — a change to one side without the other silently breaks the
  * harness hash-compare. */
object DuckSql {

  /** DuckDB rendering of LlmOps.strHash / PolyHash (char-fold polynomial
    * mod 1e9+7 over code points). */
  def duckHash(expr: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split($expr, ''), c -> CAST(ascii(c) AS BIGINT))),
       |  (acc, x) -> (acc * 31 + x) % 1000000007)""".stripMargin

  /** Sequential left-fold double sum (mirrors LlmOps' aggregate order). */
  def duckFold(terms: String): String =
    s"list_reduce(list_prepend(0.0, $terms), (a, x) -> a + x)"
}
