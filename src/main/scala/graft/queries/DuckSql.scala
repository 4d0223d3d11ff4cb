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

  /** DuckDB rendering of LlmOps.mix32 (degski/Wang full-avalanche
    * 32-bit finalizer): two rounds of `x ^= x>>16; x *= 0x45d9f3b`
    * mod 2^32, plus the final xor-fold — staged as CTEs so the input
    * expression is evaluated once per row, not once per textual
    * reference. Shift-right of a non-negative value renders as
    * integer division by 65536 — identical in both engines. Produces
    * a CTE `$out($keyCols, k)` reading `$hCol` from `$src` (the `out`
    * name parameterizes the chain so one query can mix several
    * independent lanes — e.g. the two-lane wide SimHash code). */
  def duckMix32Ctes(src: String, keyCols: String, hCol: String,
      out: String = "mx"): String =
    s"""__${out}1 AS (
       |  SELECT $keyCols,
       |    (xor($hCol, $hCol // 65536) * 73244475) % 4294967296 AS __x
       |  FROM $src
       |),
       |__${out}2 AS (
       |  SELECT $keyCols,
       |    (xor(__x, __x // 65536) * 73244475) % 4294967296 AS __x
       |  FROM __${out}1
       |),
       |$out AS (SELECT $keyCols, xor(__x, __x // 65536) AS k FROM __${out}2)"""
      .stripMargin

  /** Sequential left-fold double sum (mirrors LlmOps' aggregate order). */
  def duckFold(terms: String): String =
    s"list_reduce(list_prepend(0.0, $terms), (a, x) -> a + x)"

  /** DuckDB rendering of TextOps.log2Fixed (20 fractional bits):
    * normalize to [1,2) then 20 digit-extracting squarings — every step
    * an IEEE-exact double op, so the integer matches Spark's bit for
    * bit. Rendered as a 20-step chained-CTE unroll over a caller-
    * provided `argsCte(n)` of DISTINCT positive integers, producing a
    * CTE `lg(n, f)` to join against. NOT a `list_reduce` lambda: DuckDB
    * 1.0.0's list_reduce corrupts struct accumulators across rows with
    * divergent iteration paths (verified: identical rows fold
    * correctly, mixed rows cross-talk), while plain chained CASE
    * columns vectorize exactly. */
  def duckLog2FixedCtes(argsCte: String = "args"): String = {
    val steps = (1 to 20).map { k =>
      s"""__lg$k AS (SELECT n, CASE WHEN y*y >= 2 THEN y*y/2 ELSE y*y END AS y,
         |  v*2 + CAST(y*y >= 2 AS BIGINT) AS v FROM __lg${k - 1})""".stripMargin
    }.mkString(",\n")
    s"""__lg0 AS (
       |  SELECT n, CAST(n AS DOUBLE) / power(2.0, length(bin(n)) - 1) AS y,
       |         CAST(0 AS BIGINT) AS v
       |  FROM $argsCte
       |),
       |$steps,
       |lg AS (SELECT n, (length(bin(n)) - 1) * 1048576 + v AS f FROM __lg20)"""
      .stripMargin
  }
}
