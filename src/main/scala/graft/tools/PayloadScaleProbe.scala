package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the multimodal payload near-dup family
  * (`MultimodalOps.payloadFingerprint` / `payloadNearDupPairs`) — run
  * it at two generated scale factors and the two timings name the
  * decade ratio the other pair-producing operators carry.
  *
  * Per directory it measures, min-of-2 interleaved:
  *  - `fp_hex_sec`: the DuckDB-replayable hex-rendering fingerprint
  *    (split + posexplode + two keyed aggs) — the oracle twin;
  *  - `fp_native_sec`: the `graft.functions.PayloadCode` expression
  *    (one codegen'd pass over the BinaryType bytes) — the production
  *    path; the probe also VERIFIES the two code sets are identical
  *    (order-free xor + sum + count over (id, pcode)), so the
  *    bit-identical claim is checked at scale, not just in the unit
  *    spec;
  *  - `pairs_sec` + `pairs`: the full banded near-dup search on the
  *    native codes (what `llm_payload_neardup` runs).
  *
  * args: sfDir [sfDir2 ...] — payloads are the documents table's text
  * UTF-8-encoded, exactly as the pinned query builds them.
  */
object PayloadScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.MultimodalOps
    val runs = args.toSeq.map { dir =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("payload", MultimodalOps.withPayload(col("text")))
        .select(col("doc_id"), col("payload"))
      val n = docs.count()
      def sig(codes: org.apache.spark.sql.DataFrame): (Long, String, Long) = {
        // sum in decimal(38,0): an ANSI-mode BIGINT sum of 64-bit
        // hashes overflows
        val r = codes.agg(
          count(lit(1)).as("c"),
          sum(expr("CAST(xxhash64(doc_id, pcode) AS DECIMAL(38,0))"))
            .cast("string").as("s"),
          expr("bit_xor(xxhash64(doc_id, pcode))").as("x")).head()
        (r.getLong(0), r.getString(1), r.getLong(2))
      }
      def hexCodes = MultimodalOps.payloadFingerprint(docs, "doc_id", "payload")
      def nativeCodes = docs.filter(length(col("payload")) > 0)
        .select(col("doc_id"), MultimodalOps.payloadCode(col("payload")).as("pcode"))
      def timed[A](f: => A): (Double, A) = {
        val t0 = System.nanoTime()
        val a = f
        ((System.nanoTime() - t0) / 1e9, a)
      }
      val (h1, sigHex) = timed(sig(hexCodes))
      val (v1, sigNat) = timed(sig(nativeCodes))
      val (h2, _) = timed(sig(hexCodes))
      val (v2, _) = timed(sig(nativeCodes))
      require(sigHex == sigNat,
        s"native/hex fingerprint divergence at $dir: $sigHex vs $sigNat")
      val (p1, nPairs) = timed(
        MultimodalOps.payloadNearDupPairs(docs, "doc_id", "payload", n = n)
          .count())
      val (p2, nPairs2) = timed(
        MultimodalOps.payloadNearDupPairs(docs, "doc_id", "payload", n = n)
          .count())
      require(nPairs == nPairs2, s"non-deterministic pairs at $dir")
      s"""{"dir":"$dir","n_docs":$n,""" +
        s""""fp_hex_sec":${math.min(h1, h2)},""" +
        s""""fp_native_sec":${math.min(v1, v2)},""" +
        s""""codes_match":true,""" +
        s""""pairs_sec":${math.min(p1, p2)},"pairs":$nPairs}"""
    }
    println(s"""{"probe":"payload_neardup_scale","runs":[${runs.mkString(",")}]}""")
    spark.stop()
  }
}
