package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** Structured Streaming extension: watermarked windowed aggregation,
  * session windows, and bounded-state streaming dedup, driven through
  * MemoryStream → memory sink. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:00")
  private def tsH(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("windowed agg: tumbling 1h windows count per key as the stream advances") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = Streams.windowedAgg(
      input.toDF().toDF("ts", "event_type", "value"),
      "ts", "10 minutes", "1 hour", keys = Seq("event_type"))
    val q = agg.writeStream.format("memory")
      .queryName("win_counts").outputMode("complete").start()
    try {
      input.addData(
        (tsH(0, 5), "click", 1.0), (tsH(0, 30), "click", 2.0),
        (tsH(0, 40), "view", 3.0), (tsH(1, 10), "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select("window_start", "event_type", "n_events")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      assert(rows.toSeq === Seq(
        (tsH(0, 0), "click", 2L), (tsH(0, 0), "view", 1L),
        (tsH(1, 0), "click", 1L)))
    } finally q.stop()
  }

  test("session windows: a gap larger than the threshold starts a new session") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = Streams.sessionAgg(
      input.toDF().toDF("ts", "user"),
      "ts", "5 minutes", gap = "10 minutes", keys = Seq("user"))
    val q = agg.writeStream.format("memory")
      .queryName("sessions").outputMode("complete").start()
    try {
      // user a: 00:00, 00:05 (one session), 00:30 (gap > 10min → new session)
      input.addData((ts(0), "a"), (ts(5), "a"), (ts(30), "a"))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .select("user", "session_start", "n_events")
        .orderBy("session_start")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
      assert(rows.toSeq === Seq(("a", ts(0), 2L), ("a", ts(30), 1L)))
    } finally q.stop()
  }

  test("streaming payload near-dup (ST15): a later near-identical " +
    "payload emits an exact-verified hit across micro-batches; empty " +
    "payloads drop; the batch twin matches payloadNearDupPairs") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.operators.MultimodalOps
    val base = (1 to 40).map(i => s"word${i * 7} chunk${i * 13}")
      .mkString(" ")
    val other = (1 to 40).map(i => s"zzz${i * 31} q${i * 3}").mkString(" ")
    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDF().toDF("ts", "doc_id", "text")
      .withColumn("payload", MultimodalOps.withPayload(col("text")))
    val hits = Streams.streamingPayloadNearDup(
      df, "doc_id", "payload", "ts", expectedN = 1000L)
    val q = hits.toDF().writeStream.format("memory")
      .queryName("pdup").outputMode("append").start()
    try {
      input.addData((ts(0), 1L, base), (ts(1), 2L, other))
      q.processAllAvailable()
      assert(spark.table("pdup").count() == 0,
        "unrelated payloads must not hit")
      // near-dup of doc 1 arrives a MICRO-BATCH LATER (state carries);
      // the empty payload must vanish without a row
      input.addData((ts(2), 3L, base + " tail"), (ts(3), 4L, ""))
      q.processAllAvailable()
      val rows = spark.table("pdup").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((3L, 1L)), s"expected the cross-batch hit: $rows")
    } finally q.stop()
    // batch twin: the same rows as ONE batch frame yield exactly the
    // pair set the batch search finds (same width law, same verify)
    val batch = Seq((ts(0), 1L, base), (ts(1), 2L, other),
      (ts(2), 3L, base + " tail"))
      .toDF("ts", "doc_id", "text")
      .withColumn("payload", MultimodalOps.withPayload(col("text")))
    val sHits = Streams.streamingPayloadNearDup(
      batch, "doc_id", "payload", "ts", expectedN = 1000L)
      .collect()
      .map(h => (math.min(h.doc_id, h.dup_of),
        math.max(h.doc_id, h.dup_of), h.hamming.toLong)).toSet
    val bPairs = MultimodalOps.payloadNearDupPairs(
      batch, "doc_id", "payload", n = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(sHits == bPairs,
      s"batch twin must match the banded search: $sHits vs $bPairs")
  }

  test("streaming dedup: duplicates within the watermark horizon are dropped") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val dd = Streams.streamingDedup(
      input.toDF().toDF("ts", "id"), "ts", "30 minutes", Seq("id"))
    val q = dd.writeStream.format("memory")
      .queryName("dedup_out").outputMode("append").start()
    try {
      input.addData((ts(0), 1L), (ts(1), 1L), (ts(2), 2L), (ts(3), 1L))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("id")
        .collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("mapGroupsWithState: per-key running totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val typed = input.toDF().toDF("ts", "key", "value")
      .selectExpr("key", "ts", "value")
      .as[graft.streaming.KeyedEvent]
    val q = graft.streaming.Streams.runningTotals(typed)
      .writeStream.format("memory").queryName("totals")
      .outputMode("update").start()
    try {
      input.addData((ts(0), "a", 1.0), (ts(1), "a", 2.0), (ts(2), "b", 5.0))
      q.processAllAvailable()
      input.addData((ts(3), "a", 4.0)) // second batch: state carries over
      q.processAllAvailable()
      // memory sink keeps every update; latest state = max n per key
      val latest = spark.table("totals")
        .groupBy("key").agg(max("n").as("n"), max("total").as("total"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(latest("a") === ((3L, 7.0))) // 1+2 in batch 1, +4 in batch 2
      assert(latest("b") === ((1L, 5.0)))
    } finally q.stop()
  }

  test("updateTotals timeout branch: idle key emits final totals and drops state") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import graft.streaming.{KeyedEvent, KeyedTotals, Streams}
    // accumulate branch registers a timeout when a TTL is set
    val live = TestGroupState.create[KeyedTotals](
      optionalState = org.apache.spark.api.java.Optional.empty(),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = false)
    val out = Streams.updateTotals(Some("10 seconds"))(
      "a", Iterator(KeyedEvent("a", ts(0), 2.0), KeyedEvent("a", ts(1), 3.0)), live)
    assert(out === KeyedTotals("a", 2L, 5.0))
    assert(live.get === KeyedTotals("a", 2L, 5.0))
    assert(live.getTimeoutTimestampMs.isPresent, "TTL must register a timeout")

    // timed-out branch: emit last known totals, remove state
    val timedOut = TestGroupState.create[KeyedTotals](
      optionalState = org.apache.spark.api.java.Optional.of(KeyedTotals("a", 7L, 9.0)),
      timeoutConf = GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 99999L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty(),
      hasTimedOut = true)
    val fin = Streams.updateTotals(Some("10 seconds"))("a", Iterator.empty, timedOut)
    assert(fin === KeyedTotals("a", 7L, 9.0))
    assert(timedOut.isRemoved, "timed-out state must be reclaimed")
  }

  test("file stream over the real events table matches the batch plan's counts, " +
    "for every physical ts encoding Tables.normalizeEventsTs dispatches on") {
    import org.apache.spark.sql.DataFrame
    import graft.queries.Tables
    val dir = "/root/testdata/sf0.001"
    // Batch side goes through the hardened reader — the single source of
    // truth for the events ts encoding (no inline conversion copies here).
    val batch = Tables.t(spark, dir, "events")
    val agg = (df: DataFrame) =>
      Streams.windowedAgg(Tables.normalizeEventsTs(df), "ts", "1 hour",
        "1 day", keys = Seq("event_type"))
    val expected = agg(spark.read.parquet(s"$dir/events.parquet"))
      .select("window_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(expected.nonEmpty)

    // Stage three encodings of the same rows: the shipped file as-is, a
    // Long-nanos twin (what TIMESTAMP(NANOS) files look like under
    // nanosAsLong=true), and a session-tz TIMESTAMP twin — proving the
    // dispatch under Structured Streaming, not just batch.
    val root = java.nio.file.Files.createTempDirectory("graft_evstream")
    val shipped = root.resolve("shipped"); java.nio.file.Files.createDirectory(shipped)
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      shipped.resolve("events.parquet"))
    val nanosDir = root.resolve("nanos").toString
    batch.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.parquet(nanosDir)
    val microsDir = root.resolve("micros").toString
    batch.write.parquet(microsDir)

    for (encDir <- Seq(shipped.toString, nanosDir, microsDir)) {
      val schema = spark.read.parquet(encDir).schema
      val stream = spark.readStream.schema(schema).parquet(encDir)
      val qn = "ev_win_" + encDir.split('/').last
      val q = agg(stream).writeStream.format("memory")
        .queryName(qn).outputMode("complete").start()
      try {
        q.processAllAvailable()
        val got = spark.table(qn)
          .select("window_start", "event_type", "n_events")
          .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
        assert(got === expected,
          s"stream twin at $encDir must agree with the batch plan")
      } finally q.stop()
    }
  }

  test("sessionize (flatMapGroupsWithState): gap closes a session on arrival, " +
    "event-time timeout closes the idle one") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val typed = input.toDF().toDF("key", "ts", "value")
      .as[graft.streaming.KeyedEvent]
    val q = Streams.sessionize(typed, "5 minutes", gapMs = 10L * 60 * 1000)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData(("a", ts(0), 1.0), ("a", ts(5), 1.0))
      q.processAllAvailable()
      // 30 > 5 + 10min gap → the [0,5] session closes on arrival
      input.addData(("a", ts(30), 1.0))
      q.processAllAvailable()
      // another key's event at :59 drives the watermark to :54, past
      // 30 + gap = :40 → the idle [30] session closes by TIMEOUT
      input.addData(("b", ts(59), 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(rows === Set(("a", ts(0), 2L), ("a", ts(30), 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join: same-key rows within the window match; " +
    "state is evicted past the watermark so a late row cannot match") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val lIn = MemoryStream[(Long, String, Timestamp)]
    val rIn = MemoryStream[(Long, String, Timestamp)]
    val joined = Streams.intervalJoin(
      lIn.toDF().toDF("id", "key", "ts"),
      rIn.toDF().toDF("pid", "pkey", "pts"),
      leftKey = "key", rightKey = "pkey", leftTs = "ts", rightTs = "pts",
      watermarkDelay = "10 minutes", window = "1 hour")
      .select("id", "pid")
    val q = joined.writeStream.format("memory")
      .queryName("ssj_out").outputMode("append").start()
    try {
      rIn.addData((100L, "u1", ts(0)))    // purchase 00:00
      lIn.addData((1L, "u1", ts(30)))     // error 00:30 → in [00:00, 01:00): match
      lIn.addData((2L, "u2", ts(30)))     // other key: no match
      q.processAllAvailable()
      // both sides advance to 02:00 → global watermark 01:50, past the
      // purchase's eviction bound (00:00 + 1h) → its buffered state drops;
      // the hour-2 pair also matches (02:00 ∈ [02:00, 03:00))
      lIn.addData((3L, "u1", tsH(2, 0)))
      rIn.addData((200L, "u1", tsH(2, 0)))
      q.processAllAvailable()
      // LATE left row behind the watermark: would have matched purchase
      // 100, but that state is gone and the row itself is late — no output
      lIn.addData((4L, "u1", ts(40)))
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 100L), (3L, 200L)))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join: unmatched left emits with null " +
    "right columns only after the watermark closes its window") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val lIn = MemoryStream[(Long, String, Timestamp)]
    val rIn = MemoryStream[(Long, String, Timestamp)]
    val joined = Streams.intervalJoin(
      lIn.toDF().toDF("id", "key", "ts"),
      rIn.toDF().toDF("pid", "pkey", "pts"),
      leftKey = "key", rightKey = "pkey", leftTs = "ts", rightTs = "pts",
      watermarkDelay = "10 minutes", window = "1 hour",
      joinType = "left_outer")
      .select("id", "pid")
    val q = joined.writeStream.format("memory")
      .queryName("ssj_outer").outputMode("append").start()
    try {
      rIn.addData((100L, "u1", ts(0)))
      lIn.addData((1L, "u1", ts(30)))  // matched
      lIn.addData((2L, "u2", ts(30)))  // no u2 purchase → eventual null row
      q.processAllAvailable()
      def got() = spark.table("ssj_outer").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      // the unmatched row CANNOT emit yet: a u2 purchase in its window
      // could still arrive
      assert(got() === Set((1L, 100L)))
      // both watermarks past 01:30+1h → the window is provably closed
      lIn.addData((3L, "u3", tsH(3, 0)))
      rIn.addData((300L, "u3", tsH(3, 0)))
      q.processAllAvailable()
      q.processAllAvailable() // outer-null emission needs the extra batch
      assert(got().contains((2L, -1L)),
        s"unmatched left must emit with nulls after the watermark: ${got()}")
    } finally q.stop()
  }

  test("stream-stream FULL OUTER interval join: unmatched rows from BOTH " +
    "sides emit null-padded after the watermark closes their windows") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val lIn = MemoryStream[(Long, String, Timestamp)]
    val rIn = MemoryStream[(Long, String, Timestamp)]
    val joined = Streams.intervalJoin(
      lIn.toDF().toDF("id", "key", "ts"),
      rIn.toDF().toDF("pid", "pkey", "pts"),
      leftKey = "key", rightKey = "pkey", leftTs = "ts", rightTs = "pts",
      watermarkDelay = "10 minutes", window = "1 hour",
      joinType = "full_outer")
      .select("id", "pid")
    val q = joined.writeStream.format("memory")
      .queryName("ssj_full").outputMode("append").start()
    try {
      rIn.addData((100L, "u1", ts(0)))   // matched by id=1
      rIn.addData((200L, "u9", ts(0)))   // no u9 error → eventual null-left
      lIn.addData((1L, "u1", ts(30)))    // matched
      lIn.addData((2L, "u2", ts(30)))    // no u2 purchase → eventual null-right
      q.processAllAvailable()
      def got() = spark.table("ssj_full").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      // unmatched rows can't emit yet: either side could still match
      assert(got() === Set((1L, 100L)))
      // advance BOTH watermarks well past every open window
      lIn.addData((3L, "u3", tsH(3, 0)))
      rIn.addData((300L, "u3", tsH(3, 0)))
      q.processAllAvailable()
      q.processAllAvailable() // outer-null emission needs the extra batch
      assert(got().contains((2L, -1L)),
        s"unmatched LEFT must emit null-padded: ${got()}")
      assert(got().contains((-1L, 200L)),
        s"unmatched RIGHT must emit null-padded: ${got()}")
    } finally q.stop()
  }

  test("stream-stream LEFT SEMI interval join: each left row emits at most " +
    "once, immediately on first match, with left columns only") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val lIn = MemoryStream[(Long, String, Timestamp)]
    val rIn = MemoryStream[(Long, String, Timestamp)]
    val joined = Streams.intervalJoin(
      lIn.toDF().toDF("id", "key", "ts"),
      rIn.toDF().toDF("pid", "pkey", "pts"),
      leftKey = "key", rightKey = "pkey", leftTs = "ts", rightTs = "pts",
      watermarkDelay = "10 minutes", window = "1 hour",
      joinType = "left_semi")
    assert(joined.columns.toSeq === Seq("id", "key", "ts"),
      "semi join must project left columns only")
    val q = joined.select("id").writeStream.format("memory")
      .queryName("ssj_semi").outputMode("append").start()
    try {
      // TWO in-window u1 purchases: the semi join must still emit id=1 once
      rIn.addData((100L, "u1", ts(0)), (101L, "u1", ts(10)))
      lIn.addData((1L, "u1", ts(30)))  // matched twice → one row
      lIn.addData((2L, "u2", ts(30)))  // never matched → no row, ever
      q.processAllAvailable()
      def got() = spark.table("ssj_semi").collect().map(_.getLong(0)).toSeq
      assert(got() === Seq(1L), s"expected a single semi row for id=1: ${got()}")
      // advance both watermarks far past id=2's window: still no emission
      lIn.addData((3L, "u3", tsH(3, 0)))
      rIn.addData((300L, "u3", tsH(3, 0)))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(got().sorted === Seq(1L, 3L),
        s"unmatched left must NEVER emit from a semi join: ${got()}")
    } finally q.stop()
  }

  test("upsertSink: latest-wins merge per partition, untouched partitions " +
    "survive, and a replayed batch is a no-op (idempotent effect)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val table = java.nio.file.Files.createTempDirectory("graft_upsert_t").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_upsert_cp").toString
    val in = MemoryStream[(Long, String, String, Timestamp)]
    val q = Streams.upsertSink(
      in.toDF().toDF("k", "part", "v", "ts"),
      table, cp, keys = Seq("k"), tsCol = "ts", partitionCol = "part")
    def state() = spark.read.parquet(table)
      .select("k", "part", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    try {
      // batch 0 creates the table; k=1 arrives twice — latest ts wins
      in.addData((1L, "p1", "stale", ts(0)), (1L, "p1", "a", ts(5)),
        (2L, "p1", "b", ts(5)), (9L, "p2", "z", ts(5)))
      q.processAllAvailable()
      assert(state() === Set((1L, "p1", "a"), (2L, "p1", "b"), (9L, "p2", "z")))
      // batch 1 updates k=1, inserts k=3, touches ONLY p1 — p2 intact
      in.addData((1L, "p1", "a2", ts(10)), (3L, "p1", "c", ts(10)))
      q.processAllAvailable()
      assert(state() === Set(
        (1L, "p1", "a2"), (2L, "p1", "b"), (3L, "p1", "c"), (9L, "p2", "z")))
    } finally q.stop()
    // replay batch 1 by hand (the restart-after-uncommitted-batch case):
    // the table state must not change
    val replay = Seq((1L, "p1", "a2", ts(10)), (3L, "p1", "c", ts(10)))
      .toDF("k", "part", "v", "ts")
    Streams.upsertBatch(replay, table, Seq("k"), "ts", "part")
    assert(state() === Set(
      (1L, "p1", "a2"), (2L, "p1", "b"), (3L, "p1", "c"), (9L, "p2", "z")),
      "replaying an already-applied batch must be a no-op")
  }

  test("upsertBatch: null partition values merge null-safely — existing " +
    "null-partition keys survive a batch touching the null partition") {
    import spark.implicits._
    val table = java.nio.file.Files.createTempDirectory("graft_upsert_n").toString
    // seed: k=1 and k=2 live in the NULL partition, k=9 in p1
    Streams.upsertBatch(
      Seq((1L, Option.empty[String], "a", ts(0)),
        (2L, Option.empty[String], "b", ts(0)),
        (9L, Option("p1"), "z", ts(0))).toDF("k", "part", "v", "ts"),
      table, Seq("k"), "ts", "part")
    // batch updates k=1 (null partition) — k=2 must SURVIVE even though
    // dynamic overwrite rewrites the whole null partition
    Streams.upsertBatch(
      Seq((1L, Option.empty[String], "a2", ts(5)))
        .toDF("k", "part", "v", "ts"),
      table, Seq("k"), "ts", "part")
    val got = spark.read.parquet(table).select("k", "part", "v").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2))).toSet
    assert(got === Set(
      (1L, None, "a2"), (2L, None, "b"), (9L, Some("p1"), "z")),
      "null-partition survivors must not be dropped, k=1 not duplicated")
  }

  test("intervalJoin and enrich reject colliding column names up front") {
    import spark.implicits._
    val a = Seq((1L, "k", ts(0))).toDF("id", "key", "ts")
    val b = Seq((2L, "k", ts(0))).toDF("pid", "key", "ts")
    val e1 = intercept[IllegalArgumentException](
      Streams.intervalJoin(a, b, "key", "key", "ts", "ts", "10 minutes", "1 hour"))
    assert(e1.getMessage.contains("share column names"))
    val e2 = intercept[IllegalArgumentException](
      Streams.enrich(a, b.select($"pid", $"key", $"ts"), "key", "pid"))
    assert(e2.getMessage.contains("collide"))
  }

  // ----- recovery: file sink + checkpoint, kill and restart ------------
  // At scale, restart semantics ARE the feature: the checkpoint must
  // restore both source offsets (no duplicated/retried output in the
  // sink) and operator state (open windows / dedup horizon survive).

  test("recovery: windowedAgg restarts from checkpoint — closed windows " +
    "appear exactly once, open-window state merges across the restart") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_rec_out").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft_rec_cp").toString
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = Streams.windowedAgg(
      input.toDF().toDF("ts", "event_type", "value"),
      "ts", "10 minutes", "1 hour", keys = Seq("event_type"))
      .select("window_start", "event_type", "n_events")
    def start() = agg.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").start()

    val q1 = start()
    input.addData((tsH(0, 5), "click", 1.0), (tsH(0, 30), "click", 2.0))
    q1.processAllAvailable()
    // hour-2 event advances the watermark past hour 0 → hour-0 window
    // finalized and appended; the hour-2 window stays OPEN in state
    input.addData((tsH(2, 0), "tick", 9.0))
    q1.processAllAvailable()
    q1.stop() // kill

    // restart from the same checkpoint: committed batches must not
    // replay into the sink, and the open hour-2 window state must be
    // restored so pre- and post-restart events count together
    val q2 = start()
    input.addData((tsH(2, 30), "tick", 1.0))
    input.addData((tsH(4, 0), "poke", 0.0)) // advance watermark past hour 2
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(outDir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    // exactly once each — a replayed batch would double the hour-0 row
    assert(rows((tsH(0, 0), "click", 2L)) === 1)
    // 1 event before the kill + 1 after = 2 in one window row
    assert(rows((tsH(2, 0), "tick", 2L)) === 1)
    assert(!rows.keySet.exists(_._2 == "poke")) // hour-4 window still open
  }

  test("recovery: streamingDedup restarts from checkpoint — dedup state " +
    "survives, a duplicate arriving after the restart is still dropped") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_dd_out").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft_dd_cp").toString
    val input = MemoryStream[(Timestamp, Long)]
    val dd = Streams.streamingDedup(
      input.toDF().toDF("ts", "id"), "ts", "30 minutes", Seq("id"))
    def start() = dd.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").start()

    val q1 = start()
    input.addData((ts(0), 1L), (ts(1), 1L), (ts(2), 2L))
    q1.processAllAvailable()
    q1.stop() // kill

    val q2 = start()
    // id=1 arrives again INSIDE the watermark horizon: only the restored
    // state can know it's a duplicate
    input.addData((ts(3), 1L), (ts(4), 3L))
    q2.processAllAvailable()
    q2.stop()

    val ids = spark.read.parquet(outDir).select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === Seq(1L, 2L, 3L), "exactly-once per id across the restart")
  }

  test("recovery: sessionize's open-session state survives a checkpointed " +
    "restart and merges pre- and post-restart events") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_sz_out").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft_sz_cp").toString
    val input = MemoryStream[(String, Timestamp, Double)]
    val sessions = Streams.sessionize(
      input.toDF().toDF("key", "ts", "value").as[graft.streaming.KeyedEvent],
      "5 minutes", gapMs = 10L * 60 * 1000)
    def start() = sessions.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").start()

    val q1 = start()
    input.addData(("a", ts(0), 1.0), ("a", ts(5), 1.0)) // session stays OPEN
    q1.processAllAvailable()
    q1.stop() // kill with the [0,5] session live in state

    val q2 = start()
    input.addData(("a", ts(9), 1.0))  // within gap: must merge into restored state
    input.addData(("b", ts(45), 1.0)) // watermark → :40 > 9+10 → close by timeout
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(outDir)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2))).toSet
    // 2 events before the kill + 1 after = ONE 3-event session; a lost
    // state would emit a fresh [9] session instead
    assert(rows === Set(("a", ts(0), 3L)))
  }

  test("recovery: stream-stream interval join state survives a checkpointed " +
    "restart — a pre-kill purchase still matches a post-restart error") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val outDir = java.nio.file.Files.createTempDirectory("graft_ssj_out").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft_ssj_cp").toString
    val lIn = MemoryStream[(Long, String, Timestamp)]
    val rIn = MemoryStream[(Long, String, Timestamp)]
    val joined = Streams.intervalJoin(
      lIn.toDF().toDF("id", "key", "ts"),
      rIn.toDF().toDF("pid", "pkey", "pts"),
      leftKey = "key", rightKey = "pkey", leftTs = "ts", rightTs = "pts",
      watermarkDelay = "10 minutes", window = "1 hour")
      .select("id", "pid")
    def start() = joined.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").start()

    val q1 = start()
    rIn.addData((100L, "u1", ts(0))) // buffered right row enters join state
    lIn.addData((1L, "u1", ts(5)))   // matches before the kill
    q1.processAllAvailable()
    q1.stop() // kill with the purchase still live in state

    val q2 = start()
    // only the RESTORED join state can match this post-restart error
    lIn.addData((2L, "u1", ts(30)))
    q2.processAllAvailable()
    q2.stop()

    val got = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got.getOrElse((1L, 100L), 0) === 1, s"pre-kill match exactly once: $got")
    assert(got.getOrElse((2L, 100L), 0) === 1,
      s"post-restart error must match the restored purchase state: $got")
  }

  test("the same windowedAgg plan runs in batch mode (oracle-checked in harness)") {
    import spark.implicits._
    val batch = Seq((tsH(0, 10), "click", 5.0), (tsH(0, 20), "click", 7.0))
      .toDF("ts", "event_type", "value")
    val out = Streams.windowedAgg(batch, "ts", "10 minutes", "1 hour",
      keys = Seq("event_type"),
      aggs = Seq(count(lit(1)).as("n_events"), max("value").as("mx")))
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("n_events") === 2L)
    assert(out(0).getAs[Double]("mx") === 7.0)
  }

  test("curation gates are streaming-safe: c4Clean + gopherKeep run " +
    "per-row on an unbounded stream with no state") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val good = (Seq("the", "report", "that", "we", "have", "shared",
      "with") ++ (1 to 53).map(i => s"word${i % 7}x")).mkString(" ")
    val gated = graft.operators.TextOps.c4Clean(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
      .filter(graft.operators.TextOps.gopherKeep(col("text_clean"),
        minWords = 40, minStopwords = 1))
    val q = gated.writeStream.format("memory")
      .queryName("curation_gate").outputMode("append").start()
    try {
      input.addData((1L, good), (2L, "the short one that we have with"))
      q.processAllAvailable()
      // a second batch flows through the same query — stateless gates
      input.addData((3L, good))
      q.processAllAvailable()
      val kept = spark.table("curation_gate")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      assert(kept.toSeq === Seq(1L, 3L))
    } finally q.stop()
  }

  test("classifierScoreRow gates an unbounded stream statelessly and " +
    "agrees bit-for-bit with the batch explode+agg scorer") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.operators.TextOps
    val weights = (0 until 64).map(i =>
      i.toLong -> ((i.toLong * 1103515245L + 12345L) % 2001L - 1000L)).toMap
    val docs = Seq((1L, "alpha beta gamma delta"),
      (2L, "zeta eta theta iota kappa lambda"))
    // batch reference: the explode + keyed-agg form
    val wdf = weights.toSeq.toDF("bucket", "w")
    val batch = TextOps.classifierScore(docs.toDF("doc_id", "text"),
      "doc_id", "text", wdf, nBuckets = 64, scale = 1000.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    val input = MemoryStream[(Long, String)]
    val scored = input.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        TextOps.classifierScoreRow(col("text"), weights,
          nBuckets = 64, scale = 1000.0).as("c"))
      .select(col("doc_id"), col("c.n_tokens"), col("c.w_sum"),
        col("c.score"))
    val q = scored.writeStream.format("memory")
      .queryName("clf_gate").outputMode("append").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val out = spark.table("clf_gate").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
          r.getDouble(3))).toMap
      assert(out === batch,
        s"streaming per-row scores must equal the batch agg: $out vs $batch")
    } finally q.stop()
  }

  test("curationIngest e2e: clean -> gate -> dedup -> upsert sink runs as " +
    "ONE streaming pipeline, dedup state survives a restart, and the " +
    "batch twin of the same rows agrees") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val table = java.nio.file.Files.createTempDirectory("graft_cur_t").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_cur_cp").toString
    val good = (Seq("the", "report", "that", "we", "have", "shared",
      "with") ++ (1 to 53).map(i => s"word${i % 7}x")).mkString(" ")
    val good2 = (Seq("the", "other", "report", "that", "she", "has",
      "written", "with") ++ (1 to 52).map(i => s"item${i % 5}y"))
      .mkString(" ")
    val short = "the short one that we have with"
    val weights = Map(0L -> 1L)
    def ingest(df: org.apache.spark.sql.DataFrame) =
      Streams.curationIngest(df, "doc_id", "text", "ts",
        weights, nBuckets = 64, minScore = 0.5,
        watermarkDelay = "30 minutes", minWords = 40, minStopwords = 1)
    val input = MemoryStream[(Long, Timestamp, String)]
    val curated = ingest(input.toDF().toDF("doc_id", "ts", "text"))
      .withColumn("part", pmod(col("doc_id"), lit(2)))
    def start() = Streams.upsertSink(curated, table, cp,
      keys = Seq("doc_id"), tsCol = "ts", partitionCol = "part")
    def kept() = spark.read.parquet(table)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    val q1 = start()
    try {
      input.addData((1L, ts(0), good), (2L, ts(1), short))
      q1.processAllAvailable()
      assert(kept() === Set(1L),
        "good doc passes every gate; the short one dies at c4Clean")
    } finally q1.stop() // kill

    val q2 = start()
    try {
      // doc 3 is a verbatim duplicate of doc 1 INSIDE the watermark
      // horizon: only the restored dedup state can know to drop it;
      // doc 4 is new and must land
      input.addData((3L, ts(2), good), (4L, ts(3), good2))
      q2.processAllAvailable()
      assert(kept() === Set(1L, 4L),
        "restart-restored dedup state drops the duplicate, new doc lands")
    } finally q2.stop()

    // batch twin: the SAME composition over the same rows as one batch
    // frame picks the same survivors (earliest-per-fingerprint)
    val batch = ingest(Seq(
      (1L, ts(0), good), (2L, ts(1), short),
      (3L, ts(2), good), (4L, ts(3), good2))
      .toDF("doc_id", "ts", "text"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batch === Set(1L, 4L), "batch twin agrees with the stream")
  }

  test("recovery: streamingPayloadNearDup (ST15) restarts from " +
    "checkpoint — bucket state survives (a near-dup arriving after the " +
    "restart still hits its pre-kill prior) and committed hits do not " +
    "replay into the sink") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    import graft.operators.MultimodalOps
    val outDir = java.nio.file.Files.createTempDirectory("graft_pd_out").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft_pd_cp").toString
    val base = (1 to 40).map(i => s"word${i * 7} chunk${i * 13}")
      .mkString(" ")
    val other = (1 to 40).map(i => s"zzz${i * 31} q${i * 3}").mkString(" ")
    val input = MemoryStream[(Timestamp, Long, String)]
    val hits = Streams.streamingPayloadNearDup(
      input.toDF().toDF("ts", "doc_id", "text")
        .withColumn("payload", MultimodalOps.withPayload(col("text"))),
      "doc_id", "payload", "ts", expectedN = 1000L)
    def start() = hits.toDF().writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").start()

    val q1 = start()
    // batch 1: the future dup target + an unrelated doc; batch 2: an
    // in-horizon near-dup whose hit COMMITS before the kill — the
    // restart must not replay it
    input.addData((ts(0), 1L, base), (ts(1), 2L, other))
    q1.processAllAvailable()
    input.addData((ts(2), 3L, base + " tail"))
    q1.processAllAvailable()
    q1.stop() // kill

    val q2 = start()
    // doc 4 is a near-dup of doc 1 — which only the RESTORED bucket
    // state has ever seen
    input.addData((ts(3), 4L, base + " tail"))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(outDir)
      .select("doc_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.count(_ == ((3L, 1L))) === 1,
      s"the pre-kill hit must appear exactly once (no replay): ${rows.toSeq}")
    assert(rows.filter(_._1 == 4L).toSet.contains((4L, 1L)),
      s"the post-restart near-dup must hit the restored prior: ${rows.toSeq}")
  }

  test("ST15 hot-bucket pruning: a bucket under steady traffic drops " +
    "entries older than watermark - TTL per micro-batch, so state stays " +
    "bounded and stale codes never produce hits") {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val width = graft.operators.LlmOps.stableBandWidth(1000L)
    val bands = 60 / width
    val ttlMs = 600000L // 10 minutes
    def probe(id: Long, tsMs: Long, code: Long) =
      graft.streaming.PayloadProbe(0L, new Timestamp(tsMs), id, code)
    // invocation 1: watermark 0 — two codes enter bucket state
    import org.apache.spark.api.java.Optional
    val st1 = TestGroupState.create[graft.streaming.BucketCodes](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(0L),
      hasTimedOut = false)
    // all codes share band-0 slice 0 (low `width` bits zero), so bucket
    // 0 is the earliest agreeing band for every pair; hamming distances
    // ride in the higher bits
    val out1 = Streams.payloadDupUpdate(width, bands, 3, ttlMs, true)(
      0L, Iterator(probe(1L, 1000L, 0L), probe(2L, 2000L, 960L)), st1)
      .toList
    assert(out1.isEmpty, "far codes (hamming 4) must not hit")
    assert(st1.get.codes.size === 2)
    // invocation 2: watermark far ahead (1 hour) — both stored codes
    // are older than watermark - TTL and must be PRUNED before probing:
    // a new near-identical code gets NO hit against the stale entry,
    // and state holds only the fresh arrival
    val wm = 3600000L
    val st2 = TestGroupState.create[graft.streaming.BucketCodes](
      Optional.of(st1.get), GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(wm),
      hasTimedOut = false)
    val out2 = Streams.payloadDupUpdate(width, bands, 3, ttlMs, true)(
      0L, Iterator(probe(3L, wm + 1000L, 64L)), st2).toList
    assert(out2.isEmpty,
      s"a stale prior (hamming 1 but outside the window) must not hit: $out2")
    assert(st2.get.codes.map(_._1) === List(3L),
      s"stale entries must be pruned from hot-bucket state: ${st2.get.codes}")
    // invocation 3: an IN-window prior still hits — pruning only drops
    // what the recency contract says it must
    val st3 = TestGroupState.create[graft.streaming.BucketCodes](
      Optional.of(st2.get), GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L, eventTimeWatermarkMs = Optional.of(wm),
      hasTimedOut = false)
    val out3 = Streams.payloadDupUpdate(width, bands, 3, ttlMs, true)(
      0L, Iterator(probe(4L, wm + 2000L, 128L)), st3).toList
    assert(out3.map(h => (h.doc_id, h.dup_of)) === List((4L, 3L)),
      s"an in-window prior must still hit: $out3")
  }
}
