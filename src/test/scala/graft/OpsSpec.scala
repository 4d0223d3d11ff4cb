package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ops

/** Core operator units that the harness queries don't pin directly:
  * join strategy gating, deterministic dedup, bug-compatible sort,
  * schema-drift union. */
class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("lookupJoin: large lookup is NOT broadcast when stats exceed the threshold") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024") // 1 KB
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft_lk").toString
      spark.range(200000).select($"id", concat(lit("name_"), $"id").as("nm"))
        .write.mode("overwrite").parquet(s"$dir/big")
      val big = spark.read.parquet(s"$dir/big")
      val facts = spark.range(100).toDF("id")
      val plan = Ops.lookupJoin(big, "id")(facts)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"large lookup must not broadcast:\n$plan")
      // explicit opt-in still forces it
      val forced = Ops.lookupJoin(big, "id", forceBroadcast = true)(facts)
        .queryExecution.executedPlan.toString
      assert(forced.contains("BroadcastHashJoin") || forced.contains("BroadcastExchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("lookupJoin: small lookup with stats broadcasts via Catalyst on its own") {
    val dir = java.nio.file.Files.createTempDirectory("graft_lk2").toString
    spark.range(10).select($"id", lit("x").as("v"))
      .write.mode("overwrite").parquet(s"$dir/small")
    val small = spark.read.parquet(s"$dir/small")
    val facts = spark.range(1000).toDF("id")
    val plan = Ops.lookupJoin(small, "id")(facts)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"small lookup should broadcast:\n$plan")
  }

  test("dedupFields keeps the row minimal under firstBy (deterministic 'first')") {
    val df = Seq((1, "b", 20), (1, "a", 10), (2, "c", 30)).toDF("k", "tag", "v")
    val out = Ops.dedupFields(Seq("k"), Seq(col("v")))(df)
      .orderBy("k").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.toSeq === Seq((1, "a"), (2, "c")))
  }

  test("sortBy stringMode reproduces the reference's lexicographic bug (10 < 9)") {
    val df = Seq(9, 10, 2).toDF("n")
    val typed = Ops.sortBy("n")(df).collect().map(_.getInt(0)).toSeq
    val stringy = Ops.sortBy("n", stringMode = true)(df).collect().map(_.getInt(0)).toSeq
    assert(typed === Seq(2, 9, 10))
    assert(stringy === Seq(10, 2, 9)) // "10" < "2" < "9"
  }

  test("unionAll tolerates schema drift, filling missing columns with null") {
    val a = Seq((1, "x")).toDF("id", "only_a")
    val b = Seq((2, true)).toDF("id", "only_b")
    val out = Ops.unionAll(Seq(a, b)).orderBy("id")
    assert(out.columns.sorted.toSeq === Seq("id", "only_a", "only_b"))
    val rows = out.collect()
    assert(rows(0).getString(1) === "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getBoolean(2) === true)
  }

  test("mergeWithPrevious: api wins on overlap, prev-only columns appended") {
    val api = Seq((1, "api_n"), (2, null.asInstanceOf[String])).toDF("id", "name")
    val prev = Seq((1, "prev_n", 9.5), (2, "prev_2", 8.0)).toDF("id", "name", "score")
    val out = Ops.mergeWithPrevious(prev, "id")(api).orderBy("id").collect()
    assert(out(0).getString(1) === "api_n") // api wins
    assert(out(1).getString(1) === "prev_2") // null api → prev fills
    assert(out(0).getDouble(2) === 9.5) // prev-only column carried
  }

  test("asofJoin: latest right row at-or-before each left ts, per key; " +
    "unmatched stays null") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val quotes = Seq( // (key, ts, price)
      ("a", ts(1), 10.0), ("a", ts(5), 11.0), ("a", ts(9), 12.0),
      ("b", ts(4), 99.0)
    ).toDF("sym", "ts", "price")
    val trades = Seq(
      ("a", ts(0), 1L), // before any quote → null
      ("a", ts(5), 2L), // exactly at a quote → that quote (>= semantics)
      ("a", ts(7), 3L), // between quotes → the 5-minute one
      ("b", ts(8), 4L), // b's only quote
      ("c", ts(8), 5L)  // key with no quotes at all → null
    ).toDF("sym", "ts", "trade_id")
    val out = Ops.asofJoin(trades, quotes,
      key = "sym", leftTs = "ts", rightTs = "ts", payloadCols = Seq("price"))
      .select("trade_id", "asof_price").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out === Map(1L -> null, 2L -> 11.0, 3L -> 11.0, 4L -> 99.0, 5L -> null))
  }

  test("rangeJoin: [start, end) containment incl. boundaries, multi-bin " +
    "intervals match once, key scoping respected") {
    import spark.implicits._
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val points = Seq(
      ("a", ts(0), 1L),  // == interval start → match (inclusive)
      ("a", ts(10), 2L), // == interval end → NO match (exclusive)
      ("a", ts(7), 3L),  // inside, several bins past the start
      ("b", ts(7), 4L)   // same time, other key → only b's interval
    ).toDF("k", "ts", "pid")
    val intervals = Seq(
      ("a", ts(0), ts(10), 100L), // spans many 60s bins
      ("b", ts(5), ts(8), 200L)
    ).toDF("k", "s", "e", "iid")
    val out = Ops.rangeJoin(points, intervals,
      leftTs = "ts", startCol = "s", endCol = "e",
      binWidth = 60L, key = Some("k"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 100L), (3L, 100L), (4L, 200L)))
  }

  test("asofJoin and rangeJoin agree with naive joins on 2000 random events") {
    import spark.implicits._
    // seeded corpus: clustered timestamps force boundary collisions,
    // sparse keys force empty-side cases
    val rnd = new scala.util.Random(20240812)
    def ts(sec: Int) = new java.sql.Timestamp(1704067200000L + sec * 1000L)
    val rows = Seq.tabulate(2000)(i =>
      (i.toLong, s"u${rnd.nextInt(40)}", ts(rnd.nextInt(3000)), rnd.nextBoolean()))
    val df = rows.toDF("id", "k", "ts", "isLeft")
    val left = df.filter($"isLeft").select($"id", $"k", $"ts")
    // asofJoin documents right rows unique per (key, ts) — ties among
    // exact duplicates are engine-arbitrary — so collapse collisions
    // deterministically before comparing implementations
    val right = df.filter(!$"isLeft")
      .groupBy($"k".as("rk"), $"ts".as("rts"))
      .agg(max($"id").as("rid"))
      .select($"rid", $"rk", $"rts")

    // rangeJoin (binned equi join) vs the plain inequality join it scales past
    val win = 120L // seconds
    val rIntervals = right.select($"rk", $"rts".as("s"),
      ($"rts" + expr(s"INTERVAL $win SECONDS")).as("e"), $"rid")
    val binned = graft.operators.Ops.rangeJoin(
      left, rIntervals.withColumnRenamed("rk", "k"), // key shares its name
      leftTs = "ts", startCol = "s", endCol = "e",
      binWidth = 60L, key = Some("k"))
      .select($"id", $"rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naiveRange = left.join(rIntervals,
      $"k" === $"rk" && $"ts" >= $"s" && $"ts" < $"e")
      .select($"id", $"rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned === naiveRange,
      s"rangeJoin diverged: extra=${(binned -- naiveRange).take(3)} " +
        s"missing=${(naiveRange -- binned).take(3)}")
    assert(naiveRange.nonEmpty, "degenerate corpus: no range matches at all")

    // asofJoin (union + running-last) vs join-then-rank
    val asof = graft.operators.Ops.asofJoin(
      left, right.select($"rk".as("k"), $"rts".as("ts"), $"rid"),
      key = "k", leftTs = "ts", rightTs = "ts", payloadCols = Seq("rid"))
      .select($"id", $"asof_rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"id").orderBy($"rts".desc, $"rid".desc)
    val naiveAsof = left.join(right, $"k" === $"rk" && $"rts" <= $"ts", "left")
      .withColumn("__rn", row_number().over(w)).filter($"__rn" === 1)
      .select($"id", $"rid")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(asof.keySet === naiveAsof.keySet)
    val diffs = asof.collect { case (id, v) if naiveAsof(id) != v => id }
    assert(diffs.isEmpty, s"asofJoin diverged on ids ${diffs.take(5)}")
    assert(naiveAsof.values.exists(_ >= 0) && naiveAsof.values.exists(_ == -1L),
      "corpus must exercise both matched and unmatched asof rows")
  }

  test("cleanText/sanitizeTsv/trimWhitespace build ONE Project over a wide frame") {
    import spark.implicits._
    val wide = Seq(1).toDF("c0")
      .select(col("c0") +: (1 to 60).map(i => lit(s" v$i\n").as(s"s$i")): _*)
    def countProjects(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Int =
      (if (p.getClass.getSimpleName == "Project") 1 else 0) +
        p.children.map(countProjects).sum
    val baseline = countProjects(wide.queryExecution.logical)
    for (op <- Seq[org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame](
      Ops.cleanText, Ops.sanitizeTsv, Ops.trimWhitespace)) {
      // the operator must contribute exactly ONE Project node (a
      // withColumn fold would add one per string column — 60 here)
      val after = countProjects(op(wide).queryExecution.logical)
      assert(after === baseline + 1, s"expected one fused projection, got ${after - baseline}")
    }
    val out = Ops.cleanText(wide).select("s1").as[String].first()
    // whitespace edge-trim (incl. the trailing \n, like the reference's
    // str::trim) — the old space-only trim left "v1 " here
    assert(out === "v1")
  }

  test("qualityScore: empty text scores an explicit 0.0 and keeps its row") {
    import graft.operators.TextOps
    import spark.implicits._
    val df = Seq((1L, "the cat and the dog were here today now ok"),
      (2L, "")).toDF("doc_id", "text")
    val sig = TextOps.qualitySignals(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(sig.length === 2, "empty-text row must be retained")
    assert(sig(1).getLong(1) === 0L)        // n_words
    assert(sig(1).getDouble(2) === 0.0)     // stop_ratio, not NaN
    assert(sig(1).getDouble(3) === 0.0)     // punct_ratio, not NaN
    assert(sig(1).getDouble(4) === 0.0)     // quality
    assert(sig(0).getDouble(4) > 0.0)
  }

  test("centsToDecimal: exact presentation cast from smallest-unit BIGINT " +
    "money to DECIMAL(38,scale) dollars, negatives and extremes included") {
    import org.apache.spark.sql.types.DecimalType
    val df = Seq(12345L, -12345L, 0L, Long.MaxValue).toDF("m")
      .select(
        Ops.centsToDecimal($"m", 2).as("dollars_c"),
        Ops.centsToDecimal($"m", 4).as("dollars_e4"))
    assert(df.schema("dollars_c").dataType === DecimalType(38, 2))
    assert(df.schema("dollars_e4").dataType === DecimalType(38, 4))
    val rows = df.collect()
    assert(rows(0).getDecimal(0) === new java.math.BigDecimal("123.45"))
    assert(rows(0).getDecimal(1) === new java.math.BigDecimal("1.2345"))
    assert(rows(1).getDecimal(0) === new java.math.BigDecimal("-123.45"))
    assert(rows(2).getDecimal(0) === new java.math.BigDecimal("0.00"))
    // the full BIGINT range survives the widening (no silent null/trunc)
    assert(rows(3).getDecimal(0) ===
      new java.math.BigDecimal("92233720368547758.07"))
  }

  test("chunkDocs: exact chunk count/coverage; short, boundary and " +
    "overlap cases") {
    import graft.operators.TextOps
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),  // n == window → 1
      (2L, (1 to 11).map(i => s"w$i").mkString(" ")),  // n = window+1 → 2
      (3L, (1 to 25).map(i => s"w$i").mkString(" ")),  // ceil((25-10)/8)+1 = 3
      (4L, "solo"),                                    // n < window → 1
      (5L, "")                                         // empty → 1 empty chunk
    ).toDF("doc_id", "text")
    val out = TextOps.chunkDocs(docs, "doc_id", "text", window = 10, stride = 8)
      .orderBy("doc_id", "chunk_idx").collect()
    val byDoc = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byDoc === Map(1L -> 1, 2L -> 2, 3L -> 3, 4L -> 1, 5L -> 1))
    // doc 2: second chunk starts at word 9 (stride 8), carries the tail
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2(0).getString(3) === (1 to 10).map(i => s"w$i").mkString(" "))
    assert(d2(1).getString(3) === "w9 w10 w11")
    assert(d2(1).getLong(2) === 3L) // chunk_words on the short tail
    // overlap property: consecutive chunks share window - stride words
    assert(d2(0).getString(3).split(" ").takeRight(2).toSeq
      === d2(1).getString(3).split(" ").take(2).toSeq)
    // coverage: every source word appears in some chunk of its doc
    val d3words = out.filter(_.getLong(0) == 3L).flatMap(_.getString(3).split(" ")).toSet
    assert((1 to 25).forall(i => d3words.contains(s"w$i")))
  }

  test("domainCap: keeps top-n per domain by score desc with id tiebreak; " +
    "small domains keep everything") {
    import graft.operators.TextOps
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.9), ("a", 3L, 0.5), ("a", 4L, 0.7),
      ("b", 5L, 0.1)
    ).toDF("dom", "doc_id", "score")
    val kept = TextOps.domainCap(df, "doc_id", "dom", "score", n = 2)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // domain a: 0.9 tie → ids 1,2 (id asc tiebreak beats 0.7); b keeps all
    assert(kept.toSeq === Seq(1L, 2L, 5L))
  }

  test("gapFill: densifies each key's own span, flags inserted rows and " +
    "carries the last value forward; first row per key is never a gap") {
    val daily = Seq(
      ("k1", "2024-01-01", 10L), ("k1", "2024-01-04", 40L),
      ("k2", "2024-02-01", 7L) // single-day span: nothing to fill
    ).toDF("k", "day", "v")
      .withColumn("day", col("day").cast("timestamp"))
    val out = Ops.gapFill(daily, "k", "day", "v")
      .orderBy("k", "day").collect()
    assert(out.length === 5, "k1 spans 4 days, k2 spans 1")
    val k1 = out.filter(_.getString(0) == "k1")
    assert(k1.map(_.getBoolean(2)).toSeq === Seq(false, true, true, false))
    assert(k1.map(_.getLong(3)).toSeq === Seq(10L, 10L, 10L, 40L),
      "gap rows carry the last observed value forward")
    val k2 = out.filter(_.getString(0) == "k2")
    assert(k2.map(_.getBoolean(2)).toSeq === Seq(false))
    // spans are PER KEY: k2 must not be densified across January
    assert(out.count(_.getString(0) == "k2") === 1)
  }

  test("scd2: collapses state runs, reopens recurring states, chains " +
    "valid_to, ties break on the tie column") {
    val ev = Seq(
      // user 1: A A B A — runs A, B, A (recurrence reopens, not merges)
      (1L, "2024-01-01 00:00:00", 1L, "A"),
      (1L, "2024-01-02 00:00:00", 2L, "A"),
      (1L, "2024-01-03 00:00:00", 3L, "B"),
      (1L, "2024-01-04 00:00:00", 4L, "A"),
      // user 2: same-ts tie — event_id order decides B is the change
      (2L, "2024-03-01 00:00:00", 10L, "A"),
      (2L, "2024-03-02 00:00:00", 11L, "A"),
      (2L, "2024-03-02 00:00:00", 12L, "B")
    ).toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val out = Ops.scd2(ev, "user_id", "ts", "event_type", "event_id")
      .orderBy("user_id", "valid_from", "event_id").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getString(1)).toSeq === Seq("A", "B", "A"))
    assert(u1.map(_.getLong(2)).toSeq === Seq(1L, 3L, 4L),
      "run rows carry the FIRST event of each run")
    // valid_to chains to the next run's valid_from; open run is current
    assert(u1.map(r => Option(r.getTimestamp(4))).toSeq ===
      Seq(Some(u1(1).getTimestamp(3)), Some(u1(2).getTimestamp(3)), None))
    assert(u1.map(_.getBoolean(5)).toSeq === Seq(false, false, true))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.map(_.getLong(2)).toSeq === Seq(10L, 12L),
      "equal-ts tie resolved by event_id: A run starts at 10, B at 12")
  }

  test("scd2: the two windows and the change filter plan a single shuffle") {
    val ev = Seq((1L, "2024-01-01 00:00:00", 1L, "A"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .withColumn("ts", col("ts").cast("timestamp"))
    val plan = Ops.scd2(ev, "user_id", "ts", "event_type", "event_id")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1,
      s"lag and lead share the (key × time) partitioning — expected exactly " +
        s"one shuffle, got $exchanges:\n$plan")
  }

  test("stripBoilerplate: drops high-DF segments, reassembles survivors " +
    "in order, keeps all-boilerplate docs with empty text") {
    import graft.operators.TextOps
    val boiler = "click here now" // shared 3-word segment in every doc
    val docs = Seq(
      (1L, s"$boiler unique one text"),
      (2L, s"$boiler unique two words"),
      (3L, s"$boiler other body here"),
      (4L, s"$boiler")                 // nothing but boilerplate
    ).toDF("doc_id", "text")
    val out = TextOps.stripBoilerplate(docs, "doc_id", "text",
      window = 3, minDf = 4)
      .orderBy("doc_id").collect()
    assert(out.length === 4, "every doc emits a row, even fully-stripped")
    assert(out.map(_.getLong(1)).toSeq === Seq(2L, 2L, 2L, 1L), "n_total")
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 1L, 1L, 0L), "n_kept")
    assert(out.map(_.getString(3)).toSeq ===
      Seq("unique one text", "unique two words", "other body here", ""))
    // below the threshold nothing is dropped
    val loose = TextOps.stripBoilerplate(docs, "doc_id", "text",
      window = 3, minDf = 5)
      .orderBy("doc_id").collect()
    assert(loose.forall(r => r.getLong(1) === r.getLong(2)),
      "minDf above every DF keeps all segments")
  }

  test("centsToDecimal: scales 7-18 keep every fractional digit (the " +
    "decimal(38,0) widening would have rounded them to 6 digits)") {
    import org.apache.spark.sql.types.DecimalType
    // value chosen so digits 7..18 are all non-zero: any precision-loss
    // rounding to scale 6 is immediately visible
    val v = 1234567890123456789L
    val df = Seq(v, -v, Long.MaxValue, Long.MinValue).toDF("m")
      .select(
        Ops.centsToDecimal($"m", 7).as("s7"),
        Ops.centsToDecimal($"m", 9).as("s9"),
        Ops.centsToDecimal($"m", 18).as("s18"))
    assert(df.schema("s7").dataType === DecimalType(38, 7))
    assert(df.schema("s18").dataType === DecimalType(38, 18))
    val rows = df.collect()
    assert(rows(0).getDecimal(0) ===
      new java.math.BigDecimal("123456789012.3456789"))
    assert(rows(0).getDecimal(1) ===
      new java.math.BigDecimal("1234567890.123456789"))
    assert(rows(0).getDecimal(2) ===
      new java.math.BigDecimal("1.234567890123456789"))
    assert(rows(1).getDecimal(2) ===
      new java.math.BigDecimal("-1.234567890123456789"))
    // BIGINT extremes at the extreme scale — exact, no null, no rounding
    assert(rows(2).getDecimal(2) ===
      new java.math.BigDecimal("9.223372036854775807"))
    assert(rows(3).getDecimal(2) ===
      new java.math.BigDecimal("-9.223372036854775808"))
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: greedy-earliest stages, out-of-order events don't count, " +
    "ties break on the tie column") {
    val rows = Seq(
      // user 1: a click BEFORE the signup must not satisfy stage 2
      (1L, ts("2024-01-01 00:00:00"), 1L, "click"),
      (1L, ts("2024-01-01 00:01:00"), 2L, "signup"),
      (1L, ts("2024-01-01 00:02:00"), 3L, "click"),
      (1L, ts("2024-01-01 00:03:00"), 4L, "purchase"),
      // user 2: click and purchase share a ts; ids order click first → depth 3
      (2L, ts("2024-01-02 00:00:00"), 10L, "signup"),
      (2L, ts("2024-01-02 00:01:00"), 12L, "purchase"),
      (2L, ts("2024-01-02 00:01:00"), 11L, "click"),
      // user 5: purchase sorts BEFORE the click at the same ts → depth 2
      (5L, ts("2024-01-05 00:00:00"), 40L, "signup"),
      (5L, ts("2024-01-05 00:01:00"), 41L, "purchase"),
      (5L, ts("2024-01-05 00:01:00"), 42L, "click"),
      // user 3: depth 1; user 4: depth 0
      (3L, ts("2024-01-03 00:00:00"), 20L, "signup"),
      (4L, ts("2024-01-04 00:00:00"), 30L, "error"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Ops.funnel(rows, "user_id", "ts", "event_id", "event_type",
      Seq("signup", "click", "purchase"))
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(4))).toSeq ===
      Seq((1L, 3L), (2L, 3L), (3L, 1L), (4L, 0L), (5L, 2L)))
    assert(out(0).getTimestamp(1) === ts("2024-01-01 00:01:00"))
    assert(out(0).getTimestamp(2) === ts("2024-01-01 00:02:00")) // not 00:00
    assert(out(1).getTimestamp(3) === ts("2024-01-02 00:01:00"))
    assert(out(4).getTimestamp(3) === null) // purchase before click: unreached
  }

  test("funnel plans exactly one shuffle (the per-user groupBy)") {
    val old = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = graft.queries.Tables.t(spark, "/root/testdata/sf0.001", "events")
      val plan = Ops.funnel(df, "user_id", "ts", "event_id", "event_type",
        Seq("signup", "click", "purchase"))
        .queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(plan).length === 1,
        s"funnel is ONE keyed shuffle + a per-user fold:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", old)
  }

  test("cohortRetention: day-0 cohort sizes and offsets") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 23:00:00")),
      (1L, ts("2024-01-03 01:00:00")),
      (2L, ts("2024-01-01 05:00:00")), (2L, ts("2024-01-02 05:00:00")),
      (3L, ts("2024-01-02 00:00:00")))
      .toDF("user_id", "ts")
    val out = Ops.cohortRetention(rows, "user_id", "ts")
      .orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01 00:00:00.0", 0L, 2L),  // users 1, 2 on their first day
      ("2024-01-01 00:00:00.0", 1L, 1L),  // user 2 returns next day
      ("2024-01-01 00:00:00.0", 2L, 1L),  // user 1 returns on day 2
      ("2024-01-02 00:00:00.0", 0L, 1L))) // user 3's cohort
  }

  test("keySkewProfile: heaviest keys first, deterministic tiebreak, " +
    "share sums over the WHOLE table not just the top-k") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(3)("warm") ++ Seq.fill(3)("warm2") ++
      Seq("c1", "c2", "c3", "c4")).toDF("k")
    val out = Ops.keySkewProfile(df, Seq(col("k")), k = 3)
      .orderBy(col("n_rows").desc, col("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq === Seq("hot", "warm", "warm2")) // tie: warm < warm2
    assert(out(0)._2 === 6L)
    assert(out.forall(_._3 === 16L), "total covers all 16 rows, not the top-3")
    assert(out(0)._4 === 37.5) // 6/16
  }

  test("histogram: bucket boundaries, negatives, and observed extremes") {
    val df = Seq(-0.5, 0.0, 4.9, 5.0, 9.99, 10.0).toDF("v")
    val out = Ops.histogram(df, $"v", 5.0).orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (-1L, 1L, -0.5, -0.5),
      (0L, 2L, 0.0, 4.9),
      (1L, 2L, 5.0, 9.99),
      (2L, 1L, 10.0, 10.0)))
  }

  test("snapshotDiff: added/removed/changed classification, unchanged " +
    "dropped, null-safe value compare") {
    val old = Seq(
      (1L, Some("a"), Some(10)),  // unchanged → dropped
      (2L, Some("b"), Some(20)),  // value change
      (3L, None: Option[String], Some(30)),  // null → value = changed
      (4L, Some("d"), None: Option[Int]),    // null stays null = unchanged
      (5L, Some("e"), Some(50)))  // removed
      .toDF("k", "s", "v")
    val neu = Seq(
      (1L, Some("a"), Some(10)),
      (2L, Some("b"), Some(21)),
      (3L, Some("c"), Some(30)),
      (4L, Some("d"), None: Option[Int]),
      (6L, Some("f"), Some(60)))  // added
      .toDF("k", "s", "v")
    val out = Ops.snapshotDiff(old, neu, Seq("k"), Seq("s", "v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq === Seq(
      (2L, "changed"), (3L, "changed"), (5L, "removed"), (6L, "added")))
  }

  test("winnowFingerprints: the winnowing guarantee, normalization " +
    "insensitivity, short-doc emptiness, single-window minimum") {
    import graft.operators.TextOps
    val passage = "The quick brown fox jumps over the lazy dog again"
    val docs = Seq(
      (1L, s"opening words here first. $passage. and then a unique tail"),
      // same CONTENT as doc 1, different case/spacing/punctuation —
      // normalization must make the fingerprint sets identical
      (2L, s"OPENING   words,herefirst!!! $passage?and THEN a unique-tail"),
      (3L, s"completely different material with nothing in common zzz qqq xx"),
      (4L, s"entirely other passage too $passage trailing bits differ here"),
      (5L, "tiny"),                 // < k+w-1 normalized chars → no fps
      (6L, "abcdefghijk"))          // exactly k+w-1 = 11 chars → ONE window
      .toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(docs, "doc_id", "text", k = 8, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    // normalization insensitivity: identical normalized text → identical sets
    assert(fps(1L) === fps(2L))
    // winnowing guarantee: docs 1 and 4 share a run ≥ w+k-1 chars
    assert(fps(1L).map(_._1).intersect(fps(4L).map(_._1)).nonEmpty)
    // disjoint docs share nothing
    assert(fps(1L).map(_._1).intersect(fps(3L).map(_._1)).isEmpty)
    // short doc: no fingerprints at all
    assert(!fps.contains(5L))
    // exactly one window: one fingerprint, the min gram hash, with the
    // rightmost position among the w candidate grams
    assert(fps(6L).size === 1)
    val expected = (1 to 4).map(i =>
      ("abcdefghijk".substring(i - 1, i - 1 + 8)
        .foldLeft(0L)((a, c) => (a * 31 + c) % 1000000007), i.toLong))
    assert(fps(6L).head._1 === expected.map(_._1).min)
    assert(fps(6L).head._2 ===
      expected.filter(_._1 == expected.map(_._1).min).map(_._2).max)
  }

  test("winnowPairs: shared-passage detection, containment score, " +
    "identical docs at 1.0, df cap silences corpus-wide boilerplate") {
    import graft.operators.TextOps
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"alpha opening $passage omega closing stanza"),
      (2L, s"beta prelude instead $passage coda differs totally"),
      (3L, "no overlap at all here just some other words entirely"),
      (4L, s"alpha opening $passage omega closing stanza")) // == doc 1
      .toDF("doc_id", "text")
    val pairs = TextOps.winnowPairs(docs, "doc_id", "text",
      k = 8, w = 4, maxDocsPerFp = 10, minShared = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
    assert(pairs((1L, 4L)) === 1.0) // identical docs: full containment
    assert(pairs((1L, 2L)) > 0 && pairs((1L, 2L)) < 1.0)
    // df cap: the passage appears in EVERY doc below → its fingerprints
    // exceed the cap and no pair survives
    val pre = Seq("quartz violin", "meadow sphinx", "glacier trumpet",
      "harbor nebula", "cobalt lantern", "willow asteroid")
    val boiler = pre.zipWithIndex.map { case (p, i) =>
      (i.toLong, s"$p $passage") }.toDF("doc_id", "text")
    val capped = TextOps.winnowPairs(boiler, "doc_id", "text",
      k = 8, w = 4, maxDocsPerFp = 3, minShared = 1)
    assert(capped.count() === 0L)
  }

  test("dupSpans: the borrowed passage localizes to ONE span on the later " +
    "doc only; the owner and disjoint docs report nothing; far-apart " +
    "borrowings split into separate islands") {
    import graft.operators.TextOps
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    val far = "x y z " * 40 // >> gap normalized chars between borrowings
    val docs = Seq(
      (1L, s"alpha opening $passage omega closing stanza"),       // owner
      (2L, s"beta prelude instead $passage coda differs totally"), // borrows once
      (3L, "no overlap at all here just some other words entirely"),
      (4L, s"$passage $far $passage"))  // borrows TWICE, far apart
      .toDF("doc_id", "text")
    val spans = TextOps.dupSpans(docs, "doc_id", "text",
      k = 8, w = 4, maxDocsPerFp = 10, gap = 32, minFps = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    // the min-id owner of the passage fps reports no duplicated span
    assert(!spans.contains(1L), s"owner must be span-free: $spans")
    assert(!spans.contains(3L), s"disjoint doc must be span-free: $spans")
    // doc 2: exactly one island, inside the normalized text bounds
    assert(spans(2L).size === 1, s"one borrowing → one span: $spans")
    val norm2 = s"beta prelude instead $passage coda differs totally"
      .toLowerCase.replaceAll("[^a-z0-9]", "")
    val (s2, e2, n2) = spans(2L).head
    assert(s2 >= 1 && e2 <= norm2.length && n2 >= 2)
    // the span must sit over the borrowed region (passage starts after
    // the 18-char normalized prefix "betapreludeinstead")
    val passStart = "betapreludeinstead".length + 1
    val passEnd = passStart + passage.toLowerCase.replaceAll("[^a-z0-9]", "").length - 1
    assert(s2 >= passStart - 32 && e2 <= passEnd + 32,
      s"span [$s2,$e2] must localize the borrowed region [$passStart,$passEnd]")
    // doc 4: two islands (the filler between them exceeds the gap)
    assert(spans(4L).size === 2, s"two far-apart borrowings → two spans: $spans")
    assert(spans(4L)(0)._2 < spans(4L)(1)._1, "spans must not overlap")
  }

  test("dedupDocSegments: a repeated in-doc segment is dropped at its " +
    "second occurrence, order and partial tails survive, clean docs pass " +
    "unchanged, and the plan is shuffle-free") {
    import graft.operators.TextOps
    val docs = Seq(
      // segments (w=3): [a b c][d e f][a b c][g h] → 2nd "a b c" drops
      (1L, "a b c d e f a b c g h"),
      (2L, "one two three four five six seven"), // no repeats → unchanged
      (3L, "x y z x y z x y z"))                 // 2 of 3 copies drop
      .toDF("doc_id", "text")
    val q = TextOps.dedupDocSegments(docs, "doc_id", "text", window = 3)
    val m = q.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(m(1L) === (("a b c d e f g h", 1L)))
    assert(m(2L) === (("one two three four five six seven", 0L)))
    assert(m(3L) === (("x y z", 2L)))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"in-doc dedup must be per-row, no shuffle:\n$plan")
  }

  test("stripDupSpans: the borrowed passage is excised from the RAW text " +
    "of the later doc, the owner and span-free docs pass byte-identical, " +
    "cut seams are whitespace-renormalized") {
    import graft.operators.TextOps
    val passage = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"alpha opening $passage omega closing stanza"),
      (2L, s"beta prelude instead $passage coda differs totally"),
      (3L, "no overlap  at all here just some other words entirely")) // note double space
      .toDF("doc_id", "text")
    val out = TextOps.stripDupSpans(docs, "doc_id", "text",
      k = 8, w = 4, maxDocsPerFp = 10, gap = 32, minFps = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // owner and disjoint docs: BYTE-identical (doc 3's double space survives)
    assert(out(1L) === s"alpha opening $passage omega closing stanza")
    assert(out(3L) === "no overlap  at all here just some other words entirely")
    // borrower: passage interior gone, own framing words intact
    assert(!out(2L).contains("quick brown fox"), s"passage must be cut: ${out(2L)}")
    assert(out(2L).startsWith("beta prelude instead"))
    assert(out(2L).endsWith("coda differs totally"))
    assert(!out(2L).contains("  "), s"no double spaces at cut seams: '${out(2L)}'")
    // excision is span-approximate (fingerprint-sampled boundaries), but
    // must remove most of the 60-char passage
    assert(out(2L).length < docs.collect()(1).getString(1).length - 40,
      s"most of the borrowed passage must be gone: '${out(2L)}'")
    // the rewrite is a per-row expression: the only Generate (explode)
    // nodes are the fingerprint pass's own gram-index explodes — the
    // per-char posexplode this replaced would add extra ones
    def nGen(p: String) = "Generate".r.findAllIn(p).length
    val stripPlan = TextOps.stripDupSpans(docs, "doc_id", "text",
      k = 8, w = 4, maxDocsPerFp = 10, gap = 32, minFps = 2)
      .queryExecution.executedPlan.toString
    val spansPlan = TextOps.dupSpans(docs, "doc_id", "text",
      k = 8, w = 4, maxDocsPerFp = 10, gap = 32, minFps = 2)
      .queryExecution.executedPlan.toString
    assert(nGen(stripPlan) <= 2 * nGen(spansPlan),
      s"span excision must not explode chars (clean + dirty branches " +
        s"each embed one fingerprint pass):\n$stripPlan")
    assert(!stripPlan.contains("split(text"),
      s"no per-char split of the raw text in the excision plan:\n$stripPlan")
  }

  test("dedupDocSegments: NULL text propagates as NULL (no fabricated " +
    "empty string), non-null rows are unaffected") {
    import graft.operators.TextOps
    val docs = Seq((1L, "a b c a b c"), (2L, null))
      .toDF("doc_id", "text")
    val m = TextOps.dedupDocSegments(docs, "doc_id", "text", window = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) null else r.getLong(2)))).toMap
    assert(m(1L) === (("a b c", 1L)))
    assert(m(2L) === ((null, null)))
  }

  test("ExciseSpans kernel: kept chars cut inside [start,end], separators " +
    "cut only strictly interior, boundary separators and outside text stay") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    def run(text: String, spans: (Long, Long)*): String =
      graft.functions.ExciseSpans.excise(
        UTF8String.fromString(text),
        new GenericArrayData(spans.map { case (s, e) =>
          InternalRow(s, e) }.toArray[Any])).toString
    // normalized coords over "abcdefgh": cut kept chars 3..5 (c,d,e);
    // the space between c and d is interior → cut; the spaces at the
    // span boundary (after b, after e) stay
    assert(run("ab c d e fgh", (3L, 5L)) === "ab  fgh")
    // no spans → byte-identical
    assert(run("ab c d e fgh") === "ab c d e fgh")
    // span covering everything → only non-interior seps could survive
    assert(run("abc", (1L, 3L)) === "")
    // case-insensitive kept chars, digits count
    assert(run("A1 B2 C3", (2L, 4L)) === "A C3")
    // two disjoint spans
    assert(run("a b c d e f", (2L, 2L), (5L, 5L)) === "a  c d  f")
  }

  test("BpeTokens: min-(rank,position) merges, leftmost ties, unmergeable " +
    "chars survive, and bpeTokenCount is per-row shuffle-free") {
    import graft.operators.TextOps
    import org.apache.spark.unsafe.types.UTF8String
    val merges = Seq(("t", "h"), ("i", "n"), ("a", "n"), ("th", "e"), ("an", "d"))
    val ranks = new java.util.HashMap[String, Integer]
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      ranks.put(a + " " + b, i + 1) }
    def enc(w: String): Seq[String] =
      graft.functions.BpeTokens.encode(UTF8String.fromString(w), ranks)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    assert(enc("the") === Seq("the"))          // t h → th; th e → the
    assert(enc("thing") === Seq("th", "in", "g"))
    assert(enc("and") === Seq("and"))          // a n → an; an d → and
    assert(enc("another") === Seq("an", "o", "the", "r"))
    assert(enc("thth") === Seq("th", "th"))    // leftmost (t,h) first
    assert(enc("xyz") === Seq("x", "y", "z"))  // nothing mergeable
    assert(enc("") === Seq())
    // doc-level counts: "the thing and another" → 1 + 3 + 1 + 4 = 9
    val q = TextOps.bpeTokenCount(
      Seq((1L, "The thing and another"), (2L, "is  it"))
        .toDF("doc_id", "text"), "doc_id", "text", merges)
    val m = q.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(m(1L) === ((4L, 21L, 9L)))
    assert(m(2L) === ((3L, 6L, 4L)))   // "is"→2, ""→0, "it"→2
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"BPE counting must be per-row, no shuffle:\n$plan")
  }

  test("BPE memo: >64k distinct words exercise LRU eviction and the " +
    "long-word bypass; every output equals the unmemoized kernel") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.types.StringType
    import graft.functions.BpeTokens
    val merges = Seq(("t", "h"), ("i", "n"), ("a", "n"), ("th", "e"), ("an", "d"))
    val ranks = new java.util.HashMap[String, Integer]
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      ranks.put(a + " " + b, i + 1) }
    val ids = new java.util.HashMap[String, Integer]
    Seq("th", "the", "in", "an", "and", "t", "h", "i", "n", "g")
      .zipWithIndex.foreach { case (s, i) => ids.put(s, i + 1) }
    val table = new BpeTokens.Table(merges)
    val idTable = new BpeTokens.IdTable(merges,
      Seq("th", "the", "in", "an", "and", "t", "h", "i", "n", "g")
        .zipWithIndex.map { case (s, i) => s -> (i + 1) }.toMap)
    def syms(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
      a.toObjectArray(StringType).map(_.toString).toSeq
    // > MemoCap distinct words on ONE thread (the memo is per-thread),
    // streamed twice in opposite orders so the head of pass 1 is
    // evicted by its tail and must re-encode in pass 2 — the
    // removeEldestEntry hot path the r18 round never exercised; plus a
    // word past MemoMaxWordChars (bypass, never stored) and Zipf-style
    // repeats (hits must return the identical segmentation).
    assert(BpeTokens.MemoCap === 65536)
    val n = BpeTokens.MemoCap + 8192
    val longWord = "thinganด" * 32 // 256 chars, unicode, > 64-char cap
    def word(i: Int): String =
      if (i % 4096 == 0) longWord
      else if (i % 7 == 0) "another" // Zipf head: repeated hits
      else s"thing${i}and"
    var checked = 0
    ((0 until n).iterator ++ (n - 1 to 0 by -1).iterator).foreach { i =>
      val w = UTF8String.fromString(word(i))
      val viaMemo = syms(table.encode(w))
      val ref = syms(BpeTokens.encode(w, ranks))
      assert(viaMemo === ref, s"word(${i})")
      val viaIdMemo = idTable.encodeIds(w).toIntArray().toSeq
      val refIds = BpeTokens.encodeIds(w, ranks, ids).toIntArray().toSeq
      assert(viaIdMemo === refIds, s"ids word(${i})")
      checked += 1
    }
    assert(checked === 2 * n)
  }

  test("BpeApplyMerge: left-to-right non-overlapping single pass — runs " +
    "of matches merge at even offsets only") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    def apply_(s: Seq[String], a: String, b: String): Seq[String] =
      Seq(Tuple1(s)).toDF("s").select(ColumnBridge.column(
        graft.functions.BpeApplyMerge(
          ColumnBridge.expression(col("s")), a, b)).as("o"))
        .collect()(0).getSeq[String](0)
    assert(apply_(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(apply_(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(apply_(Seq("x", "a", "b", "a", "b"), "a", "b") ===
      Seq("x", "ab", "ab"))
    assert(apply_(Seq("a", "b"), "b", "a") === Seq("a", "b"))
    assert(apply_(Seq.empty[String], "a", "b") === Seq.empty)
  }

  test("bpeEncodeIds: codepoint-ordered base vocab + merge ids, " +
    "word-order concatenation, UNK = 0, and the encode is shuffle-free") {
    import graft.operators.TextOps
    val docs = Seq((1L, "the thing"), (2L, "xq the")).toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"))
    // base chars of lower(text) incl. the space, codepoint order:
    // ' '=1 e=2 g=3 h=4 i=5 n=6 q=7 t=8 x=9; merges: th=10 the=11
    assert(TextOps.bpeVocab(docs, "text", merges) === Seq(
      " " -> 1, "e" -> 2, "g" -> 3, "h" -> 4, "i" -> 5, "n" -> 6,
      "q" -> 7, "t" -> 8, "x" -> 9, "th" -> 10, "the" -> 11))
    val q = TextOps.bpeEncodeIds(docs, "doc_id", "text", merges)
    val rows = q.orderBy("doc_id", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq(
      (1L, 0L, 11L), (1L, 1L, 10L), (1L, 2L, 5L), (1L, 3L, 6L),
      (1L, 4L, 3L),
      (2L, 0L, 9L), (2L, 1L, 7L), (2L, 2L, 11L)))
    val plan = TextOps.bpeEncodeIds(docs, "doc_id", "text", merges)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"encode must fuse with the scan, no shuffle:\n$plan")
    // out-of-vocabulary symbol maps to UNK = 0 (explicit short vocab)
    val unk = TextOps.bpeEncodeIds(Seq((1L, "ta")).toDF("doc_id", "text"),
      "doc_id", "text", Seq.empty, vocab = Seq("t" -> 1))
      .orderBy("pos").collect().map(_.getLong(2)).toSeq
    assert(unk === Seq(1L, 0L))
  }

  test("packTokenIds: token-exact concat-and-chunk cuts — documents " +
    "straddle sequence boundaries, shards are independent") {
    import graft.operators.TextOps
    val docs = Seq((0L, "aa a"), (1L, "a"), (2L, "a aa a"))
      .toDF("doc_id", "text")
    // vocab: ' '=1, a=2; no merges -> doc0 = [2,2,2], doc1 = [2],
    // doc2 = [2,2,2,2]; shard = doc_id % 2; budget 3: doc2's four
    // tokens start at global offset 3 and straddle seq 1 into seq 2
    val rows = TextOps.packTokenIds(docs, "doc_id", "text",
      budget = 3L, nShards = 2, merges = Seq.empty)
      .orderBy("shard", "seq_no", "seq_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(rows === Seq(
      (0L, 0L, 0L, 0L, 2L), (0L, 0L, 1L, 0L, 2L), (0L, 0L, 2L, 0L, 2L),
      (0L, 1L, 0L, 2L, 2L), (0L, 1L, 1L, 2L, 2L), (0L, 1L, 2L, 2L, 2L),
      (0L, 2L, 0L, 2L, 2L),
      (1L, 0L, 0L, 1L, 2L)))
  }

  test("packTokenIdsBy: a caller-supplied layout reorders the token " +
    "stream — epoch-shuffled packing is doc order by (shard, pos)") {
    import graft.operators.TextOps
    val docs = Seq((0L, "aa a"), (2L, "a aa a")).toDF("doc_id", "text")
    // both docs in shard 0, REVERSED order: doc2 (4 tokens) first,
    // then doc0 (3 tokens); budget 3 -> doc2 fills seq0 + seq1[0],
    // doc0 takes seq1[1..2] + seq2[0]
    val order = Seq((2L, 0L, 1L), (0L, 0L, 2L))
      .toDF("doc_id", "shard", "pos")
    val rows = TextOps.packTokenIdsBy(docs, "doc_id", "text",
      budget = 3L, order = order, merges = Seq.empty)
      .orderBy("seq_no", "seq_pos")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows === Seq(
      (0L, 0L, 2L), (0L, 1L, 2L), (0L, 2L, 2L),
      (1L, 0L, 2L), (1L, 1L, 0L), (1L, 2L, 0L),
      (2L, 0L, 0L)))
  }

  test("bpeTrain: iterated argmax learns the hand-computed merge " +
    "sequence with the (count desc, pair asc) tie-break") {
    import graft.operators.TextOps
    // corpus: "aaab" x2, "ab" x1
    //  round 1: (a,a)=4 beats (a,b)=3         -> merge (a,a)
    //  round 2: [aa,a,b]x2 [a,b]: (a,b)=3 beats (aa,a)=2 -> (a,b)
    //  round 3: [aa,ab]x2 [ab]: (aa,ab)=2     -> (aa,ab)
    val docs = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    val learned = TextOps.bpeTrain(docs, "text", nMerges = 3)
    assert(learned === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    // exhaustion: asking for more merges than the vocab supports stops
    // early instead of looping
    val more = TextOps.bpeTrain(docs, "text", nMerges = 50)
    assert(more.take(3) === learned && more.size < 50)
  }

  test("bpeTrain: deterministic and invariant to input partitioning; " +
    "learned merges compress a held-out corpus better than the " +
    "hand-written BpeMergesEn at the same table size") {
    import graft.operators.TextOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = docs.filter(col("doc_id") % 2 === 0)
    val heldOut = docs.filter(col("doc_id") % 2 === 1)
    val n = TextOps.BpeMergesEn.size
    val learned = TextOps.bpeTrain(train, "text", nMerges = n)
    assert(learned === TextOps.bpeTrain(
      train.repartition(7), "text", nMerges = n),
      "training must not depend on partitioning")
    def total(merges: Seq[(String, String)]): Long =
      TextOps.bpeTokenCount(heldOut, "doc_id", "text", merges)
        .agg(sum("bpe_tokens")).collect()(0).getLong(0)
    val tLearned = total(learned)
    val tHand = total(TextOps.BpeMergesEn)
    info(s"held-out tokens: learned=$tLearned hand-written=$tHand")
    assert(tLearned < tHand,
      s"$n learned merges must compress held-out text better than the " +
        s"hand-written table: $tLearned vs $tHand")
  }

  test("bpeTrainLocal: the driver-local trainer reproduces bpeTrain's " +
    "merge list exactly — fixture, exhaustion, and a real corpus") {
    import graft.operators.TextOps
    val fixture = Seq((1L, "aaab aaab ab")).toDF("doc_id", "text")
    assert(TextOps.bpeTrainLocal(fixture, "text", nMerges = 3) ===
      Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
    // exhaustion stops at the same table as the distributed trainer
    assert(TextOps.bpeTrainLocal(fixture, "text", nMerges = 50) ===
      TextOps.bpeTrain(fixture, "text", nMerges = 50))
    // tie-break-for-tie-break agreement on real text, past the toy sizes
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = 40
    assert(TextOps.bpeTrainLocal(docs, "text", nMerges = n) ===
      TextOps.bpeTrain(docs, "text", nMerges = n),
      "local and distributed training must learn the identical table")
    // the vocabulary cap fails fast instead of collecting unbounded
    val e = intercept[IllegalArgumentException] {
      TextOps.bpeTrainLocal(docs, "text", nMerges = 1, maxVocab = 10)
    }
    assert(e.getMessage.contains("maxVocab"))
  }

  test("bpeTrainLocal: argmax tie-break is UTF-8 byte order, matching " +
    "bpeTrain for non-BMP symbols (emoji sort ABOVE U+E000 in UTF-8 " +
    "but BELOW it in UTF-16 code units)") {
    import graft.operators.TextOps
    // ("a", U+E000) and ("a", U+1F600) tie at count 1; UTF-16 order
    // would pick the emoji (surrogate 0xD83D < 0xE000), UTF-8 byte
    // order (= Spark's UTF8String orderBy) picks U+E000 (EE.. < F0..)
    val corpus = Seq((1L, "a a😀")).toDF("doc_id", "text")
    val local = TextOps.bpeTrainLocal(corpus, "text", nMerges = 2)
    assert(local.head === ("a", ""),
      s"first merge must follow UTF-8 byte order, got ${local.head}")
    assert(local === TextOps.bpeTrain(corpus, "text", nMerges = 2),
      "local and distributed training must agree beyond the BMP")
  }

  test("bpe table bound: oversized merge tables fail loud naming the " +
    "broadcast-frame alternative (measured flat to 32k in the probe)") {
    import graft.operators.TextOps
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val oversized = (0 to (1 << 17)).map(i => (s"x$i", s"y$i"))
    val e = intercept[IllegalArgumentException] {
      TextOps.bpeEncodeIds(docs, "doc_id", "text", oversized,
        vocab = Seq(("a", 1)))
    }
    assert(e.getMessage.contains("broadcast"))
    val e2 = intercept[IllegalArgumentException] {
      TextOps.bpeTokenCount(docs, "doc_id", "text", oversized)
    }
    assert(e2.getMessage.contains("broadcast"))
    // a GPT-2-sized table is INSIDE the bound (the probe's 32768)
    val ok = (0 until 32768).map(i => (s"x$i", s"y$i"))
    assert(TextOps.bpeTokenCount(docs, "doc_id", "text", ok)
      .collect()(0).getLong(3) === 2L)
  }

  test("classifierScore: integer w_sum is exact, unseen buckets weigh 0, " +
    "mean-pooled sigmoid matches the closed form, weight table broadcasts") {
    import graft.operators.TextOps
    import org.apache.spark.unsafe.types.UTF8String
    def bucket(w: String): Long =
      graft.functions.PolyHash.hashUtf8(UTF8String.fromString(w)) % 1024L
    val docs = Seq(
      (1L, "Alpha beta"),       // words() lowercases: both weighted
      (2L, "alpha unseen"),     // one weighted, one miss (0)
      (3L, "unseen unknown"))   // all misses → logit = bias
      .toDF("doc_id", "text")
    val weights = Seq((bucket("alpha"), 2000L), (bucket("beta"), -500L))
      .toDF("bucket", "w")
    val q = TextOps.classifierScore(docs, "doc_id", "text", weights,
      nBuckets = 1024, scale = 1000.0, bias = 0.0)
    val m = q.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    def sig(x: Double) = math.rint(1.0 / (1.0 + math.exp(-x)) * 1e6) / 1e6
    assert(m(1L) === ((2L, 1500L, sig(1500.0 / 1000 / 2))))
    assert(m(2L) === ((2L, 2000L, sig(2000.0 / 1000 / 2))))
    assert(m(3L) === ((2L, 0L, 0.5)))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the weight table must broadcast:\n$plan")
  }
}
