package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.JsonConfig
import graft.engine.Orchestrator

/** End-to-end CLI path: JSON config file → loadSequence (T1/T2 passes)
  * → validate → execute → W7 metrics file — the reference's
  * sequence_etl flow (src/bin/sequence_etl.rs:44-166). */
class MainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def writeFixture(): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_main").toString
    import spark.implicits._
    Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "y"))
      .toDF("id", "name", "grp")
      .write.mode("overwrite").parquet(s"$dir/src")
    (dir, s"$dir/src")
  }

  test("parseArgs: flags parse; unknown flag rejected") {
    val a = Main.parseArgs(Array("cfg.json", "--only", "a,b", "--skip", "c",
      "--dry-run", "--execution-id", "e1", "--metrics-out", "/m.json"))
    assert(a.only === Set("a", "b") && a.skip === Set("c"))
    assert(a.dryRun && a.executionId.contains("e1") && a.metricsOut.contains("/m.json"))
    intercept[RuntimeException](Main.parseArgs(Array("cfg", "--frobnicate")))
    // a trailing value-taking flag gets a usage error, not an index crash
    val e = intercept[RuntimeException](Main.parseArgs(Array("cfg", "--only")))
    assert(e.getMessage.contains("needs a value"))
    // selectors without a config would silently select nothing in
    // zero-config mode (its one pipeline is named "simple")
    val e2 = intercept[RuntimeException](Main.parseArgs(Array("--single", "posts")))
    assert(e2.getMessage.contains("config"))
  }

  test("config file with env + shared vars runs end-to-end and writes metrics") {
    val (dir, src) = writeFixture()
    val cfg =
      s"""{
         |  "sequence": {"name": "e2e", "execution_order": ["loadup", "export"]},
         |  "global": {"shared_variables": {"OUT_DIR": "$dir/out"}},
         |  "pipelines": [
         |    {"name": "loadup",
         |     "source": {"type": "file", "path": "$src", "format": "parquet"},
         |     "extract": {"filters": {"grp": "x"},
         |                 "data_processing": {"sort_by": "id"}},
         |     "transform": {"add_processed_flags": false}},
         |    {"name": "export",
         |     "source": {"type": "previous"},
         |     "transform": {"field_mapping": {"name": "label"},
         |                   "add_processed_flags": true},
         |     "load": {"output_path": "$${OUT_DIR}", "formats": ["json"],
         |              "filename_pattern": "final"}}
         |  ]
         |}""".stripMargin
    val cfgPath = s"$dir/cfg.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cfgPath), cfg)

    val seq = JsonConfig.loadSequence(
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(cfgPath))))
    assert(seq.pipelines(1).load.get.outputPath === s"$dir/out") // T2 substitution

    val code = Main.run(spark, seq,
      Main.Args(cfgPath, executionId = Some("exec-e2e"),
        metricsOut = Some(s"$dir/metrics.json")))
    assert(code === 0)

    // distributed JSON output readable, filter + rename applied
    val out = spark.read.json(s"$dir/out/final_json")
    assert(out.count() === 2) // grp=x only
    assert(out.columns.contains("label") && out.columns.contains("processed"))

    // W7 metrics file written with per-phase timings
    val metrics = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/metrics.json")))
    assert(metrics.contains(""""execution_id":"exec-e2e""""))
    assert(metrics.contains(""""total_records":4""")) // 2 + 2
    assert(metrics.contains(""""extract_ms""""))
  }

  test("validation parity: bad scheme, bad format, bad bounds all rejected") {
    import graft.config._
    def seqWith(p: PipelineDef) = SequenceDef("s", Seq(p.name), Seq(p))
    val badScheme = PipelineDef("a", ApiSource(HttpRequestDef("ftp://files")))
    val badFormat = PipelineDef("b", FileSource("/x"),
      load = Some(LoadDef("/out", formats = Seq("xml"))))
    val badTimeout = PipelineDef("c",
      ApiSource(HttpRequestDef("http://ok", timeoutSeconds = 9999)))
    Seq(badScheme, badFormat, badTimeout).foreach { p =>
      intercept[Orchestrator.ValidationException](Orchestrator.validate(seqWith(p)))
    }
    intercept[Orchestrator.ValidationException](
      Orchestrator.validate(SequenceDef("s", Nil, Nil, retryAttempts = 99)))
  }

  test("shipped example config parses, validates, dry-runs, and executes") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("configs/sequence-example.json")))
    val seq = JsonConfig.loadSequence(text)
    assert(seq.pipelines.map(_.name) === Seq("ingest", "curate", "export"))
    val plan = Orchestrator.dryRun(seq)
    assert(plan.contains("ingest -> curate -> export"))
    val code = Main.run(spark, seq, Main.Args("configs/sequence-example.json",
      executionId = Some("exec-example"),
      metricsOut = Some("/tmp/graft_example_out/metrics.json")))
    assert(code === 0)
    val out = spark.read.json("/tmp/graft_example_out/export_exec-example_json")
    assert(out.count() > 0)
    assert(out.columns.contains("lang")) // partition column round-trips
  }

  test("shipped epoch-pack example TOML runs the gate -> mix -> " +
    "curriculum -> in-engine-train -> pack recipe verbatim") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("configs/epoch-pack-example.toml")))
    val seq = graft.config.TomlConfig.loadSequence(text)
    assert(seq.pipelines.map(_.name) === Seq("pack-epoch"))
    val ep = seq.pipelines.head.transform.epochPack.get
    assert(ep.layout === "curriculum_range" && ep.trainMerges === 64 &&
      ep.mixField.contains("source") && ep.diffField.contains("n_chars"))
    val code = Main.run(spark, seq,
      Main.Args("configs/epoch-pack-example.toml",
        executionId = Some("exec-epoch"),
        metricsOut = Some("/tmp/graft_epoch_pack_out/metrics.json")))
    assert(code === 0)
    val out = spark.read.option("header", "true")
      .csv("/tmp/graft_epoch_pack_out/epoch_exec-epoch_csv")
    assert(out.count() > 0)
    assert(out.columns.toSet ===
      Set("shard", "seq_no", "seq_pos", "doc_id", "tid"))
    // the pack respects the budget: every in-sequence position < 256
    assert(out.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.col("seq_pos").cast("long")))
      .head().getLong(0) < 256L)
  }

  test("--monitor samples heap and lands peaks in the metrics file") {
    val (dir, src) = writeFixture()
    import graft.config._
    val seq = SequenceDef("s", Seq("p"), Seq(
      PipelineDef("p", FileSource(src),
        transform = TransformDef(addProcessedFlags = false),
        load = Some(LoadDef(s"$dir/mon_out", formats = Seq("parquet"))))))
    val code = Main.run(spark, seq,
      Main.Args("cfg", monitor = true, metricsOut = Some(s"$dir/mon.json")))
    assert(code === 0)
    val metrics = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/mon.json")))
    assert(metrics.contains(""""peak_heap_bytes":"""))
    val peak = """"peak_heap_bytes":(\d+)""".r
      .findFirstMatchIn(metrics).get.group(1).toLong
    assert(peak > 0L)
  }

  test("a stop-on-failure run still writes metrics for the completed pipelines") {
    val (dir, src) = writeFixture()
    import graft.config._
    val seq = SequenceDef("s", Seq("ok", "boom"), Seq(
      PipelineDef("ok", FileSource(src),
        transform = TransformDef(addProcessedFlags = false)),
      PipelineDef("boom", FileSource("/nonexistent/path/nowhere"),
        transform = TransformDef(addProcessedFlags = false))))
    val code = Main.run(spark, seq,
      Main.Args("cfg", metricsOut = Some(s"$dir/fail.json")))
    assert(code === 1)
    val metrics = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/fail.json")))
    assert(metrics.contains(""""name":"ok""""))
    assert(metrics.contains(""""status":"succeeded""""))
    assert(metrics.contains(""""status":"failed""""))
  }

  test("--single selects one pipeline; orc writes distributed") {
    val a = Main.parseArgs(Array("cfg.toml", "--single", "p1"))
    assert(a.only === Set("p1"))
    val (dir, src) = writeFixture()
    import graft.config._
    val seq = SequenceDef("s", Seq("p"), Seq(
      PipelineDef("p", FileSource(src),
        transform = TransformDef(addProcessedFlags = false),
        load = Some(LoadDef(s"$dir/orc_out", formats = Seq("orc"),
          filenamePattern = "o")))))
    assert(Main.run(spark, seq, Main.Args("cfg",
      metricsOut = Some(s"$dir/om.json"))) === 0)
    assert(spark.read.orc(s"$dir/orc_out/o_orc").count() === 3)
    // columnar formats refuse the single-file/zip renderers
    intercept[Orchestrator.ValidationException] {
      Orchestrator.validate(SequenceDef("s", Seq("z"), Seq(
        PipelineDef("z", FileSource(src),
          load = Some(LoadDef("/out", formats = Seq("orc"), zip = true))))))
    }
  }

  test("zero-config simple mode: bare args run the reference's default " +
    "pipeline — sample fallback, processed flags, value>20 branch, etl_output.zip") {
    // bare run and flags-only runs both select zero-config mode
    assert(Main.parseArgs(Array.empty).configPath === "")
    assert(Main.parseArgs(Array("--monitor")).configPath === "")
    val dir = java.nio.file.Files.createTempDirectory("graft_simple").toString
    // unreachable endpoint → S8 sample-data fallback, like the reference
    // demo without network
    val seq = Main.simpleSequence(Map(
      "GRAFT_API_ENDPOINT" -> "http://127.0.0.1:1/posts",
      "GRAFT_OUTPUT_PATH" -> dir))
    assert(Main.run(spark, seq, Main.Args("",
      metricsOut = Some(s"$dir/m.json"))) === 0)
    val zipPath = java.nio.file.Paths.get(s"$dir/etl_output.zip")
    assert(java.nio.file.Files.exists(zipPath), "etl_output.zip written")
    val zf = new java.util.zip.ZipFile(zipPath.toFile)
    try {
      import scala.jdk.CollectionConverters._
      val names = zf.entries().asScala.map(_.getName).toSet
      assert(names.exists(_.endsWith(".csv")) && names.exists(_.endsWith(".tsv")))
      assert(names.exists(_.contains("intermediate")),
        s"value>20 branch must produce the intermediate entry: $names")
      assert(names.exists(_.contains("metadata")))
      val csvEntry = zf.entries().asScala.find(_.getName.endsWith(".csv")).get
      val csv = new String(zf.getInputStream(csvEntry).readAllBytes())
      assert(csv.contains("processed")) // P7 flags on
      assert(csv.contains("Item 3"))    // the 5 fixed sample items
      val im = zf.entries().asScala.find(_.getName.contains("intermediate")).get
      val imText = new String(zf.getInputStream(im).readAllBytes())
      // value > 20 strictly: items 3,4,5 (30/40/50); item 2 (20) excluded
      assert(imText.contains("Item 3") && imText.contains("Item 5"))
      assert(!imText.contains("Item 2"))
    } finally zf.close()
  }

  test("--only/--skip select pipelines like the CLI flags") {
    val (_, src) = writeFixture()
    import graft.config._
    val mk = (n: String) => PipelineDef(n, FileSource(src),
      transform = TransformDef(addProcessedFlags = false))
    val seq = SequenceDef("s", Seq("a", "b", "c"), Seq(mk("a"), mk("b"), mk("c")))
    val ctx = Orchestrator.execute(spark, seq, only = Set("a", "c"), skip = Set("c"))
    assert(ctx.results.keySet === Set("a"))
  }
}
