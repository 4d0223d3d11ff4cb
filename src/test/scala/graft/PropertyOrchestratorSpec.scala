package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.engine.Orchestrator

/** Randomized differential test of the config engine: N seeded random
  * pipeline configs run through the orchestrator and checked against an
  * INDEPENDENT row-at-a-time interpreter written in the reference's
  * idiom (per-record loops over Map rows — the shape of
  * contextual_pipeline.rs), not against the DataFrame ops under test.
  * The example-based oracle harness covers each operator in isolation;
  * this sweep covers their COMPOSITION: filters→dedup→sort→limit in the
  * extract phase (reference order, contextual_pipeline.rs:608-676) then
  * clean→normalize→strip→rename→project→flags→column-order in the
  * transform phase (:879-1121).
  *
  * Determinism discipline — the random space only emits configs with a
  * well-defined result: subset dedup only on a key whose duplicate rows
  * are full-row identical; limits only under a unique total order; order
  * asserted via sortedness (ties are unordered), content via multisets.
  */
class PropertyOrchestratorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private type Row = Map[String, Any]

  /** Fixture corpus: nulls, exact duplicate rows (ids 90/91), messy
    * whitespace/newlines/html in `name`, ties in `value` and
    * string-vs-numeric-order traps (value 9 vs 10). */
  private val fixtureRows: Seq[Row] = {
    val cats = Seq("a", "b", "c", null)
    val names = Seq("  Alpha\n", "beta\t", "<b>Gamma</b>", "delta  ",
      " ep\nsilon ", null)
    val base = (0 until 44).map { i =>
      Map[String, Any](
        "id" -> i.toLong,
        "category" -> cats(i % cats.size),
        "value" -> Seq(2L, 9L, 10L, 21L, 100L)(i % 5),
        "name" -> names(i % names.size))
    }
    // exact duplicate full rows: full dedup and dedup-by-id both
    // deterministic over them
    val dups = Seq(90L, 90L, 91L, 91L, 91L).map(i =>
      Map[String, Any]("id" -> i, "category" -> "a", "value" -> 9L,
        "name" -> "dup\n row"))
    base ++ dups
  }

  private lazy val fixturePath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_prop").toString
    import spark.implicits._
    fixtureRows.map(r => (r("id").asInstanceOf[Long],
        Option(r("category").asInstanceOf[String]),
        r("value").asInstanceOf[Long],
        Option(r("name").asInstanceOf[String])))
      .toDF("id", "category", "value", "name")
      .coalesce(2)
      .write.mode("overwrite").parquet(s"$dir/t")
    s"$dir/t"
  }

  // ----- the independent interpreter (reference idiom) -----------------

  private def trimWs(s: String): String = s.replaceAll("^\\s+|\\s+$", "")

  private def cmpTyped(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => 0
  }

  /** asc: nulls/missing last; desc: nulls first (Ops.sortBy contract). */
  private def sortRows(rows: Seq[Row], field: String, asc: Boolean,
      asString: Boolean): Seq[Row] = {
    def key(r: Row): Any = r.getOrElse(field, null)
    val (nulls, present) = rows.partition(r => key(r) == null)
    val sorted = present.sortWith { (r1, r2) =>
      val c =
        if (asString) String.valueOf(key(r1)).compareTo(String.valueOf(key(r2)))
        else cmpTyped(key(r1), key(r2))
      if (asc) c < 0 else c > 0
    }
    if (asc) sorted ++ nulls else nulls ++ sorted
  }

  private def interpret(p: PipelineDef, input: Seq[Row]): Seq[Row] = {
    var rows = input
    // extract: field mapping FIRST (reference location,
    // sequence_config.rs:73) so filters/dedup/sort see mapped names
    if (p.extract.fieldMapping.nonEmpty)
      rows = rows.map(r => p.extract.fieldMapping.foldLeft(r) {
        case (r2, (src, dst)) =>
          if (r2.contains(src)) (r2 - src).updated(dst, r2(src)) else r2
      })
    // then: filters -> dedup -> sort -> limit
    p.extract.filters.foreach { case (f, v) =>
      v match {
        case vs: Seq[_] =>
          rows = rows.filter(r => r.get(f).exists(x => x != null && vs.contains(x)))
        case single =>
          rows = rows.filter(r => r.get(f).exists(x => x != null && x == single))
      }
    }
    val proc = p.extract.processing
    if (proc.deduplicateFields.nonEmpty) {
      // fixture guarantees duplicate keys carry identical full rows
      val seen = scala.collection.mutable.LinkedHashSet.empty[Seq[Any]]
      rows = rows.filter { r =>
        seen.add(proc.deduplicateFields.map(f => r.getOrElse(f, null)))
      }
    } else if (proc.deduplicate) rows = rows.distinct
    proc.sortBy.foreach { f =>
      rows = sortRows(rows, f, proc.sortOrder.toLowerCase != "desc",
        proc.sortAsString)
    }
    if (p.extract.firstRecordOnly) rows = rows.take(1)
    else p.extract.maxRecords.foreach(n => rows = rows.take(n))
    // transform: clean -> trim -> normalize -> html -> rename ->
    // keep/exclude(P6 iff no P5) -> flags
    val t = p.transform
    def mapStrings(f: String => String): Unit =
      rows = rows.map(_.map {
        case (k, s: String) => k -> f(s)
        case kv => kv
      })
    if (t.cleanText) mapStrings(s => trimWs(s).replace("\n", " "))
    if (t.trimWhitespace) mapStrings(trimWs)
    if (t.normalizeFields.nonEmpty)
      rows = rows.map(r => t.normalizeFields.foldLeft(r) { (r2, f) =>
        r2.get(f) match {
          case Some(s: String) => r2.updated(f, s.toLowerCase)
          case _ => r2
        }
      })
    if (t.removeHtmlTagsFields.nonEmpty)
      rows = rows.map(r => t.removeHtmlTagsFields.foldLeft(r) { (r2, f) =>
        r2.get(f) match {
          case Some(s: String) => r2.updated(f, s.replaceAll("<[^>]*>", ""))
          case _ => r2
        }
      })
    if (t.fieldMapping.nonEmpty)
      rows = rows.map(r => t.fieldMapping.foldLeft(r) { case (r2, (src, dst)) =>
        if (r2.contains(src)) (r2 - src).updated(dst, r2(src)) else r2
      })
    if (t.keepOnlyFields.nonEmpty)
      rows = rows.map(r => r.filter(kv => t.keepOnlyFields.contains(kv._1)))
    else if (t.excludeFields.nonEmpty)
      rows = rows.map(r => r.filter(kv => !t.excludeFields.contains(kv._1)))
    // enrichment runs AFTER the projection (orchestrator order)
    if (t.enrichment.nonEmpty)
      rows = rows.map(r => t.enrichment.foldLeft(r) { case (r2, (src, dst)) =>
        r2.updated(dst, s"enriched_${r2(src)}")
      })
    if (t.computedFields.nonEmpty)
      t.computedFields.foreach { case (name, e) =>
        e match {
          case "record_index" =>
            // 0-based global index under the configured unique order
            val ordered = rows.sortBy(_(t.recordIndexOrderBy.head)
              .asInstanceOf[Long])
            rows = ordered.zipWithIndex.map { case (r, i) =>
              r.updated(name, i.toLong)
            }
          case "pipeline_name" => rows = rows.map(_.updated(name, p.name))
          case other => rows = rows.map(_.updated(name, other))
        }
      }
    if (t.addProcessedFlags)
      rows = rows.map(_ ++ Map[String, Any](
        "processed" -> true, "processed_by" -> p.name))
    rows
  }

  // ----- runner + comparison -------------------------------------------

  private def collectRows(
      df: org.apache.spark.sql.DataFrame): Seq[Row] =
    df.collect().toSeq.map { r =>
      df.columns.zipWithIndex.map { case (c, i) =>
        c -> (if (r.isNullAt(i)) null else r.get(i))
      }.toMap
    }

  private def runOne(cfg: PipelineDef, label: String): Unit = {
    val ctx = Orchestrator.execute(spark,
      SequenceDef(cfg.name, Seq(cfg.name), Seq(cfg)), unpersistOnEnd = false)
    val got = ctx.results(cfg.name).df.get
    val gotRows = collectRows(got)
    val expected = interpret(cfg, fixtureRows)
    // P8 column-order normalization always applies
    assert(got.columns.toSeq === got.columns.sorted.toSeq,
      s"$label: output columns must be name-sorted")
    def canon(rs: Seq[Row]) =
      rs.map(_.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
        .mkString("|")).sorted
    assert(canon(gotRows) === canon(expected),
      s"$label: multiset mismatch\nconfig: $cfg")
    // order contract: sorted output must BE sorted (ties unordered).
    // The extract-phase sort keys on PRE-transform values; when a
    // string-mutating transform rewrote a string sort field afterwards,
    // output order legitimately reflects the raw values, so the check
    // over final values only applies to untouched fields.
    val stringMutated = cfg.transform.cleanText ||
      cfg.transform.trimWhitespace ||
      cfg.transform.normalizeFields.nonEmpty ||
      cfg.transform.removeHtmlTagsFields.nonEmpty
    cfg.extract.processing.sortBy.foreach { f =>
      val asc = cfg.extract.processing.sortOrder.toLowerCase != "desc"
      val asString = cfg.extract.processing.sortAsString
      // resolve post-rename name of the sort field if it was renamed
      val outField = cfg.transform.fieldMapping.getOrElse(f, f)
      val isStringField = Seq("category", "name", "cat", "title").contains(outField)
      if (gotRows.forall(_.contains(outField)) &&
          !(isStringField && stringMutated)) {
        val keys = gotRows.map(_(outField))
        val resorted = sortRows(gotRows, outField, asc, asString).map(_(outField))
        assert(keys === resorted,
          s"$label: output not sorted by $outField asc=$asc str=$asString")
      }
    }
  }

  test("differential sweep: 220 seeded random configs match the " +
    "row-at-a-time reference interpreter") {
    val rnd = new Random(20260813L)
    def oneOf[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))
    for (i <- 0 until 260) {
      // extract-phase rename applies BEFORE filters/dedup/sort — when
      // on, every later reference to the value column uses the new name
      val extractRename = rnd.nextInt(4) == 0
      val valueField = if (extractRename) "val" else "value"
      val filters: Map[String, Any] = rnd.nextInt(4) match {
        case 0 => Map.empty
        case 1 => Map("category" -> oneOf(Seq("a", "b", "c")))
        case 2 => Map(valueField -> oneOf(Seq(2L, 9L, 10L, 21L)))
        case _ => Map("category" ->
          Seq(oneOf(Seq("a", "b")), oneOf(Seq("b", "c"))))
      }
      val (dedupAll, dedupFields) = rnd.nextInt(3) match {
        case 0 => (false, Nil)
        case 1 => (true, Nil)
        case _ => (false, Seq("id"))
      }
      val sortBy = oneOf(Seq(None, Some("id"), Some(valueField),
        Some("category"), Some("name")))
      val sortOrder = oneOf(Seq("asc", "desc"))
      val asString = rnd.nextBoolean()
      // limits only under a unique total order
      val (maxRecords, firstOnly) =
        if (sortBy.contains("id") && rnd.nextBoolean())
          if (rnd.nextBoolean()) (Some(1 + rnd.nextInt(8)), false)
          else (None, true)
        else (None, false)
      val rename: Map[String, String] = rnd.nextInt(3) match {
        case 0 => Map.empty
        case 1 => Map("category" -> "cat")
        case _ => Map("category" -> "cat", "name" -> "title")
      }
      val renamed = Seq("id", valueField) ++ rename.values ++
        (Seq("category", "name") diff rename.keys.toSeq)
      val keep =
        if (rnd.nextInt(3) == 0)
          rnd.shuffle(renamed).take(1 + rnd.nextInt(renamed.size)).toSeq
        else Nil
      val excl =
        if (rnd.nextInt(3) == 0) Seq(oneOf(renamed)) else Nil
      // enrichment and computed fields only when their source column
      // survives the projection
      val idSurvives = (keep.isEmpty || keep.contains("id")) &&
        !excl.contains("id")
      val enrichment =
        if (idSurvives && rnd.nextInt(3) == 0) Map("id" -> "id_enriched")
        else Map.empty[String, String]
      // record_index resorts the frame physically, so pair it only with
      // unsorted extracts (the multiset check still applies in full)
      val (computed, idxOrder) =
        if (idSurvives && sortBy.isEmpty && rnd.nextInt(3) == 0)
          rnd.nextInt(3) match {
            case 0 => (Map("rec_idx" -> "record_index"), Seq("id"))
            case 1 => (Map("src_pipeline" -> "pipeline_name"), Nil)
            case _ => (Map("tag" -> "static_tag"), Nil)
          }
        else (Map.empty[String, String], Nil)
      val cfg = PipelineDef(
        name = s"prop$i",
        source = FileSource(fixturePath),
        extract = ExtractDef(
          fieldMapping =
            if (extractRename) Map("value" -> "val")
            else Map.empty,
          maxRecords = maxRecords,
          firstRecordOnly = firstOnly,
          filters = filters,
          processing = DataProcessingDef(
            deduplicate = dedupAll,
            deduplicateFields = dedupFields,
            sortBy = sortBy,
            sortOrder = sortOrder,
            sortAsString = asString)),
        transform = TransformDef(
          fieldMapping = rename,
          keepOnlyFields = keep,
          excludeFields = excl,
          cleanText = rnd.nextBoolean(),
          trimWhitespace = rnd.nextBoolean(),
          // normalize/html run BEFORE fieldMapping in the transform
          // chain, so they always address the pre-rename name
          normalizeFields = if (rnd.nextBoolean()) Seq("name") else Nil,
          removeHtmlTagsFields = if (rnd.nextBoolean()) Seq("name") else Nil,
          enrichment = enrichment,
          computedFields = computed,
          recordIndexOrderBy = idxOrder,
          addProcessedFlags = rnd.nextBoolean()))
      runOne(cfg, s"config #$i")
    }
  }

  // ----- pinned reference behaviors the sweep relies on ----------------

  test("P6 precedence: exclude_fields is ignored when keep_only_fields " +
    "is present (contextual_pipeline.rs:925-945)") {
    val cfg = PipelineDef("p6", FileSource(fixturePath),
      transform = TransformDef(
        keepOnlyFields = Seq("id", "value"),
        excludeFields = Seq("value"), // must NOT apply
        addProcessedFlags = false))
    val ctx = Orchestrator.execute(spark,
      SequenceDef("s", Seq("p6"), Seq(cfg)), unpersistOnEnd = false)
    assert(ctx.results("p6").df.get.columns.sorted.toSeq === Seq("id", "value"))
  }

  test("extract order is dedup THEN sort THEN limit " +
    "(contextual_pipeline.rs:608-676): limit counts deduped rows") {
    val cfg = PipelineDef("ord", FileSource(fixturePath),
      extract = ExtractDef(
        filters = Map("id" -> Seq(90L, 91L)), // 5 physical rows, 2 distinct
        maxRecords = Some(2),
        processing = DataProcessingDef(deduplicate = true,
          sortBy = Some("id"), sortOrder = "desc")),
      transform = TransformDef(addProcessedFlags = false))
    val ctx = Orchestrator.execute(spark,
      SequenceDef("s", Seq("ord"), Seq(cfg)), unpersistOnEnd = false)
    val ids = ctx.results("ord").df.get.select("id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids === Seq(91L, 90L),
      "limit(2) after dedup+desc-sort must yield both distinct ids")
  }

  test("F1 semantics: a filter naming a missing field is a hard error, " +
    "not an empty result (contextual_pipeline.rs:1064-1083)") {
    val cfg = PipelineDef("f1m", FileSource(fixturePath),
      extract = ExtractDef(filters = Map("ghost_field" -> "x")),
      transform = TransformDef(addProcessedFlags = false))
    intercept[Exception] {
      Orchestrator.execute(spark,
        SequenceDef("s", Seq("f1m"), Seq(cfg)))
    }
  }
}
