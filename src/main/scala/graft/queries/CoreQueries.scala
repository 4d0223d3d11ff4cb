package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Ops
import Tables.t

/** Harness queries covering the reference's operator inventory
  * (SURVEY.md §2), one per operator ID, each with a DuckDB oracle.
  * Every query ends in a deterministic ORDER BY so the driver's
  * hash-compare is stable regardless of partitioning. */
object CoreQueries {

  val defs: Seq[QDef] = Seq(

    // ----- P1: field rename (contextual_pipeline.rs:530-535) -----
    QDef.sql(
      "p1_rename",
      """SELECT l_orderkey AS order_id, l_linenumber AS line_no,
        |       l_quantity AS qty
        |FROM lineitem ORDER BY order_id, line_no""".stripMargin) { (s, dir) =>
      val renamed = Ops.rename(Map(
        "l_orderkey" -> "order_id",
        "l_linenumber" -> "line_no",
        "l_quantity" -> "qty"))(t(s, dir, "lineitem"))
      renamed.select("order_id", "line_no", "qty").orderBy("order_id", "line_no")
    },

    // ----- P2: nested-path extraction (JSON) (contextual_pipeline.rs:681-743) -----
    QDef.sql(
      "p2_json_path",
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")
    },

    // ----- P2b: the pathCol struct walker itself (Ops.pathCol), driven
    // over constructed nested structs + arrays-of-structs so the oracle
    // validates the exact GetStructField / try_element_at / [*] chain the
    // engine compiles for config mappings -----
    QDef.sql(
      "p2_struct_walk",
      """SELECT o_orderkey,
        |       o_custkey AS cust_id,
        |       CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_totalprice END AS first_price,
        |       o_totalprice AS last_price
        |FROM orders ORDER BY o_orderkey LIMIT 500""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders").orderBy("o_orderkey").limit(500)
      // nested struct + array of structs built from real columns
      val nested = o.select(
        col("o_orderkey"),
        struct(struct(col("o_custkey").as("id")).as("who")).as("meta"),
        when(col("o_orderkey") % 3 === 0, array().cast("array<struct<p:double>>"))
          .otherwise(array(struct(col("o_totalprice").as("p")),
            struct(col("o_totalprice").as("p")))).as("items"),
        array(struct(col("o_totalprice").as("p"))).as("tail"))
      nested.select(
        col("o_orderkey"),
        Ops.pathCol("meta.who.id").as("cust_id"),        // P2 deep walk
        Ops.pathCol("items[0].p").as("first_price"),     // P3 index (empty → null)
        Ops.pathCol("tail[-1].p").as("last_price"))      // P3 negative index
        .orderBy("o_orderkey")
    },

    // ----- P3: array index incl. negative (contextual_pipeline.rs:746-815) -----
    QDef.sql(
      "p3_array_index",
      """SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS first_val,
        |       CAST(embedding[-1] AS DOUBLE) AS last_val
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      t(s, dir, "embeddings")
        .select(col("vec_id"),
          Ops.pathCol("embedding[0]").cast("double").as("first_val"),
          Ops.pathCol("embedding[-1]").cast("double").as("last_val"))
        .orderBy("vec_id")
    },

    // ----- P4: [*] flat-map (contextual_pipeline.rs:762-780) -----
    QDef.sql(
      "p4_flatmap",
      """SELECT doc_id,
        |       unnest(generate_series(1, len(string_split(text, ' ')))) - 1 AS pos,
        |       unnest(list_transform(string_split(text, ' '), w -> upper(w))) AS word
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(transform(split(col("text"), " "), w => upper(w)))
            .as(Seq("pos", "word")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("word"))
        .orderBy("doc_id", "pos")
    },

    // ----- P5: keep-only projection (contextual_pipeline.rs:900-924) -----
    QDef.sql(
      "p5_keep_only",
      "SELECT p_partkey, p_brand, p_retailprice FROM part ORDER BY p_partkey") { (s, dir) =>
      Ops.keepOnly(Seq("p_partkey", "p_brand", "p_retailprice", "not_there"))(
        t(s, dir, "part")).orderBy("p_partkey")
    },

    // ----- P6: exclude projection (contextual_pipeline.rs:925-945) -----
    QDef.sql(
      "p6_exclude",
      "SELECT s_suppkey, s_name, s_nationkey FROM supplier ORDER BY s_suppkey") { (s, dir) =>
      Ops.exclude(Seq("s_acctbal"))(t(s, dir, "supplier")).orderBy("s_suppkey")
    },

    // ----- P7: constant flag columns (contextual_pipeline.rs:980-987) -----
    QDef.sql(
      "p7_constants",
      """SELECT r_regionkey, r_name, TRUE AS processed, 'graft' AS processed_by
        |FROM region ORDER BY r_regionkey""".stripMargin) { (s, dir) =>
      Ops.constants("graft")(t(s, dir, "region")).orderBy("r_regionkey")
    },

    // ----- P8: sorted column order (contextual_pipeline.rs:990-1009) -----
    QDef.sql(
      "p8_col_order",
      "SELECT n_name, n_nationkey, n_regionkey FROM nation ORDER BY n_nationkey") { (s, dir) =>
      Ops.sortColumns(t(s, dir, "nation")).orderBy("n_nationkey")
    },

    // ----- F1: all-fields-equal filter (contextual_pipeline.rs:1064-1083) -----
    QDef.sql(
      "f1_filter_eq",
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus
        |FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      Ops.equalityFilter(Map("l_returnflag" -> "R", "l_linestatus" -> "F"))(
        t(s, dir, "lineitem"))
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ----- F2: hardcoded threshold filter (simple_pipeline.rs:113-116) -----
    QDef.sql(
      "f2_threshold",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 20 ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 20)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ----- F3: MVP id filter (mvp_pipeline.rs:192-195) -----
    QDef.sql(
      "f3_id_filter",
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_orderkey = 1 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      Ops.equalityFilter(Map("o_orderkey" -> 1))(
        t(s, dir, "orders").select("o_orderkey", "o_custkey"))
        .orderBy("o_orderkey")
    },

    // ----- Skew-salted join equivalence (LX1): same rows as a plain join -----
    QDef.sql(
      "x_salted_join",
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_brand
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin) { (s, dir) =>
      val part = t(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      Ops.saltedJoin(part, "l_partkey", salt = 8)(
        t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "p_brand")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ----- F4: row limit after deterministic order (mvp_pipeline.rs:74-109) -----
    QDef.sql(
      "f4_limit",
      "SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 100") { (s, dir) =>
      Ops.limitRows(100)(
        t(s, dir, "orders").select("o_orderkey", "o_custkey").orderBy("o_orderkey"))
    },

    // ----- F5: first-record-only (toml_config.rs:202-204) -----
    QDef.sql(
      "f5_first_record",
      "SELECT o_orderkey, o_custkey FROM orders ORDER BY o_orderkey LIMIT 1") { (s, dir) =>
      Ops.limitRows(1)(
        t(s, dir, "orders").select("o_orderkey", "o_custkey").orderBy("o_orderkey"))
    },

    // ----- F6: extract.filters (declared-only in reference, sequence_config.rs:72) -----
    QDef.sql(
      "f6_in_filter",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Ops.inFilter("c_mktsegment", Seq("BUILDING", "AUTOMOBILE"))(
        t(s, dir, "customer"))
        .select("c_custkey", "c_mktsegment").orderBy("c_custkey")
    },

    // ----- D1: full-record dedup (contextual_pipeline.rs:630-637) -----
    QDef.sql(
      "d1_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus
        |FROM lineitem ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Ops.dedupAll(t(s, dir, "lineitem").select("l_returnflag", "l_linestatus"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ----- D2: field-subset dedup, deterministic first (contextual_pipeline.rs:613-629) -----
    QDef.sql(
      "d2_dedup_fields",
      """SELECT o_custkey, o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS first_date
        |FROM orders
        |QUALIFY row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_orderdate, o_orderkey) = 1
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      Ops.dedupFields(Seq("o_custkey"), Seq(col("o_orderdate"), col("o_orderkey")))(
        t(s, dir, "orders"))
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("first_date"))
        .orderBy("o_custkey")
    },

    // ----- O1: typed sort + top-k (contextual_pipeline.rs:646-672) -----
    QDef.sql(
      "o1_sort_typed",
      """SELECT p_partkey, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 200""".stripMargin) { (s, dir) =>
      t(s, dir, "part").select("p_partkey", "p_retailprice")
        .orderBy(col("p_retailprice").desc, col("p_partkey")).limit(200)
    },

    // ----- O1 bug-compatible: lexicographic string sort ("10" < "9") -----
    QDef.sql(
      "o1_sort_string",
      """SELECT o_orderkey FROM orders
        |ORDER BY CAST(o_orderkey AS VARCHAR) LIMIT 100""".stripMargin) { (s, dir) =>
      Ops.sortBy("o_orderkey", ascending = true, stringMode = true)(
        t(s, dir, "orders").select("o_orderkey")).limit(100)
    },

    // ----- J1: keyed merge, API-wins coalesce (sequence_pipeline.rs:77-108) -----
    QDef.sql(
      "j1_merge_prev",
      """SELECT o.o_orderkey,
        |       o.o_custkey AS id,
        |       o.o_totalprice AS total,
        |       COALESCE(CASE WHEN o.o_orderkey % 2 = 0 THEN 'api_name' END,
        |                c.c_name) AS name,
        |       c.c_acctbal AS acctbal
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin) { (s, dir) =>
      val api = t(s, dir, "orders").select(
        col("o_orderkey"),
        col("o_custkey").as("id"),
        col("o_totalprice").as("total"),
        when(col("o_orderkey") % 2 === 0, lit("api_name")).as("name"))
      val prev = t(s, dir, "customer").select(
        col("c_custkey").as("id"),
        col("c_name").as("name"),
        col("c_acctbal").as("acctbal"))
      Ops.mergeWithPrevious(prev, "id")(api)
        .select("o_orderkey", "id", "total", "name", "acctbal")
        .orderBy("o_orderkey")
    },

    // ----- J3: enrichment placeholder (contextual_pipeline.rs:949-961) -----
    QDef.sql(
      "j3_enrich",
      """SELECT n_nationkey, n_name, 'enriched_' || n_name AS n_name_enriched
        |FROM nation ORDER BY n_nationkey""".stripMargin) { (s, dir) =>
      Ops.enrichPlaceholder(Map("n_name" -> "n_name_enriched"))(
        t(s, dir, "nation"))
        .select("n_nationkey", "n_name", "n_name_enriched")
        .orderBy("n_nationkey")
    },

    // ----- S6/S7: schema-drift union (contextual_pipeline.rs:60-91) -----
    QDef.sql(
      "s6_union_by_name",
      """SELECT * FROM (
        |  SELECT r_name AS name, r_regionkey AS key, 'region' AS src, NULL AS extra
        |  FROM region
        |  UNION ALL BY NAME
        |  SELECT n_name AS name, n_nationkey AS key, 'nation' AS src,
        |         CAST(n_regionkey AS VARCHAR) AS extra
        |  FROM nation
        |) ORDER BY src, key""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "region").select(
        col("r_name").as("name"), col("r_regionkey").cast("int").as("key"),
        lit("region").as("src"))
      val b = t(s, dir, "nation").select(
        col("n_name").as("name"), col("n_nationkey").cast("int").as("key"),
        lit("nation").as("src"), col("n_regionkey").cast("string").as("extra"))
      Ops.unionAll(Seq(a, b)).select("name", "key", "src", "extra")
        .orderBy("src", "key")
    },

    // ----- S9/J3: lookup-file broadcast join + aggregation (ports.rs:17) -----
    // Revenue in EXACT integer 1e-4-dollar units (the q1_pricing money
    // convention): the r13 ROUND(SUM(double), 2) form demanded 1e-12
    // relative determinism from an order-dependent parallel double sum
    // once brand groups reached 1e10 magnitude at sf1 — a penny
    // knife-edge that flipped run to run in EITHER engine. Per-row
    // cents recovery is exact (prices/discounts have 2-decimal
    // granularity), the DECIMAL(38,0) internal sum is associative.
    QDef.sql(
      "s9_lookup_join",
      """SELECT p.p_brand,
        |       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
        |            AS BIGINT) AS revenue_e4,
        |       CAST(COUNT(*) AS BIGINT) AS n_items
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
      val part = t(s, dir, "part").select(col("p_partkey").as("l_partkey"), col("p_brand"))
      val revE4 = round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))
      Ops.lookupJoin(part, "l_partkey", "inner")(li)
        .groupBy("p_brand")
        .agg(sum(revE4.cast("decimal(38,0)")).cast("long").as("revenue_e4"),
          count(lit(1)).as("n_items"))
        .orderBy("p_brand")
    },

    // ----- A1: run-summary aggregates (sequence_pipeline.rs:276-306) -----
    QDef.sql(
      "a1_summary",
      """SELECT CAST(COUNT(*) AS BIGINT) AS total_records,
        |       ROUND(SUM(l_quantity), 2) AS total_qty,
        |       ROUND(AVG(l_extendedprice), 2) AS avg_price,
        |       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").agg(
        count(lit(1)).as("total_records"),
        round(sum("l_quantity"), 2).as("total_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        countDistinct("l_orderkey").as("n_orders"))
    },

    // ----- X1: clean_text (contextual_pipeline.rs:882-889) -----
    QDef.sql(
      "x1_clean_text",
      """SELECT doc_id,
        |  replace(regexp_replace(text, '^\s+|\s+$', '', 'g'), chr(10), ' ')
        |    AS text
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Ops.cleanText(t(s, dir, "documents").select("doc_id", "text"))
        .orderBy("doc_id")
    },

    // ----- X2: normalize_fields lowercase (contextual_pipeline.rs:891-898) -----
    QDef.sql(
      "x2_normalize",
      """SELECT c_custkey, lower(c_mktsegment) AS c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      Ops.normalizeFields(Seq("c_mktsegment"))(
        t(s, dir, "customer").select("c_custkey", "c_mktsegment"))
        .orderBy("c_custkey")
    },

    // ----- X3: computed_fields (contextual_pipeline.rs:963-977) -----
    QDef.sql(
      "x3_computed",
      """SELECT o_orderkey,
        |       CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS record_index,
        |       'graft-pipeline' AS pipeline_name,
        |       'exec-verify' AS execution_id
        |FROM orders ORDER BY o_orderkey LIMIT 1000""".stripMargin) { (s, dir) =>
      Ops.computedFields(
        // insertion order matters only for display; resolved per-field
        Map("record_index" -> "record_index",
          "pipeline_name" -> "pipeline_name",
          "execution_id" -> "execution_id"),
        pipelineName = "graft-pipeline",
        executionId = "exec-verify",
        orderBy = Seq(col("o_orderkey")))(
        t(s, dir, "orders").select("o_orderkey"))
        .select("o_orderkey", "record_index", "pipeline_name", "execution_id")
        .orderBy("o_orderkey").limit(1000)
    },

    // ----- X6: trim + HTML strip (declared-only in reference, toml_config.rs:59-60) -----
    QDef.sql(
      "x6_html_strip",
      """SELECT doc_id,
        |       regexp_replace('<b>' || text || '</b>', '<[^>]*>', '', 'g') AS text
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val withHtml = t(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), concat(lit("<b>"), col("text"), lit("</b>")).as("text"))
      Ops.removeHtmlTags(Seq("text"))(withHtml).orderBy("doc_id")
    })
}
