package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{ParquetResolver, StudyRunner, Interpreter, PipelineContext}
import graft.io.{ConfigReader, Export, NestedStore, Standardized}
import graft.llm.{Dedup, Multimodal, Similarity, Sketch, TextAnalysis}
import graft.model._
import graft.ops.Ops

/** Query registry — data-quality rule engine and approx-sketch audits (HLL/GK/CMS) with exact twins.
  *
  * Split out of SparkEntry (round 13) purely for maintainability: the
  * public driver contract is still `SparkEntry.queries` /
  * `SparkEntry.oracleSql`, which concatenate the per-family maps.
  * Helpers shared across families live in [[QueryHelpers]].
  */
private[graft] object DqSketchQueries {
  import QueryHelpers._

  val queries: Map[String, (SparkSession, String) => DataFrame] = reg(
    // mergeable-sketch union NDV: each snapshot reduces to ONE
    // DataSketches HLL sketch; the union estimate merges sketches
    // without rescanning either side (exact twin + envelope gate)
    "sketch_union_ndv" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val base = docs.where(col("doc_id") % 17 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      val added = docs.where(col("doc_id") % 19 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      graft.llm.Sketch.unionNdvAudit("text")(docs, base.unionByName(added))
    }),
    // snapshot-overlap NDV by inclusion-exclusion over the same
    // mergeable sketches as sketch_union_ndv (absolute error band —
    // a small intersection of large sets is genuinely hard)
    "sketch_inter_ndv" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val base = docs.where(col("doc_id") % 17 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      val added = docs.where(col("doc_id") % 19 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      graft.llm.Sketch.intersectionNdvAudit("text")(docs, base.unionByName(added))
    }),
    // ===== data-quality rule engine (ops/DataQuality.scala) =====
    // rules arrive as config ROWS (the reference's worksheet idiom)
    // and evaluate in ONE scan regardless of rule count
    "dq_summary" -> ((s, d) => {
      import s.implicits._
      val rules = graft.ops.DataQuality.rulesFromConfig(Seq(
        ("nn_orderkey", "NOT_NULL", "l_orderkey", null, null),
        ("qty_bounds", "BOUNDS", "l_quantity", "1", "30"),
        ("disc_bounds", "BOUNDS", "l_discount", "0", "0.05"),
        ("flag_set", "IN_SET", "l_returnflag", "A|N", null)
      ).toDF("rule_name", "rule_type", "column", "param1", "param2"))
      graft.ops.DataQuality.summary(t(s, d, "lineitem"), rules)
    }),
    "dq_row_flags" -> ((s, d) => {
      import s.implicits._
      val rules = graft.ops.DataQuality.rulesFromConfig(Seq(
        ("qty_bounds", "BOUNDS", "l_quantity", "1", "30"),
        ("disc_bounds", "BOUNDS", "l_discount", "0", "0.05"),
        ("flag_set", "IN_SET", "l_returnflag", "A|N", null)
      ).toDF("rule_name", "rule_type", "column", "param1", "param2"))
      graft.ops.DataQuality.rowFlags(t(s, d, "lineitem"), rules,
        Seq("l_orderkey", "l_linenumber"))
    }),
    "dq_clean_rows" -> ((s, d) => {
      import s.implicits._
      val rules = graft.ops.DataQuality.rulesFromConfig(Seq(
        ("qty_bounds", "BOUNDS", "l_quantity", "1", "30"),
        ("disc_bounds", "BOUNDS", "l_discount", "0", "0.05"),
        ("flag_set", "IN_SET", "l_returnflag", "A|N", null)
      ).toDF("rule_name", "rule_type", "column", "param1", "param2"))
      graft.ops.DataQuality.cleanRows(t(s, d, "lineitem"), rules)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")
    }),
    "dq_ref_coverage" -> ((s, d) =>
      graft.ops.DataQuality.refCoverage(
        eventsNanos(s, d), "user_id", t(s, d, "customer"), "c_custkey")),

    // ===== approx/sketch audit family (llm/Sketch.scala) =====
    // HLL++/GK twins of the exact audits above: each query computes
    // the exact statistic AND a boolean pinning the sketch inside its
    // error envelope; the oracle replays the exact value with
    // `TRUE` literals, so the hash gate fails iff the sketch drifts.
    // per-language vocabulary NDV (sketch twin of text_vocabulary)
    "sketch_ndv_vocab" -> ((s, d) =>
      Sketch.ndvAudit(Seq("lang"), "token")(
        t(s, d, "documents").select(col("lang"),
          explode(split(col("text"), " ")).as("token")))),
    // distinct users per event type — the classic telemetry audit
    "sketch_ndv_events" -> ((s, d) =>
      Sketch.ndvAudit(Seq("event_type"), "user_id")(
        eventsNanos(s, d).select("event_type", "user_id"))),
    // one-row whole-corpus headline: distinct docs / vocab / languages
    "sketch_corpus_ndv" -> ((s, d) =>
      Sketch.corpusNdvAudit(Seq(
        "docs" -> col("doc_id"),
        "vocab" -> col("token"),
        "langs" -> col("lang")))(
        t(s, d, "documents").select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("token")))),
    // per-language doc-length distribution via GK percentiles
    "sketch_doclen_quantiles" -> ((s, d) =>
      Sketch.quantileAudit(Seq("lang"), "n_tokens")(
        TextAnalysis.withTokenStats("text")(t(s, d, "documents"))
          .select("lang", "n_tokens"))),
    // top-20 corpus tokens exactly, each pinned inside the CountMin
    // envelope (CMS merge is counter addition — partitioning-exact)
    "sketch_heavy_hitters" -> ((s, d) =>
      Sketch.heavyHittersAudit("token", topN = 20)(
        t(s, d, "documents").select(explode(split(col("text"), " ")).as("token")))),
  )

  val oracleSql: Map[String, String] = reg(
    // data-quality summary: per-rule violation counts over one scan;
    // null semantics — NOT_NULL counts nulls, other kinds skip them
    "dq_summary" ->
      """WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM lineitem)
        |SELECT 'nn_orderkey' AS rule_name,
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem WHERE l_orderkey IS NULL) AS n_violations,
        |  n.n_rows, (SELECT count(*) FROM lineitem WHERE l_orderkey IS NULL) = 0 AS pass FROM n
        |UNION ALL
        |SELECT 'qty_bounds',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |   WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 30)),
        |  n.n_rows,
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 30)) = 0 FROM n
        |UNION ALL
        |SELECT 'disc_bounds',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |   WHERE l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.05)),
        |  n.n_rows,
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.05)) = 0 FROM n
        |UNION ALL
        |SELECT 'flag_set',
        |  (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        |   WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N')),
        |  n.n_rows,
        |  (SELECT count(*) FROM lineitem
        |   WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N')) = 0 FROM n""".stripMargin,
    "dq_row_flags" ->
      """SELECT l_orderkey, l_linenumber, 'qty_bounds' AS rule_name FROM lineitem
        |WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 30)
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'disc_bounds' FROM lineitem
        |WHERE l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.05)
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'flag_set' FROM lineitem
        |WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N')""".stripMargin,
    "dq_clean_rows" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
        |FROM lineitem
        |WHERE NOT ((l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 30))
        |        OR (l_discount IS NOT NULL AND (l_discount < 0 OR l_discount > 0.05))
        |        OR (l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A', 'N')))""".stripMargin,
    "dq_ref_coverage" ->
      """SELECT CAST((SELECT count(*) FROM events) AS BIGINT) AS n_rows,
        |  CAST((SELECT count(*) FROM events e
        |        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) AS BIGINT) AS n_orphans,
        |  (SELECT count(*) FROM events e
        |   WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)) = 0 AS pass""".stripMargin,
    // sketch audits: the oracle replays the EXACT statistic and pins
    // the ok-booleans to TRUE — hash mismatch iff the sketch leaves
    // its error envelope (see llm/Sketch.scala Scaladoc)
    "sketch_ndv_vocab" ->
      """SELECT lang, count(DISTINCT token) AS exact_ndv, TRUE AS ndv_ok
        |FROM (SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY 1""".stripMargin,
    "sketch_ndv_events" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_ndv, TRUE AS ndv_ok
        |FROM events GROUP BY 1""".stripMargin,
    "sketch_corpus_ndv" ->
      """SELECT count(DISTINCT doc_id) AS exact_docs, TRUE AS docs_ok,
        |  count(DISTINCT token) AS exact_vocab, TRUE AS vocab_ok,
        |  count(DISTINCT lang) AS exact_langs, TRUE AS langs_ok
        |FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token FROM documents)""".stripMargin,
    "sketch_doclen_quantiles" ->
      """SELECT lang, count(*) AS n,
        |  quantile_cont(CAST(len(string_split(text, ' ')) AS INTEGER), 0.5) AS p50_exact,
        |  TRUE AS p50_ok, TRUE AS p90_ok
        |FROM documents GROUP BY 1""".stripMargin,
    "sketch_heavy_hitters" ->
      """SELECT value, exact_n, TRUE AS cms_ok FROM (
        |  SELECT token AS value, count(*) AS exact_n
        |  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY 1 ORDER BY exact_n DESC, value ASC LIMIT 20)""".stripMargin,
    "sketch_inter_ndv" ->
      """WITH newsnap AS (
        |  SELECT CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 != 0
        |  UNION ALL
        |  SELECT text FROM documents WHERE doc_id % 19 = 0),
        |a AS (SELECT DISTINCT text FROM documents),
        |b AS (SELECT DISTINCT text FROM newsnap)
        |SELECT CAST(count(*) AS BIGINT) AS exact_inter_ndv, TRUE AS inter_ndv_ok
        |FROM a WHERE text IN (SELECT text FROM b)""".stripMargin,
    "sketch_union_ndv" ->
      """WITH newsnap AS (
        |  SELECT CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 != 0
        |  UNION ALL
        |  SELECT text FROM documents WHERE doc_id % 19 = 0),
        |u AS (SELECT text FROM documents UNION ALL SELECT text FROM newsnap)
        |SELECT CAST(count(DISTINCT text) AS BIGINT) AS exact_union_ndv,
        |       TRUE AS union_ndv_ok
        |FROM u""".stripMargin,
  )
}
