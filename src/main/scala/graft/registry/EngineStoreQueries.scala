package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{ParquetResolver, StudyRunner, Interpreter, PipelineContext}
import graft.io.{ConfigReader, Export, NestedStore, Standardized}
import graft.llm.{Dedup, Multimodal, Similarity, Sketch, TextAnalysis}
import graft.model._
import graft.ops.Ops

/** Query registry — the config-driven engine pipelines and every source/sink family (nested store, SAS/CSV/JSONL/ORC/Avro, versioned reads, IVF model persistence).
  *
  * Split out of SparkEntry (round 13) purely for maintainability: the
  * public driver contract is still `SparkEntry.queries` /
  * `SparkEntry.oracleSql`, which concatenate the per-family maps.
  * Helpers shared across families live in [[QueryHelpers]].
  */
private[graft] object EngineStoreQueries {
  import QueryHelpers._

  val queries: Map[String, (SparkSession, String) => DataFrame] = reg(

    // ===== engine + sources/sinks =====
    "s1_nested_roundtrip" -> ((s, d) => {
      val base = t(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_quantity")
      NestedStore.flatten(NestedStore.nest(base, "l_returnflag", "l_linestatus"))
    }),
    "s6_upsert" -> ((s, d) => {
      // S6 keyed upsert: initial load = whole lineitem nested on
      // (l_returnflag, l_linestatus); second batch revises only the
      // l_returnflag='R' partitions (quantity doubled). Dynamic
      // partition overwrite must merge — R replaced, A/N untouched
      // (file-level preservation is pinned in IoSpec).
      val path = scratch("upsert_store_q")
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(path), true)
      val base = t(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_quantity")
      NestedStore.write(NestedStore.nest(base, "l_returnflag", "l_linestatus"),
        path, "l_returnflag", "l_linestatus")
      val revised = base.filter(col("l_returnflag") === "R")
        .withColumn("l_quantity", col("l_quantity") * 2)
      NestedStore.upsert(NestedStore.nest(revised, "l_returnflag", "l_linestatus"),
        path, "l_returnflag", "l_linestatus")
      NestedStore.flatten(s.read.parquet(path))
    }),
    "s6_erase" -> ((s, d) => {
      // right-to-be-forgotten roundtrip: every 'R' row erased (drops
      // whole partitions via the FS branch) plus high-quantity rows
      // everywhere (rewrites surviving partitions); untouched-file
      // preservation is pinned in IoSpec
      val path = scratch("erase_store_q")
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(path), true)
      val base = t(s, d, "lineitem")
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber", "l_quantity")
      NestedStore.write(NestedStore.nest(base, "l_returnflag", "l_linestatus"),
        path, "l_returnflag", "l_linestatus")
      NestedStore.erase(s, path,
        col("l_returnflag") === "R" || col("l_quantity") >= 40,
        "l_returnflag", "l_linestatus")
      NestedStore.flatten(s.read.parquet(path))
    }),
    "s7_standardized" -> ((s, d) => {
      val src = t(s, d, "customer").select(
        col("c_custkey").as("subject"), col("c_mktsegment").as("country"),
        col("c_nationkey").as("site"), col("c_acctbal").as("last_contact_date"))
      Standardized.flattenStandardized(Standardized.toStandardized(src, "S001"))
    }),
    "s2_analyte_scan" -> ((s, d) => {
      // S2 reading_analyte_data: scan the standardized store, flatten,
      // project — round-tripped through a real parquet write.
      val std = Standardized.toStandardized(
        t(s, d, "customer").select(
          col("c_custkey").as("subject"), col("c_mktsegment").as("country"),
          col("c_nationkey").as("site")), "S001")
      val path = scratch("std_store")
      std.write.mode("overwrite").parquet(path)
      Ops.selectColumnsTolerant(Seq("subject", "country"), distinct = false)(
        Standardized.flattenStandardized(s.read.parquet(path)))
    }),
    "s8_export_flatten" -> ((s, d) => {
      val base = t(s, d, "lineitem").select(
        col("l_returnflag"), col("l_linestatus"),
        col("l_orderkey").as("SUBJECT"), col("l_quantity"))
      Export.exportFlatten(NestedStore.nest(base, "l_returnflag", "l_linestatus"))
    }),
    "s9_parquet_append" -> ((s, d) => {
      // S9 evolving append sink: two writes with different schemas,
      // read back with mergeSchema.
      val path = scratch("append_q")
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(path), true)
      Export.writeParquetAppend(t(s, d, "region").select("r_regionkey", "r_name"), path)
      Export.writeParquetAppend(
        t(s, d, "nation").select(col("n_nationkey"), col("n_name")), path)
      s.read.option("mergeSchema", "true").parquet(path)
    }),
    "s10_csv_sink" -> ((s, d) => {
      val path = scratch("csv_sink_q")
      Export.writeCsv(t(s, d, "region"), path)
      s.read.option("header", "true").csv(path)
    }),
    // JSONL corpus roundtrip: write one JSON object per line, read
    // back with the EXPLICIT source schema (inference is a second
    // full scan at 100 TB) — lossless, gated against the plain table
    "s11_jsonl_roundtrip" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val path = scratch("jsonl_q")
      graft.io.Jsonl.write(docs, path)
      graft.io.Jsonl.read(s, path, docs.schema)
    }),
    // ORC lake roundtrip: write with the native ORC sink, read back
    // with the explicit source schema — gated against the plain table
    "s12_orc_roundtrip" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val path = scratch("orc_q")
      Export.writeOrc(docs, path)
      Export.readOrc(s, path, docs.schema)
    }),
    // native Avro container roundtrip on avro-core (no spark-avro in
    // this environment): distributed per-partition writers, per-file
    // reader tasks, schema from the first file's header only
    "s14_avro_roundtrip" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val path = scratch("avro_q")
      graft.io.Avro.write(docs, path)
      graft.io.Avro.read(s, path)
    }),
    // deployed IVF layout: corpus written partitioned by cell, probes
    // read back through directory pruning (PartitionFilters), same
    // top-k as the in-memory ivfTopK — gated against the SAME oracle
    "s16_ivf_cell_layout" -> ((s, d) => {
      val m = ivfModel(s, d)
      val emb = t(s, d, "embeddings")
      val path = scratch("ivf_cells_q")
      graft.llm.Ivf.writeCellLayout(emb, "vec_id", "embedding", m, path)
      graft.llm.Ivf.cellLayoutTopK(s, path, emb.where(col("vec_id") < 5),
        "vec_id", "embedding", m, k = 5, nProbe = 4)
    }),
    // steady-state index maintenance: two-thirds of the corpus laid
    // out once, the arriving third APPENDED under the same pinned
    // model (dynamic-partition append touches only the batch's own
    // cells) — probe answers must be indistinguishable from a full
    // rebuild, so the gate is the SAME full-corpus replay oracle
    "s17_ivf_append" -> ((s, d) => {
      val m = ivfModel(s, d)
      val emb = t(s, d, "embeddings")
      val path = scratch("ivf_cells_append_q")
      graft.llm.Ivf.writeCellLayout(
        emb.where(col("vec_id") % 3 =!= 0), "vec_id", "embedding", m, path)
      graft.llm.Ivf.appendToCellLayout(
        emb.where(col("vec_id") % 3 === 0), "vec_id", "embedding", m, path)
      graft.llm.Ivf.cellLayoutTopK(s, path, emb.where(col("vec_id") < 5),
        "vec_id", "embedding", m, k = 5, nProbe = 4)
    }),
    // the quantized store deployed: (id, scale, codes) rows behind
    // cell-directory pruning; stored codes rank AS-IS — probe answers
    // must match the in-memory quantized search (same replay oracle)
    "s18_ivf_quant_layout" -> ((s, d) => {
      val m = ivfModel(s, d)
      val emb = t(s, d, "embeddings")
      val path = scratch("ivf_quant_cells_q")
      graft.llm.Ivf.writeQuantCellLayout(emb, "vec_id", "embedding", m, path)
      graft.llm.Ivf.quantCellLayoutTopK(s, path, emb.where(col("vec_id") < 5),
        "vec_id", "embedding", m, k = 5, nProbe = 4)
    }),
    // quantized steady state (round 18): two-thirds of the corpus
    // quantized + laid out once, the arriving third APPENDED under
    // the same pinned model — dynamic-partition append touching only
    // the batch's cells, never a re-quantization pass. Probe answers
    // must be indistinguishable from a full quantized rebuild, so the
    // gate is the SAME full-corpus quantized replay oracle (the
    // s17_ivf_append move on the search tier's actual store)
    "s18_ivf_quant_append" -> ((s, d) => {
      val m = ivfModel(s, d)
      val emb = t(s, d, "embeddings")
      val path = scratch("ivf_quant_append_q")
      graft.llm.Ivf.writeQuantCellLayout(
        emb.where(col("vec_id") % 3 =!= 0), "vec_id", "embedding", m, path)
      graft.llm.Ivf.appendToQuantCellLayout(
        emb.where(col("vec_id") % 3 === 0), "vec_id", "embedding", m, path)
      graft.llm.Ivf.quantCellLayoutTopK(s, path, emb.where(col("vec_id") < 5),
        "vec_id", "embedding", m, k = 5, nProbe = 4)
    }),
    // deletion propagation, float layout (round 18): build the full
    // layout, ERASE a slice of vectors (touched cells' partitions
    // rewritten, emptied cells deleted), probe the survivors — the
    // oracle is the in-memory IVF replay over the SURVIVING corpus,
    // so a resurrected (or over-deleted) vector reads as a ranking
    // mismatch, not a spec assertion
    "s18_ivf_erase" -> ((s, d) => {
      val m = ivfModel(s, d)
      val emb = t(s, d, "embeddings")
      val path = scratch("ivf_cells_erase_q")
      graft.llm.Ivf.writeCellLayout(emb, "vec_id", "embedding", m, path)
      graft.llm.Ivf.eraseFromCellLayout(s, path, "vec_id",
        emb.where(col("vec_id") % 7 === 3).select("vec_id"))
      graft.llm.Ivf.cellLayoutTopK(s, path,
        emb.where(col("vec_id") < 5 && col("vec_id") % 7 =!= 3),
        "vec_id", "embedding", m, k = 5, nProbe = 4)
    }),
    // deletion propagation, quantized layout: same erase verb on the
    // (id, scale, codes) store — the search tier a deployment actually
    // serves from must forget WITH the float tier, or quantized
    // candidates resurrect deleted vectors into every rerank
    "s18_ivf_quant_erase" -> ((s, d) => {
      val m = ivfModel(s, d)
      val emb = t(s, d, "embeddings")
      val path = scratch("ivf_quant_erase_q")
      graft.llm.Ivf.writeQuantCellLayout(emb, "vec_id", "embedding", m, path)
      graft.llm.Ivf.eraseFromCellLayout(s, path, "vec_id",
        emb.where(col("vec_id") % 7 === 3).select("vec_id"))
      graft.llm.Ivf.quantCellLayoutTopK(s, path,
        emb.where(col("vec_id") < 5 && col("vec_id") % 7 =!= 3),
        "vec_id", "embedding", m, k = 5, nProbe = 4)
    }),
    // model-artifact lifecycle: save the trained quantizer, load it
    // back, and assign the corpus with the LOADED model — the oracle
    // is built from the TRAINED centroids, so a lossy round trip
    // (or order-scrambled reassembly) reads as a cell-id mismatch
    "s15_ivf_model_roundtrip" -> ((s, d) => {
      val path = scratch("ivf_model_q")
      graft.llm.Ivf.saveModel(ivfModel(s, d), path)(s)
      val loaded = graft.llm.Ivf.loadModel(s, path)
      graft.llm.Ivf.assign(t(s, d, "embeddings"), "vec_id", "embedding", loaded)
        .select(col("vec_id"), col("centroid_id").cast("int").as("centroid_id"))
    }),
    "engine_pipeline" -> ((s, d) => {
      val analyte = ConfigReader.readAnalyte(s, "cust_base", "/root/repo/fixtures/study_demo/cust_base")
      Interpreter.deriveAnalyte(PipelineContext(), analyte, new ParquetResolver(s, d))
        .result("cust_base")
    }),
    "engine_study" -> ((s, d) => {
      val study = ConfigReader.readStudy(s, "/root/repo/fixtures/study_demo")
      StudyRunner.run(study, new ParquetResolver(s, d))
    }),
    "engine_clinical_study" -> ((s, d) => {
      val storeDir = scratch("clinical_store")
      org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(storeDir), true)
      graft.io.ClinicalDemo.run(s, storeDir)
    }),

    "s1_keyed_scan" -> ((s, d) => {
      val store = scratch("store_q")
      val base = t(s, d, "lineitem").select(
        col("l_returnflag").as("study_code"), col("l_linestatus").as("view"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      NestedStore.write(NestedStore.nest(base, "study_code", "view"), store)
      NestedStore.flatten(
        s.read.parquet(store).where(col("study_code") === "R" && col("view") === "F"))
    }),
    "s5_csv_source" -> ((s, d) => {
      val path = scratch("csv_src")
      t(s, d, "nation").write.mode("overwrite").option("header", "true").csv(path)
      graft.io.Ingestion.readFile(s, s"$path/part-00000*.csv")
    }),
    // S5's other half: the native sas7bdat page reader over the
    // pd.read_sas-validated fixture (tools/make_sas_fixture.py);
    // contents are closed-form so the oracle needs no table
    "s5_sas_source" -> ((s, _) =>
      graft.io.Ingestion.readFile(s, "/root/repo/fixtures/sas/graft_fixture.sas7bdat")),
    // RLE-compressed (COMPRESS=CHAR) variant: rows stored as per-row
    // subheaders on meta pages, decompressed with the public SASYZCRL
    // command set; fixture validated by pd.read_sas's independent
    // decoder before commit (tools/make_sas_fixture.py)
    "s5_sas_compressed" -> ((s, _) =>
      graft.io.Ingestion.readFile(s, "/root/repo/fixtures/sas/graft_fixture_rle.sas7bdat")),
    // RDC (COMPRESS=BINARY) variant: control-word scheme with RLE
    // runs AND sliding-window back-references; fixture validated by
    // pd.read_sas's independent rdc_decompress before commit
    "s5_sas_rdc" -> ((s, _) =>
      graft.io.Ingestion.readFile(s, "/root/repo/fixtures/sas/graft_fixture_rdc.sas7bdat")),
    // the DataSource V2 face: required-column pushdown reaches the
    // page parser (only the selected slices decode per row) and page
    // ranges surface as Spark-planned InputPartitions
    "s5_sas_dsv2" -> ((s, _) =>
      s.read.format("sas7bdat")
        .load("/root/repo/fixtures/sas/graft_fixture_rle.sas7bdat")
        .select("id", "tag")),
    // the format matrix's other quadrants: 32-bit scalars, big-endian
    // byte order, a mix page (metadata + inline rows — the layout of
    // every small real-world export), and windows-1252 text with
    // non-ASCII characters; all pd.read_sas-validated fixtures
    "s5_sas_variants" -> ((s, _) =>
      graft.io.Sas.read(s, "/root/repo/fixtures/sas/graft_fixture_32le.sas7bdat")
        .withColumn("variant", lit("32le"))
        .unionByName(
          graft.io.Sas.read(s, "/root/repo/fixtures/sas/graft_fixture_64be.sas7bdat")
            .withColumn("variant", lit("64be")))
        .unionByName(
          graft.io.Sas.read(s, "/root/repo/fixtures/sas/graft_fixture_mix.sas7bdat")
            .withColumn("variant", lit("mix")))
        .unionByName(
          graft.io.Sas.read(s, "/root/repo/fixtures/sas/graft_fixture_w1252.sas7bdat")
            .withColumn("variant", lit("w1252")))),
    // pd.read_sas parity on files shortened in place: both fixtures
    // declare row_count=100 but physically carry stale trailing rows
    // (105 RLE subheaders / 110 inline rows); the decode-free census
    // truncates at exactly 100 on both read paths — pandas-validated
    // at fixture generation (tools/make_sas_fixture.py)
    "s5_sas_stale" -> ((s, _) =>
      graft.io.Sas.read(s, "/root/repo/fixtures/sas/graft_fixture_rle_stale.sas7bdat")
        .select("id", "val", "name").withColumn("variant", lit("rle"))
        .unionByName(
          s.read.format("sas7bdat")
            .load("/root/repo/fixtures/sas/graft_fixture_plain_stale.sas7bdat")
            .select("id", "val", "name").withColumn("variant", lit("plain")))),
    // versioned store: publish v1 (subset) then v2 (full), read v1
    // back — time travel after a newer write; oracle reconstructs v1
    "s13_versioned_read" -> ((s, d) => {
      val dir = cleanedTempDir("graft_versioned_")
      val docs = t(s, d, "documents")
      graft.io.Versioned.writeVersion(docs.where(col("doc_id") < 250), dir)
      graft.io.Versioned.writeVersion(docs, dir)
      graft.io.Versioned.readVersion(s, dir, 1L)
    }),
  )

  val oracleSql: Map[String, String] = reg(
    "s1_nested_roundtrip" ->
      "SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_quantity FROM lineitem",
    "s6_upsert" ->
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_quantity
        |FROM lineitem WHERE l_returnflag <> 'R'
        |UNION ALL
        |SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_quantity * 2 AS l_quantity
        |FROM lineitem WHERE l_returnflag = 'R'""".stripMargin,
    "s6_erase" ->
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE NOT (l_returnflag = 'R' OR l_quantity >= 40)""".stripMargin,
    "s7_standardized" ->
      """SELECT 'S001' AS study_code,
        |  concat_ws('#', c_mktsegment, CAST(c_nationkey AS VARCHAR), CAST(c_custkey AS VARCHAR)) AS subject_hierarchy,
        |  c_mktsegment AS country, CAST(c_nationkey AS VARCHAR) AS site, CAST(c_custkey AS VARCHAR) AS subject,
        |  'Null' AS subject_death, 'Null' AS ltfu_date, CAST(c_acctbal AS VARCHAR) AS last_contact_date,
        |  'Null' AS last_contact_type, 'Null' AS subther_start_date, 'Null' AS all_ipdc_date
        |FROM customer""".stripMargin,
    "s2_analyte_scan" ->
      "SELECT CAST(c_custkey AS VARCHAR) AS subject, c_mktsegment AS country FROM customer",
    "s8_export_flatten" ->
      """SELECT l_returnflag, l_linestatus, CAST(l_orderkey AS VARCHAR) AS Subject_SAS, CAST(l_quantity AS VARCHAR) AS l_quantity
        |FROM lineitem""".stripMargin,
    "s9_parquet_append" ->
      """SELECT r_regionkey, r_name, CAST(NULL AS INTEGER) AS n_nationkey, CAST(NULL AS VARCHAR) AS n_name FROM region
        |UNION ALL
        |SELECT CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), n_nationkey, n_name FROM nation""".stripMargin,
    "s10_csv_sink" ->
      "SELECT CAST(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region",
    "engine_pipeline" ->
      """SELECT c.c_custkey, c.c_name, c.c_mktsegment,
        |  CASE c.c_mktsegment WHEN 'BUILDING' THEN 'B' WHEN 'AUTOMOBILE' THEN 'A' WHEN 'MACHINERY' THEN 'M' END AS seg_code,
        |  n.n_name, 'S001' AS study_code
        |FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin,
    "engine_study" ->
      """SELECT b.c_custkey, b.c_name, b.c_mktsegment, b.seg_code, b.n_name, b.study_code,
        |       o.o_totalprice, o.o_orderdate
        |FROM (SELECT c.c_custkey, c.c_name, c.c_mktsegment,
        |        CASE c.c_mktsegment WHEN 'BUILDING' THEN 'B' WHEN 'AUTOMOBILE' THEN 'A' WHEN 'MACHINERY' THEN 'M' END AS seg_code,
        |        n.n_name, 'S001' AS study_code
        |      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey) b
        |LEFT JOIN (SELECT o_custkey AS c_custkey, max(o_totalprice) AS o_totalprice, max(o_orderdate) AS o_orderdate
        |           FROM orders WHERE o_totalprice >= 150000 GROUP BY 1) o USING (c_custkey)""".stripMargin,
    "engine_clinical_study" ->
      """SELECT * FROM (VALUES
        |  ('US', 101.0, 'S001', TIMESTAMP '2021-03-10 08:00:00', CAST(NULL AS TIMESTAMP),
        |   TIMESTAMP '2021-03-10 08:00:00', 'Death', TIMESTAMP '2021-02-01 00:00:00',
        |   '1', TIMESTAMP '2021-02-01 00:00:00', '103', 'regular'),
        |  ('US', 101.0, 'S001', TIMESTAMP '2021-03-10 08:00:00', CAST(NULL AS TIMESTAMP),
        |   TIMESTAMP '2021-03-10 08:00:00', 'Death', TIMESTAMP '2021-02-20 00:00:00',
        |   '0', TIMESTAMP '2021-02-01 00:00:00', '103', 'regular'),
        |  ('US', 101.0, 'S002', CAST(NULL AS TIMESTAMP), TIMESTAMP '2021-04-15 09:00:00',
        |   TIMESTAMP '2021-04-15 09:00:00', 'Lost to follow up', TIMESTAMP '2021-03-05 00:00:00',
        |   '1', TIMESTAMP '2021-03-05 00:00:00', '271', 'end of study'),
        |  ('US', 102.0, 'S003', TIMESTAMP '2021-05-18 12:00:00', CAST(NULL AS TIMESTAMP),
        |   TIMESTAMP '2021-05-18 12:00:00', 'Death', CAST(NULL AS TIMESTAMP),
        |   CAST(NULL AS VARCHAR), TIMESTAMP '2021-05-10 00:00:00', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
        |  ('DE', 201.0, 'S004', CAST(NULL AS TIMESTAMP), TIMESTAMP '2021-06-01 00:00:00',
        |   TIMESTAMP '2021-06-01 00:00:00', 'Lost to follow up', CAST(NULL AS TIMESTAMP),
        |   CAST(NULL AS VARCHAR), CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))
        |) t(country, site, subject, subject_death, ltfu_date, last_contact_date,
        |    last_contact_type, subther_start_date, concomitant, all_ipdc_date,
        |    pltfu_thresh, pltfu_thresh_group)""".stripMargin,
    "s11_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "s12_orc_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "s14_avro_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "s13_versioned_read" ->
      "SELECT * FROM documents WHERE doc_id < 250",
    "s1_keyed_scan" ->
      """SELECT 'R' AS study_code, 'F' AS view, l_orderkey, l_linenumber, l_quantity
        |FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'""".stripMargin,
    "s5_csv_source" ->
      """SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey, n_name, CAST(n_regionkey AS VARCHAR) AS n_regionkey
        |FROM nation""".stripMargin,
    "s5_sas_source" ->
      """SELECT CAST(i AS DOUBLE) AS id, CAST(i AS DOUBLE) * 0.25 AS val,
        |  concat('row_', lpad(CAST(i AS VARCHAR), 3, '0')) AS name
        |FROM generate_series(1, 100) t(i)""".stripMargin,
    "s5_sas_compressed" ->
      """SELECT CAST(i AS DOUBLE) AS id, CAST(i AS DOUBLE) * 0.25 AS val,
        |  concat('row_', lpad(CAST(i AS VARCHAR), 3, '0')) AS name,
        |  concat('tag_', CAST(i AS VARCHAR)) AS tag
        |FROM generate_series(1, 100) t(i)""".stripMargin,
    "s5_sas_rdc" ->
      """SELECT CAST(i AS DOUBLE) AS id, CAST(i AS DOUBLE) * 0.25 AS val,
        |  concat('row_', lpad(CAST(i AS VARCHAR), 3, '0')) AS name,
        |  repeat(concat(CAST(i % 7 AS VARCHAR), 'ab'), 8) AS pat,
        |  concat('tag_', CAST(i AS VARCHAR)) AS tag
        |FROM generate_series(1, 100) t(i)""".stripMargin,
    "s5_sas_variants" ->
      """SELECT CAST(i AS DOUBLE) AS id, CAST(i AS DOUBLE) * 0.25 AS val,
        |  CASE WHEN v = 'w1252' THEN
        |         -- NOT lpad: DuckDB lpad TRUNCATES '100' to width 2;
        |         -- the fixture's %02d only left-pads
        |         concat('é', CASE WHEN i < 10 THEN concat('0', CAST(i AS VARCHAR))
        |                          ELSE CAST(i AS VARCHAR) END, 'ü°')
        |       ELSE concat('row_', lpad(CAST(i AS VARCHAR), 3, '0')) END AS name,
        |  v AS variant
        |FROM generate_series(1, 100) t(i),
        |     (VALUES ('32le'), ('64be'), ('mix'), ('w1252')) s(v)""".stripMargin,
    "s5_sas_dsv2" ->
      """SELECT CAST(i AS DOUBLE) AS id, concat('tag_', CAST(i AS VARCHAR)) AS tag
        |FROM generate_series(1, 100) t(i)""".stripMargin,
    "s5_sas_stale" ->
      """SELECT CAST(i AS DOUBLE) AS id, CAST(i AS DOUBLE) * 0.25 AS val,
        |  concat('row_', lpad(CAST(i AS VARCHAR), 3, '0')) AS name, v AS variant
        |FROM generate_series(1, 100) t(i),
        |     (VALUES ('rle'), ('plain')) s(v)""".stripMargin,
  )
}
