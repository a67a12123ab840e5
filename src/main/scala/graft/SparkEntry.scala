package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{ParquetResolver, StudyRunner, Interpreter, PipelineContext}
import graft.io.{ConfigReader, Export, NestedStore, Standardized}
import graft.llm.{Dedup, Multimodal, Similarity, Sketch, TextAnalysis}
import graft.model._
import graft.ops.Ops

/** Driver contract (SURVEY.md §7): one queries entry per implemented
  * operator, each with a DuckDB oracle over the same parquet tables.
  * Column names are aligned between the Spark plan and the SQL — the
  * driver's compare sorts columns by name before hashing.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Per-JVM-invocation scratch root for queries that round-trip
    * through local disk (S1/S2/S5/S9/S10, clinical store): two
    * concurrent Verify/Bench invocations on one machine must never
    * read each other's half-written stores, which fixed /tmp paths
    * allowed. Stable WITHIN a JVM so bench reps overwrite rather
    * than accumulate.
    */
  lazy val scratchRoot: String = cleanedTempDir("graft_scratch_")

  /** Temp dir that is RECURSIVELY deleted at JVM exit.
    * `File.deleteOnExit` only removes empty directories, so parquet
    * stores and managed tables written under a plain temp dir leak
    * into /tmp on every Verify/Bench run. Deletion runs in a shutdown
    * hook, after the harness is done reading the outputs it cares
    * about (those go to outDir, never under a temp root).
    */
  def cleanedTempDir(prefix: String): String = {
    import java.nio.file.{Files, Path}
    val p = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))))
    p.toString
  }
  private def scratch(name: String): String = s"$scratchRoot/$name"

  /** Ranked BPE merge table for text_bpe_encode — rank = position.
    * Tuned to the corpus vocabulary so frequent words compress to one
    * token and others stay partially merged (both paths exercised);
    * a production pipeline loads this from its tokenizer artifact.
    * The oracle embeds the SAME table as literal rows.
    */
  val bpeMerges: Seq[(String, String)] = Seq(
    "t" -> "a", "l" -> "e", "ta" -> "b", "tab" -> "le",
    "r" -> "o", "ro" -> "w",
    "v" -> "a", "va" -> "l", "u" -> "e", "val" -> "ue",
    "s" -> "c", "sc" -> "a", "sca" -> "n",
    "q" -> "u", "qu" -> "e", "que" -> "r", "quer" -> "y")

  /** The testdata has no physical nulls, so null-exercising ops run
    * on this frame: customer ⟕ per-customer max "big order" total —
    * `big_total` is null for customers without a >200k order.
    */
  private def nullBase(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders")
      .filter(col("o_totalprice") > 200000)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(col("o_totalprice")).as("big_total"))
    t(s, dir, "customer").join(big, Seq("c_custkey"), "left")
  }

  private val nullBaseSql =
    """customer LEFT JOIN (SELECT o_custkey AS c_custkey, max(o_totalprice) AS big_total
      |  FROM orders WHERE o_totalprice > 200000 GROUP BY 1) b USING (c_custkey)""".stripMargin

  /** documents ∪ shifted-id copy — gives every text exactly two ids,
    * so exact-dedup has real work to do.
    */
  private def doubledDocs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.unionByName(d.withColumn("doc_id", col("doc_id") + 10000))
  }

  private val doubledDocsSql =
    "(SELECT * FROM documents UNION ALL SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars FROM documents)"

  /** Shared by dedup_threshold_curve and its capped twin: the cap (16)
    * exceeds the gate corpus's hottest shingle df (7), so both gates
    * compare against the SAME uncapped SQL — the oracle hash-proves
    * capped==uncapped whenever no shingle exceeds the cap.
    */
  private val thresholdCurveSql =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
      |sh AS (SELECT doc_id,
      |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
      |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
      |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
      |       FROM toks),
      |p AS (SELECT CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.s, b.s))) AS j
      |      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.s, b.s))) >= 0.05),
      |b AS (SELECT floor(j * 10) / 10 AS band_lo, CAST(count(*) AS BIGINT) AS n_pairs
      |      FROM p GROUP BY 1)
      |SELECT band_lo, n_pairs,
      |  CAST(sum(n_pairs) OVER (ORDER BY band_lo DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_pairs_ge
      |FROM b""".stripMargin

  /** events.parquet's `ts` column has shipped in two physical forms
    * across testdata generations: TIMESTAMP(NANOS) (readable only as a
    * nanos `long` via the legacy nanosAsLong conf) and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false). Normalize both to the
    * same logical column — nanos-since-epoch as `long` — so every
    * downstream query's `ts div 1000` arithmetic is generation-proof.
    * For the micros form, `unix_micros * 1000` is exact (INT64 parquet
    * timestamps are read value-as-is, no timezone math — matching
    * DuckDB's `epoch_us` on the same file, which the oracles use).
    * inferTimestampNTZ is disabled so the naive-micros form resolves
    * to TimestampType (raw micros) rather than session-TZ-dependent
    * NTZ casts. Confs are scoped to a derived session (shared
    * SparkContext, own SQLConf) so a query never mutates the caller's
    * session state.
    */
  private def eventsNanos(s: SparkSession, dir: String): DataFrame = {
    val s2 = s.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s2.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = s2.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }

  /** IVF coarse quantizer, memoized per (data dir, listing digest):
    * the registered query and the Verify-time oracle generator must
    * see the SAME trained centroids (seeded KMeans is deterministic,
    * but sharing the model object removes even that assumption), and
    * Bench avoids re-training per run. The key digests the full file
    * LISTING (recursive names + sizes + per-file mtimes), not the
    * top-level mtime: an in-place rewrite within mtime granularity —
    * or a directory rewrite preserving entry names — must evict the
    * memo, because a stale model keeps the gate green (both sides
    * share it) while silently degrading partitioning quality.
    */
  private val ivfModels = new java.util.concurrent.ConcurrentHashMap[(String, String), graft.llm.Ivf.IvfModel]()
  private def listingDigest(root: java.io.File): String = {
    def walk(f: java.io.File): Seq[String] =
      if (f.isDirectory)
        // listFiles() returns NULL (not empty) on I/O or permission
        // failure — e.g. the directory being replaced mid-walk, the
        // exact race this digest exists to catch. A marker entry makes
        // the digest differ so the memo evicts and retrains.
        Option(f.listFiles()) match {
          case Some(fs) => fs.sortBy(_.getName).toSeq.flatMap(walk)
          case None => Seq(s"${f.getPath}|unreadable")
        }
      else Seq(s"${f.getPath}|${f.length()}|${f.lastModified()}")
    val md = java.security.MessageDigest.getInstance("MD5")
    walk(root).foreach(l => md.update(l.getBytes("UTF-8")))
    md.digest().map("%02x".format(_)).mkString
  }
  private def ivfModel(s: SparkSession, d: String): graft.llm.Ivf.IvfModel = {
    val key = (d, listingDigest(new java.io.File(s"$d/embeddings.parquet")))
    ivfModels.computeIfAbsent(key, _ => graft.llm.Ivf.train(t(s, d, "embeddings"), "embedding", k = 16))
  }

  /** Flagship: the config-driven study pipeline end-to-end on
    * sf0.001 (config CSVs under fixtures/, data from testdata).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val study = ConfigReader.readStudy(spark, "/root/repo/fixtures/study_demo")
    StudyRunner.run(study, new ParquetResolver(spark, dir))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ===== §2.2 projection / distinct =====
    "p1_tolerant_project_skip" -> ((s, d) =>
      Ops.selectColumnsTolerant(Seq("l_orderkey", "no_such_column"), distinct = false)(
        t(s, d, "lineitem"))),
    "p1_tolerant_project" -> ((s, d) =>
      Ops.selectColumnsTolerant(Seq("l_returnflag", "l_linestatus"), distinct = true)(
        t(s, d, "lineitem"))),
    "p2_select_columns" -> ((s, d) =>
      Ops.selectColumns(Seq("o_orderkey", "o_custkey", "o_totalprice"))(t(s, d, "orders"))),
    "p3_select_distinct" -> ((s, d) =>
      Ops.selectDistinct(Seq("c_mktsegment"))(t(s, d, "customer"))),
    "p4_unique_columns" -> ((s, d) =>
      Ops.uniqueColumns(Seq("o_custkey"),
        Seq(SortKey("o_orderdate"), SortKey("o_orderkey")))(t(s, d, "orders"))),
    "p5_remove_columns" -> ((s, d) =>
      Ops.removeColumns(Seq("n_regionkey"))(t(s, d, "nation"))),

    // ===== §2.3 condition mini-language =====
    "f1_eq_string" -> ((s, d) => Ops.filterOp("l_returnflag = R")(t(s, d, "lineitem"))),
    "f1_ge_number" -> ((s, d) => Ops.filterOp("l_quantity >= NUMBER(45)")(t(s, d, "lineitem"))),
    "f1_le_date" -> ((s, d) => Ops.filterOp("l_shipdate <= DATE(1993-06-30)")(t(s, d, "lineitem"))),
    "f2_not_null" -> ((s, d) => Ops.filterOp("big_total = NOT NULL")(nullBase(s, d))),
    "f3_conjunction" -> ((s, d) =>
      Ops.filterOp("l_returnflag = R & l_linestatus = F")(t(s, d, "lineitem"))),
    "f4_disjunction" -> ((s, d) =>
      Ops.filterOp("o_orderpriority = 1-URGENT | o_orderstatus = F")(t(s, d, "orders"))),
    "f5_between_number" -> ((s, d) =>
      Ops.filterOp("l_quantity BETWEEN (NUMBER(5), NUMBER(10))")(t(s, d, "lineitem"))),
    "f5_between_date" -> ((s, d) =>
      Ops.filterOp("o_orderdate BETWEEN (DATE(1994-01-01), DATE(1994-12-31))")(t(s, d, "orders"))),

    // ===== §2.4 joins =====
    "j1_left_join" -> ((s, d) =>
      Ops.namedJoin(
        t(s, d, "orders"),
        t(s, d, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), "left")),
    "j1_suffix_policy" -> ((s, d) =>
      Ops.namedJoin(
        t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice").as("val")),
        t(s, d, "customer").select(col("c_custkey").as("o_custkey"), col("c_acctbal").as("val")),
        Seq("o_custkey"), "left")),
    "j2_outer_join" -> ((s, d) =>
      Ops.namedJoin(
        t(s, d, "supplier").withColumnRenamed("s_nationkey", "n_nationkey"),
        t(s, d, "nation"),
        Seq("n_nationkey"), "full")),
    "j3_qualified_join" -> ((s, d) =>
      Ops.qualifiedJoin(
        t(s, d, "orders"), t(s, d, "customer"),
        Seq(("o_custkey", "c_custkey")), "inner")),
    // semi/anti joins: existence filters that never widen the row —
    // the build side ships only its keys (broadcast at dim sizes)
    "j6_semi_join" -> ((s, d) =>
      Ops.qualifiedJoin(t(s, d, "customer"), t(s, d, "orders"),
        Seq(("c_custkey", "o_custkey")), "left_semi")),
    // the right side is restricted (high-value orders) so the anti
    // result is NON-empty at every SF — an unrestricted orders side
    // leaves zero survivors in the synthetic data, making the oracle
    // gate vacuous (any broken left_anti would still "pass" on 0=0)
    "j6_anti_join" -> ((s, d) =>
      Ops.qualifiedJoin(t(s, d, "customer"),
        t(s, d, "orders").where(col("o_totalprice") > 300000),
        Seq(("c_custkey", "o_custkey")), "left_anti")),
    // co-located bucketed join: both sides written bucketed on the
    // key, so the join itself plans ZERO exchanges — the write-once
    // shuffle pattern for a repeatedly-stitched 100 TB store. The agg
    // uses count/max (order-independent), keeping the double exact
    // under parallel partial aggregation.
    "j5_bucketed_join" -> ((s, d) => {
      val cust = t(s, d, "customer").select("c_custkey", "c_name", "c_acctbal")
      val ords = t(s, d, "orders").groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("n_orders"), max(col("o_totalprice")).as("max_totalprice"))
      graft.io.Bucketing.writeBucketed(cust, "g_cust_bkt", "c_custkey", 8)
      graft.io.Bucketing.writeBucketed(ords, "g_ord_bkt", "c_custkey", 8)
      graft.io.Bucketing.colocatedJoin(s, "g_cust_bkt", "g_ord_bkt", "c_custkey")
    }),

    // ===== §2.5 aggregation =====
    "a1_summarise_minmax" -> ((s, d) =>
      Ops.groupbySummarise(
        Seq("l_returnflag", "l_linestatus"),
        Seq(("l_quantity", "min"), ("l_extendedprice", "max")), Nil)(t(s, d, "lineitem"))),
    "a1_summarise_sum_count" -> ((s, d) =>
      Ops.groupbySummarise(
        Seq("l_returnflag"),
        Seq(("l_quantity", "sum"), ("l_orderkey", "count")), Nil)(t(s, d, "lineitem"))),
    "a1_summarise_mean" -> ((s, d) =>
      Ops.groupbySummarise(Seq("l_returnflag"), Seq(("l_quantity", "mean")), Nil)(
        t(s, d, "lineitem"))),
    // (l_linenumber repeats within an order in this synthetic data —
    // the second key makes the established order total, so first/last
    // are deterministic)
    "a1_summarise_last" -> ((s, d) =>
      Ops.groupbySummarise(
        Seq("l_orderkey"), Seq(("l_quantity", "last")),
        Seq(SortKey("l_linenumber"), SortKey("l_quantity")))(t(s, d, "lineitem"))),
    "a1_summarise_first" -> ((s, d) =>
      Ops.groupbySummarise(
        Seq("l_orderkey"), Seq(("l_quantity", "first")),
        Seq(SortKey("l_linenumber"), SortKey("l_quantity")))(t(s, d, "lineitem"))),
    "a2_aggregate_min" -> ((s, d) =>
      Ops.aggregateColumn("min_val", Seq("l_quantity", "l_discount", "l_tax"), "min")(
        t(s, d, "lineitem"))),
    "a2_aggregate_max" -> ((s, d) =>
      Ops.aggregateColumn("max_val", Seq("l_quantity", "l_discount", "l_tax"), "max")(
        t(s, d, "lineitem"))),
    "a3_groupby_slice" -> ((s, d) =>
      Ops.groupbySlice(Seq("o_custkey"), 2,
        Seq(SortKey("o_totalprice", desc = true), SortKey("o_orderkey", desc = true)))(
        t(s, d, "orders"))),
    // quantity aggs only: integer-valued doubles sum exactly in any
    // order, so subtotals hash-match the oracle
    "a5_rollup" -> ((s, d) =>
      Ops.groupbyRollup(Seq("l_returnflag", "l_linestatus"),
        Seq(("l_quantity", "sum", "sum_qty"), ("l_quantity", "count", "n"),
          ("l_quantity", "mean", "avg_qty")))(t(s, d, "lineitem"))),
    "a5_cube" -> ((s, d) =>
      Ops.groupbyRollup(Seq("l_returnflag", "l_linestatus"),
        Seq(("l_quantity", "sum", "sum_qty")), cube = true)(t(s, d, "lineitem"))),
    "a6_pivot" -> ((s, d) =>
      Ops.pivotAgg(Seq("l_returnflag"), "l_linestatus", "l_quantity",
        Seq("F", "O"), "sum")(t(s, d, "lineitem"))),
    "a6_unpivot" -> ((s, d) =>
      Ops.unpivot(Seq("l_returnflag"), Seq("F", "O"), "l_linestatus", "sum_qty")(
        Ops.pivotAgg(Seq("l_returnflag"), "l_linestatus", "l_quantity",
          Seq("F", "O"), "sum")(t(s, d, "lineitem")))),

    // ===== §2.6 column derivation =====
    "c1_rename" -> ((s, d) =>
      Ops.renameColumns(Seq("n_name" -> "nation_name"))(t(s, d, "nation"))),
    "c2_format_datetime" -> ((s, d) =>
      Ops.formatColumn("od_str", "datetime#%d-%m-%Y")(
        t(s, d, "orders").select(col("o_orderkey"),
          date_format(col("o_orderdate"), "dd-MM-yyyy").as("od_str")))),
    "c2_format_number" -> ((s, d) =>
      Ops.formatColumn("qty", "number")(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("string").as("qty")))),
    "c3_add_column" -> ((s, d) =>
      Ops.addColumn("study_code", "S001")(t(s, d, "region"))),
    "c4_attach_notnull" -> ((s, d) =>
      Ops.attachNotNull("has_big", "big_total")(nullBase(s, d))),
    "c5_attach_sumeq" -> ((s, d) =>
      Ops.attachSumEq("chk", "l_quantity", "l_linenumber")(t(s, d, "lineitem"))),
    "c6_attach_null" -> ((s, d) =>
      Ops.attachNullFill("seg2", "big_total", "NONE", "c_mktsegment")(nullBase(s, d))),
    "c7_decision_when" -> ((s, d) =>
      Ops.decisionColumnWhenChain("prio_code", "o_orderpriority",
        Seq("1-URGENT" -> "U", "2-HIGH" -> "H", "3-MEDIUM" -> "M"))(t(s, d, "orders"))),
    "c7_decision_join" -> ((s, d) => {
      import s.implicits._
      val tbl = Seq(("1-URGENT", "U"), ("2-HIGH", "H"), ("3-MEDIUM", "M"))
        .toDF("lookup_value", "prio_code")
      Ops.decisionColumn("prio_code", "o_orderpriority", tbl)(t(s, d, "orders"))
    }),
    "c8_concat_key" -> ((s, d) =>
      Ops.concatKey("subject_hierarchy", "#", Seq("c_mktsegment", "c_name"))(
        t(s, d, "customer"))),

    // ===== §2.7 rows =====
    "r1_bind_rows" -> ((s, d) =>
      Ops.bindRows(Seq(
        t(s, d, "nation").select("n_nationkey", "n_name"),
        t(s, d, "region").select("r_regionkey", "r_name")))),
    "r2_sort_dataset" -> ((s, d) =>
      Ops.sortDataset(Seq("r_name"), desc = true)(t(s, d, "region"))),
    "r3_remove_rows" -> ((s, d) => Ops.removeRows("big_total")(nullBase(s, d))),
    // set ops over overlapping slices of nation (keys 0-14 vs 10-24)
    "r5_intersect" -> ((s, d) =>
      Ops.intersectRows(
        t(s, d, "nation").where(col("n_nationkey") < 15),
        t(s, d, "nation").where(col("n_nationkey") >= 10))),
    "r5_except" -> ((s, d) =>
      Ops.exceptRows(
        t(s, d, "nation").where(col("n_nationkey") < 15),
        t(s, d, "nation").where(col("n_nationkey") >= 10))),

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
    "c9_filename_meta" -> ((s, d) =>
      graft.io.Ingestion.withFileMetadata(t(s, d, "documents"))
        .select("doc_id", "source_file", "view_id", "source_timestamp")),
    "c10_null_fill" -> ((s, d) =>
      graft.io.Ingestion.nullFill(
        nullBase(s, d).select(col("c_custkey"), col("big_total").cast("string").as("big_total")))),
    "w2_json_props" -> ((s, d) =>
      // semi-structured payload handling: typed extraction from the
      // events JSON props column
      eventsNanos(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        (get_json_object(col("props"), "$.k").cast("double") * col("value")).as("weighted"))),
    // gap-based sessionization (batch twin of the streaming
    // mapGroupsWithState sessionizer): lag/cumsum, integer-micros
    // arithmetic, one shuffle on the user key
    "w3_sessionize" -> ((s, d) => {
      val ev = eventsNanos(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
      graft.streaming.StreamingIngest.sessionizeBatch(ev)
    }),
    // ordered funnel: strict first-touch chaining at truncated-µs
    // resolution — DuckDB's TIMESTAMP is exactly floor(ns/1000), so
    // comparisons and gaps agree bit-for-bit (ops/Funnel.scala is
    // resolution-agnostic; the µs projection is the oracle contract)
    "funnel_stages" -> ((s, d) =>
      graft.ops.Funnel.funnelStages("user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"))(
        eventsNanos(s, d).withColumn("ts_us", expr("ts div 1000")))),
    // cohort retention grid on first-seen date
    "cohort_retention" -> ((s, d) =>
      graft.ops.Funnel.cohortRetention("user_id",
        to_date(timestamp_micros(expr("ts div 1000"))))(eventsNanos(s, d))),
    // per-transition conversion gaps (µs): exact integer diffs, exact
    // median with the integer-portable (a+b)/2 interpolation
    "funnel_conversion" -> ((s, d) =>
      graft.ops.Funnel.funnelConversion("user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"))(
        eventsNanos(s, d).withColumn("ts_us", expr("ts div 1000")))),
    // RFM segmentation at date resolution (ns→µs→date truncation is
    // monotone, so both engines see identical dates); monetary in
    // exact cents, bins from boundary comparisons — no global ntile
    "event_rfm" -> ((s, d) =>
      graft.ops.Funnel.rfm("user_id", "ts_date", "value")(
        eventsNanos(s, d).withColumn(
          "ts_date", to_date(timestamp_micros(expr("ts div 1000")))))),
    // per-type daily volume trend: OLS slope as an exact integer
    // rational (num, den) — division left to the reader so the gate
    // stays hash-exact
    "event_trend" -> ((s, d) =>
      graft.ops.Trend.groupedLinearTrend("event_type", "day_idx", "value_cents")(
        eventsNanos(s, d)
          .withColumn("day_idx",
            datediff(to_date(timestamp_micros(expr("ts div 1000"))), lit("1970-01-01")))
          .withColumn("value_cents", expr("cast(floor(value*100+0.5) as bigint)")))),
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
    // per-key Pearson components in exact longs: covariance
    // numerator + both variance factors ship; the square root is
    // the one op that would break the hash gate
    "event_corr" -> ((s, d) =>
      graft.ops.Trend.groupedCorrelation("event_type", "day_idx", "value_cents")(
        eventsNanos(s, d)
          .withColumn("day_idx",
            datediff(to_date(timestamp_micros(expr("ts div 1000"))), lit("1970-01-01")))
          .withColumn("value_cents", expr("cast(floor(value*100+0.5) as bigint)")))),
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
    // interval-overlap join (the Flink/Trino interval join): both
    // interval sets explode to hour buckets, candidates meet on the
    // bucket equi-join, and each overlapping pair is kept only in
    // the bucket of the overlap's first instant — exactly-once, no
    // distinct pass, never a cartesian
    "range_overlap_join" -> ((s, d) => {
      val ev = eventsNanos(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val sess = graft.streaming.StreamingIngest.sessionizeBatch(ev)
      val a = sess.where(col("user_id") >= 50).select(
        col("user_id").as("user_a"), col("session_seq").as("seq_a"),
        col("session_start").as("sa"), col("session_end").as("ea"))
      val b = sess.where(col("user_id") < 50).select(
        col("user_id").as("user_b"), col("session_seq").as("seq_b"),
        col("session_start").as("sb"), col("session_end").as("eb"))
      graft.ops.RangeJoin.overlapJoin(a, b, Seq.empty,
        "sa", "ea", "sb", "eb",
        Seq("user_a", "seq_a"), Seq("user_b", "seq_b"),
        bucketMicros = 3600000000L)
    }),
    // one-pass numeric profiling (exact-NDV gate twin; the HLL
    // variant is the no-Expand scale path, spec-pinned)
    "profile_events" -> ((s, d) =>
      graft.ops.Profile.numericProfile(Seq("value_cents", "user_id", "event_id"))(
        eventsNanos(s, d).withColumn(
          "value_cents", expr("cast(floor(value*100+0.5) as bigint)")))),
    // sweep-line session concurrency: distributed global running sum
    // (per-date windows + broadcast bucket offsets — never a
    // single-partition window over the data)
    "session_concurrency" -> ((s, d) => {
      val ev = eventsNanos(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
      graft.ops.Sweep.concurrency(
        "session_start", "session_end", Seq("user_id", "session_seq"))(
        graft.streaming.StreamingIngest.sessionizeBatch(ev))
    }),
    // link-graph centrality: PageRank over clickstream transition
    // edges in integer fixed-point (longs at 1e9 scale) — every
    // iteration is exact long arithmetic, so three unrolled oracle
    // CTEs replay the ranks bit-for-bit
    "graph_pagerank" -> ((s, d) => {
      val ev = eventsNanos(s, d).withColumn(
        "item", get_json_object(col("props"), "$.k").cast("int"))
      graft.ops.Graph.pageRankFp(
        graft.ops.Graph.transitionEdges("user_id", "ts", "event_id", "item")(ev),
        iters = 3)
    }),
    // robust median/MAD outlier flags per event type — exact-cents
    // values keep every median/deviation an exact binary fraction,
    // so med, MAD, and the flag hash-match the oracle bit-for-bit
    "event_outliers" -> ((s, d) =>
      graft.ops.Outliers.madFlags("event_type", "value_cents")(
        eventsNanos(s, d).withColumn(
          "value_cents", expr("cast(floor(value*100+0.5) as bigint)")))
        .select(col("event_id"), col("event_type"), col("value_cents"),
          col("median").as("med_cents"), col("mad").as("mad_cents"),
          col("is_outlier"))),
    // SCD Type-2 dimension history: the per-customer priority stream
    // (deduped per day via min_by — a deterministic pre-aggregation,
    // the scd2History input contract) collapsed into version
    // intervals; run-length collapse is pure window+filter over
    // exact values, so every version row hash-matches the oracle
    "scd2_history" -> ((s, d) =>
      graft.ops.Scd.scd2History(Seq("o_custkey"), "o_orderdate", Seq("priority"))(
        t(s, d, "orders").groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(min_by(col("o_orderpriority"), col("o_orderkey")).as("priority")))),
    // point-in-time reconstruction: the dimension "as of" a fixed
    // instant — a pure filter over the history (no join, no extra
    // shuffle; partition-prunes on a valid_from-partitioned store)
    "scd2_asof" -> ((s, d) =>
      graft.ops.Scd.asOfSnapshot(lit("1995-06-01").cast("timestamp"))(
        graft.ops.Scd.scd2History(Seq("o_custkey"), "o_orderdate", Seq("priority"))(
          t(s, d, "orders").groupBy(col("o_custkey"), col("o_orderdate"))
            .agg(min_by(col("o_orderpriority"), col("o_orderkey")).as("priority"))))),
    // forward-fill (LOCF): a sparse observation stream (priority /
    // status observed on only a deterministic subset of orders)
    // gap-filled per customer in (date, key) order; pure value-carry
    // with zero arithmetic, so every filled row hash-matches the
    // oracle's IGNORE NULLS running window
    "ffill_locf" -> ((s, d) =>
      graft.ops.Scd.forwardFill(Seq("o_custkey"),
        Seq("o_orderdate", "o_orderkey"), Seq("priority", "status"))(
        t(s, d, "orders").select(
          col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
          when(col("o_orderkey") % 3 === 0, col("o_orderpriority")).as("priority"),
          when(col("o_orderkey") % 5 === 0, col("o_orderstatus")).as("status")))),
    // categorical mode per month, smallest-value tie-break (a total
    // engine-portable order; "undefined on ties" doesn't replay)
    "a7_group_mode" -> ((s, d) =>
      graft.ops.Profile.groupMode("month", "o_orderpriority")(
        t(s, d, "orders").withColumn(
          "month", trunc(col("o_orderdate"), "month")))),
    // gaps-and-islands day-coverage audit per event type: which
    // contiguous day runs have data, where the source went dark
    "profile_day_islands" -> ((s, d) =>
      graft.ops.Profile.dayIslands("event_type",
        to_date(timestamp_micros(expr("ts div 1000"))))(eventsNanos(s, d))),
    // journey path discovery: frequency of each user's first-3
    // event-type sequence (funnels score a KNOWN sequence; paths
    // discover which sequences happen)
    "funnel_top_paths" -> ((s, d) =>
      graft.ops.Funnel.topPaths("user_id", "ts", "event_id", "event_type")(
        eventsNanos(s, d))),
    // per-type value histogram at 5-dollar (500-cent) bins; floor
    // division spelled in integer arithmetic so negative values land
    // in the same bin under every engine's division semantics
    "profile_value_hist" -> ((s, d) =>
      graft.ops.Profile.equiWidthHistogram("event_type", "value_cents", 500L)(
        eventsNanos(s, d).withColumn(
          "value_cents", expr("cast(floor(value*100+0.5) as bigint)")))),
    // rolling-frame window over integer-valued doubles (engine-exact
    // sums) + rank-family: the remaining window surface, gated
    "w4_rolling_sum" -> ((s, d) => {
      // l_quantity in the ordering: the synthetic lineitem has
      // duplicate (orderkey, linenumber) pairs, and rows tied on ALL
      // order keys including the summed value leave every prefix sum
      // well-defined regardless of which engine breaks the tie
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_orderkey").orderBy("l_linenumber", "l_quantity")
        .rowsBetween(-2, org.apache.spark.sql.expressions.Window.currentRow)
      t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        sum(col("l_quantity")).over(w).as("rolling_qty"))
    }),
    "w5_percent_rank" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
      t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
    }),
    "w1_event_windows" -> ((s, d) => {
      // ts read as nanos-long (see eventsNanos), truncated to micros —
      // exactly DuckDB's nanos→micros read behavior.
      val ev = eventsNanos(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
      graft.streaming.StreamingIngest.windowedCountsBatch(ev)
    }),

    // ===== LLM pipeline: dedup =====
    "dedup_exact" -> ((s, d) => Dedup.exactDedup("text", "doc_id")(doubledDocs(s, d))),
    "dedup_exact_stats" -> ((s, d) => Dedup.exactDedupStats("text", "doc_id")(doubledDocs(s, d))),
    // steady-state ingest: a new batch (half re-crawled content, half
    // fresh) anti-joins the store's digest set — only novel content
    // survives
    "dedup_incremental" -> ((s, d) => {
      val store = t(s, d, "documents")
      val batch = store.withColumn("doc_id", col("doc_id") + 10000L)
        .withColumn("text",
          when(col("doc_id") % 2 === 1, concat(col("text"), lit(" fresh")))
            .otherwise(col("text")))
      Dedup.incrementalDedup("text", batch, store).select("doc_id", "text")
    }),
    // Banding (numPerm=64, bands=16, r=4) is tuned to the DATA, not
    // the threshold: the corpus's true near-dup pairs sit at jaccard
    // >= 0.9 (sf0.01) / >= 0.8 (sf0.1), nothing in [0.3, 0.8)
    // (measured — tools/JaccardGap), where the r=4 S-curve gives
    // per-pair miss probability <= (1-0.8^4)^16 ≈ 2e-4, expected
    // misses ≈ 1.5e-3 across the 7 sf0.1 pairs in [0.8, 0.9) — safe
    // against the exact all-pairs oracle. That assumption is PINNED
    // by LlmSpec ("corpus assumption: no jaccard pairs in the LSH
    // miss zone"), so regenerated testdata fails loudly. r=2
    // (bands=32) would put the 50%-candidate point at j≈0.15 and
    // flood the verify stage with low-jaccard candidates (measured
    // 10× slower) for recall this corpus doesn't need.
    "dedup_minhash_pairs" -> ((s, d) =>
      Dedup.nearDupPairs(t(s, d, "documents"), "doc_id", "text",
        threshold = 0.5, numPerm = 64, bands = 16)),
    // the exact audit path that VALIDATES the banding assumption:
    // inverted-index all-pairs jaccard (shared-shingle enumeration,
    // never a doc-level cartesian)
    "dedup_jaccard_audit" -> ((s, d) =>
      Dedup.allPairsJaccard(t(s, d, "documents"), "doc_id", "text", minJaccard = 0.3)),
    // the remedy for split leakage: hash-split on the near-dup
    // CLUSTER representative, so whole groups land in one split;
    // unpaired docs keep their withHashSplit assignment
    "sample_cluster_split" -> ((s, d) =>
      graft.llm.Sampling.clusterAwareSplit(t(s, d, "documents"), "doc_id", "text",
        minJaccard = 0.3)),
    // eval-carve-out contamination: near-dup pairs straddling the
    // train/val/test hash splits (each side's split is a pure function
    // of its id — no join back to the corpus, no extra shuffle)
    "split_leakage_audit" -> ((s, d) =>
      graft.llm.Sampling.splitLeakageAudit(t(s, d, "documents"), "doc_id", "text",
        minJaccard = 0.3)),
    // connected components over the exact near-dup pair graph: one
    // call collapses transitive chains; oracle replays the same pairs
    // through a recursive CTE reachability walk
    "dedup_clusters" -> ((s, d) =>
      Dedup.nearDupClusters(
        Dedup.allPairsJaccard(t(s, d, "documents"), "doc_id", "text", minJaccard = 0.3))),
    "dedup_near_keep" -> ((s, d) =>
      Dedup.nearDedup(t(s, d, "documents"), "doc_id", "text", threshold = 0.5)),
    // dedup-graph health: component-size histogram incl. singletons
    // (a growing max size = boilerplate chaining unrelated docs)
    "dedup_cluster_sizes" -> ((s, d) =>
      Dedup.clusterSizeHistogram(t(s, d, "documents"), "doc_id", "text", threshold = 0.5)),
    // triangle census of the pair graph (a<b<c oriented two-join —
    // triangle-dense = real dup clusters, chain-shaped = templates)
    "dedup_graph_triangles" -> ((s, d) =>
      Dedup.graphTriangleCensus(
        Dedup.allPairsJaccard(t(s, d, "documents"), "doc_id", "text", minJaccard = 0.3))),
    // steady-state NEAR-dup ingest (LSH twin of dedup_incremental):
    // batch = every 5th doc, store = the rest; drop batch docs with a
    // store near-dup, then keep-lowest among the batch survivors
    "dedup_incremental_near" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.incrementalNearDedup(
        docs.where(col("doc_id") % 5 === 0),
        docs.where(col("doc_id") % 5 =!= 0),
        "doc_id", "text", threshold = 0.5)
    }),
    // maxHamming=3 keeps the 16-bit-chunk blocking recall-COMPLETE
    // (pigeonhole), so the blocked result equals the all-pairs oracle;
    // md5Hash60 is the engine-portable token hash the oracle can
    // replicate (production default stays xxhash64).
    "dedup_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text", maxHamming = 3,
        tokenHash = Dedup.md5Hash60)),
    // exact-substring (Lee et al. ExactSubstr) audit: per-doc fraction
    // of 30-char spans duplicated verbatim in another document — the
    // shuffle carries 8-byte gram hashes, the oracle the raw substrings
    "dedup_kgram_coverage" -> ((s, d) =>
      Dedup.kgramDupCoverage(t(s, d, "documents"), "doc_id", "text", k = 30)),
    "dedup_kgram_pairs" -> ((s, d) =>
      Dedup.kgramDupPairs(t(s, d, "documents"), "doc_id", "text", k = 30)),
    // content-defined chunking (LBFS-style, word granularity):
    // boundary-aligned NON-overlapping chunks, so the exploded volume
    // is ~1x corpus (vs k-grams' kx); shuffle carries chunk digests
    "dedup_cdc_chunks" -> ((s, d) =>
      Dedup.cdcChunkStats(t(s, d, "documents"), "doc_id", "text", divisor = 8)),
    "dedup_cdc_coverage" -> ((s, d) =>
      Dedup.cdcDupCoverage(t(s, d, "documents"), "doc_id", "text", divisor = 8)),
    // dedup-rate-over-ingestion monitoring: per doc_id bucket, the
    // fraction of documents whose exact content is seen first there
    "dedup_novelty_curve" -> ((s, d) =>
      Dedup.noveltyCurve(t(s, d, "documents"), "doc_id", "text", bucketSize = 50)),

    // ===== entity resolution (blocking + edit distance) =====
    // candidate pairs never cross blocks (equi-join on the blocking
    // key, the LSH-band discipline); Levenshtein is engine-exact ints
    "er_pairs" -> ((s, d) =>
      graft.ops.EntityRes.candidatePairs(
        "c_custkey", "c_name", Seq("c_nationkey", "c_mktsegment"), maxDist = 2)(
        t(s, d, "customer"))),
    // transitive match groups over the same pair graph (label
    // propagation); oracle replays a recursive reachability walk
    "er_groups" -> ((s, d) =>
      graft.ops.EntityRes.matchGroups(
        "c_custkey", "c_name", Seq("c_nationkey", "c_mktsegment"), maxDist = 2)(
        t(s, d, "customer"))),

    // ===== LLM pipeline: similarity =====
    "sim_cosine_topk" -> ((s, d) =>
      Similarity.cosineTopK(t(s, d, "embeddings"), "vec_id", "embedding", probeId = 0L, k = 10)),
    "sim_knn_join" -> ((s, d) =>
      Similarity.knnJoin(
        t(s, d, "embeddings"), t(s, d, "embeddings").where(col("vec_id") < 5),
        "vec_id", "embedding", k = 5)),
    "sim_ann_topk" -> ((s, d) =>
      Similarity.annTopK(
        t(s, d, "embeddings"), t(s, d, "embeddings").where(col("vec_id") < 5),
        "vec_id", "embedding", k = 5, nPlanes = 8)),
    // threshold 0.4 (not 0.9): the synthetic embeddings are near-
    // orthogonal (max pairwise cosine ≈ 0.51), so a 0.9 gate would be
    // vacuously green on zero rows. The oracle replicates the LSH
    // bucketing exactly (plane literals), so any threshold is
    // hash-exact — 0.4 makes the gate test real pairs.
    "sim_embedding_neardup" -> ((s, d) =>
      Similarity.embeddingNearDupPairs(t(s, d, "embeddings"), "vec_id", "embedding",
        threshold = 0.4, nPlanes = 8)),
    "sim_ivf_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      graft.llm.Ivf.ivfTopK(emb, emb.where(col("vec_id") < 5), "vec_id", "embedding",
        ivfModel(s, d), k = 5, nProbe = 4)
    }),
    // clustering-quality dashboard: per-cell size, majority label,
    // purity (counts only — engine-exact)
    "sim_cell_purity" -> ((s, d) =>
      Similarity.cellPurity(t(s, d, "embeddings"), "vec_id", "embedding",
        "label", ivfModel(s, d))),
    // embedding-space mislabel detection: majority label of the k
    // nearest same-cell neighbors vs own label (confident-learning
    // signal; cell equi-join = the SemDeDup cost budget, never N²)
    "sim_label_consistency" -> ((s, d) =>
      Similarity.labelConsistencyAudit(t(s, d, "embeddings"), "vec_id", "embedding",
        "label", ivfModel(s, d), k = 5)),
    // distributed Lloyd refinement, exact-gate projection: per-(cell,
    // dim) QUANTIZED assignment sums over the full corpus — integer
    // sums are combine-order-independent, so the single-threaded
    // DuckDB replay matches bit-for-bit (Ivf.refine consumes the same
    // aggregate tree in full double precision)
    "ivf_refine_cells" -> ((s, d) =>
      graft.llm.Ivf.refineCellSums(t(s, d, "embeddings"), "embedding", ivfModel(s, d))),
    // SemDeDup: cell-scoped semantic dedup. Same 0.4 threshold
    // rationale as sim_embedding_neardup (near-orthogonal synthetic
    // embeddings — 0.9 would gate zero drops)
    "sim_semdedup_keep" -> ((s, d) =>
      Similarity.semDedupKeep(t(s, d, "embeddings"), "vec_id", "embedding",
        ivfModel(s, d), threshold = 0.4)),
    // skew-hardened variant: pairs must also share a 4-plane sign-LSH
    // sub-bucket inside the cell (multi-probe one side) — the
    // quadratic-cap path for hot cells; oracle replays cell + bucket
    "sim_semdedup_bucketed" -> ((s, d) =>
      Similarity.semDedupKeep(t(s, d, "embeddings"), "vec_id", "embedding",
        ivfModel(s, d), threshold = 0.4, subBucketPlanes = 4)),
    // int8 candidate generation vs the exact-cosine top-k: per-probe
    // recall@k of the 4×-smaller quantized store (llm/Quantize.scala).
    // The quantized cosine's scales cancel — ranking is exact integer
    // dots + two IEEE sqrt/divides, so rank order is engine-portable.
    "sim_quant_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      graft.llm.Quantize.int8RecallAtK(emb, emb.where(col("vec_id") < 5),
        "vec_id", "embedding", k = 10)
    }),
    // lexical retrieval: 'dup' is the corpus's one rare term (~5% of
    // docs), so its high idf must dominate the two common terms —
    // a gate on the idf weighting, not just the mechanics
    "ret_bm25_topk" -> ((s, d) =>
      graft.llm.Retrieval.bm25TopK(t(s, d, "documents"), "doc_id", "text",
        Seq("dup", "vector", "spark"), k = 10)),
    // hybrid retrieval: the BM25 arm and the cosine arm (probe = the
    // embedded doc 0) fused by reciprocal-rank fusion — candidate
    // pools of 20 per arm, both oracle-replayed rank-for-rank
    "ret_hybrid_topk" -> ((s, d) =>
      graft.llm.Retrieval.hybridTopK(
        t(s, d, "documents"),
        t(s, d, "embeddings").withColumnRenamed("vec_id", "doc_id"),
        "doc_id", "text", "embedding", Seq("dup", "vector", "spark"),
        probeId = 0L, k = 10, candidates = 20)),

    // ===== LLM pipeline: text analysis =====
    "text_stats" -> ((s, d) => TextAnalysis.withTokenStats("text")(t(s, d, "documents"))),
    "text_normalize" -> ((s, d) =>
      TextAnalysis.normalizeText("text")(t(s, d, "documents"))
        .select("doc_id", "clean_text", "n_chars_clean", "changed")),
    "text_quality" -> ((s, d) => TextAnalysis.withQualityScores("text")(t(s, d, "documents"))
      .select("doc_id", "n_tokens", "ttr", "mean_token_len", "stopword_ratio", "punct_ratio")),
    "text_langid" -> ((s, d) =>
      TextAnalysis.withLangId("text", Seq(
        "en" -> Seq("the", "a"),
        "db" -> Seq("table", "query", "row"),
        "sys" -> Seq("spark", "vector", "stream")))(t(s, d, "documents"))
        .select("doc_id", "score_en", "score_db", "score_sys", "lang_pred")),
    "text_fingerprint" -> ((s, d) =>
      TextAnalysis.withBagFingerprint("text")(
        TextAnalysis.withFingerprint("text")(t(s, d, "documents")))
        .select("doc_id", "fingerprint", "bag_fingerprint")),

    "text_tokens_bpe" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        size(TextAnalysis.tokensRegex(col("text"))).as("n_bpe_tokens"))),
    // REAL tokenizer application: greedy ranked-merge BPE encode per
    // word (native expression, merge table as a plan literal), giving
    // the token count a budget/packing stage would actually bill
    "text_bpe_encode" -> ((s, d) =>
      TextAnalysis.withBpeTokenCount("text", SparkEntry.bpeMerges)(t(s, d, "documents"))
        .select("doc_id", "n_tokens_ws", "n_tokens_bpe", "fertility")),

    "text_pii_scan" -> ((s, d) =>
      TextAnalysis.withPiiSignals("text")(t(s, d, "documents"))
        .select("doc_id", "n_emails", "n_urls")),
    "text_vocabulary" -> ((s, d) =>
      TextAnalysis.vocabulary("text", "doc_id")(t(s, d, "documents"))),
    // the redaction transform the PII scan pre-filters for
    "text_pii_redact" -> ((s, d) =>
      TextAnalysis.redactPii("text")(t(s, d, "documents")).select("doc_id", "text_redacted")),
    // tokenizer QA: per-doc OOV fraction against the top-20 vocab
    "text_oov_rate" -> ((s, d) =>
      TextAnalysis.oovRate("doc_id", "text", topN = 20)(t(s, d, "documents"))),
    "text_repetition" -> ((s, d) =>
      TextAnalysis.repetitionStats("doc_id", "text", n = 2)(t(s, d, "documents"))),
    // dedup-threshold tuning: pair counts per 0.1 jaccard band with
    // the at-or-above cumulative — "what would threshold t remove".
    // Plain corpus: its bimodal curve (a fat low-band + the 0.9
    // near-dup spike, nothing between) is exactly the shape the
    // diagnostic exists to reveal — any threshold in the gap removes
    // the same pairs. (The doubled frame was tried and reverted: 4×
    // the shared-shingle join for one more band, 6.7 s vs 1.7 s.)
    "dedup_threshold_curve" -> ((s, d) =>
      Dedup.jaccardThresholdCurve(t(s, d, "documents"), "doc_id", "text",
        minJaccard = 0.05)),
    // the CAPPED twin: maxDocFreq=16 bounds every shingle's posting
    // list (Σdf² → Σmin(df,16)², the flattened scale curve in
    // SCALE.md). The gate corpus's hottest shingle has df=7, so the
    // cap provably drops nothing at sf0.01 — the oracle is the SAME
    // SQL as dedup_threshold_curve, making capped==uncapped a
    // hash-checked identity, not an assertion
    "dedup_threshold_curve_capped" -> ((s, d) =>
      Dedup.jaccardThresholdCurve(t(s, d, "documents"), "doc_id", "text",
        minJaccard = 0.05, maxDocFreq = Some(16))),
    // release dashboard: per-source totals -> rule-pass -> exact-dedup
    // keep, with stage retention fractions. Doubled corpus so the
    // dedup stage has real work (every text twice)
    "curation_funnel" -> ((s, d) =>
      graft.llm.Selection.curationFunnel(doubledDocs(s, d),
        "doc_id", "text", "source", stopwords = Seq("the", "a"))),
    // per-source token-length MAD flags: the curation length filter
    // done robustly (median/MAD, not mean/stddev — web corpora have
    // heavy length tails), reusing the exact-rational Outliers op
    "doc_length_outliers" -> ((s, d) =>
      graft.ops.Outliers.madFlags("source", "n_tokens")(
        t(s, d, "documents").select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")))
        .select("doc_id", "source", "n_tokens", "median", "mad", "is_outlier")),
    // windowed co-occurrence: colloc generalized to distance <= 3
    "text_skipgram_lift" -> ((s, d) =>
      TextAnalysis.skipgramLiftTopK("text", window = 3, k = 20, minPair = 3)(
        t(s, d, "documents"))),
    // the streaming curation gate's BATCH TWIN, oracle-gated: same
    // composition (quality -> decontam -> keep-first fingerprint
    // dedup -> store anti-join) on a static frame; vectors: bench =
    // ids %19==3 (excluded from the feed), store = ids %23==5
    "w6_curation_gate_twin" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .withColumn("ts", timestamp_micros(col("doc_id") * 1000000L))
      val bench = docs.where(col("doc_id") % 19 === 3)
      val store = docs.where(col("doc_id") % 23 === 5).select("doc_id", "text")
      graft.streaming.StreamingIngest.streamingCurationGate(
        docs.where(col("doc_id") % 19 =!= 3), store,
        graft.llm.Decontam.collectBenchGrams(bench, "text", 5),
        stopwords = Seq("the", "a"))
        .select("doc_id", "source")
    }),
    // config-driven curation: the reference's table-of-operations
    // identity applied to the training-data stack — this recipe is
    // DATA (four stage rows), interpreted into one declarative plan
    "pipeline_curation_config" -> ((s, d) =>
      graft.llm.CurationPipeline.run(doubledDocs(s, d),
        graft.llm.CurationPipeline.readRecipe(s,
          "/root/repo/fixtures/curation_demo/recipe.csv"))
        .select("doc_id", "source", "split")),
    // round-12 vocabulary: PII REDACT -> SEMANTIC DECONTAM (bench =
    // vectors of docs < 10, excluded from the corpus) -> NEAR DEDUP
    // KEEP-BEST on an upstream-produced ttr score — the full
    // published curation stack expressible as recipe rows
    "pipeline_curation_v2" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val toks = split(col("text"), " ")
      val corpus = t(s, d, "documents")
        .join(emb.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
        .where(col("doc_id") >= 10)
        .withColumn("ttr", size(array_distinct(toks)).cast("double") / size(toks))
      val bench = emb.where(col("vec_id") < 10)
        .select(col("vec_id").as("doc_id"), col("embedding"))
      graft.llm.CurationPipeline.run(corpus,
        graft.llm.CurationPipeline.readRecipe(s,
          "/root/repo/fixtures/curation_demo/recipe_v2.csv"),
        bench = Some(bench))
        .select("doc_id", "source", "ttr")
    }),
    // temperature sampling plan: tau=2 (invTau=0.5) upsampling weights
    "mixture_temperature" -> ((s, d) =>
      graft.llm.Packing.temperatureMixtureWeights("source",
        "n_tokens", invTau = 0.5)(
        t(s, d, "documents").withColumn("n_tokens",
          size(split(col("text"), " ")).cast("long")))),
    // lexicon safety pass: word-boundary exact matches only
    "text_blocklist" -> ((s, d) =>
      TextAnalysis.blocklistScan("doc_id", "text", Seq("slow", "junk", "big"))(
        t(s, d, "documents"))),
    // distributional diversity: fixed-point Σ c·ln(c) + 3 IEEE ops
    "text_entropy" -> ((s, d) =>
      TextAnalysis.unigramEntropy("doc_id", "text")(t(s, d, "documents"))),
    // lexical domain-similarity matrix over source pairs
    "vocab_overlap_matrix" -> ((s, d) =>
      graft.llm.Drift.vocabOverlapMatrix(t(s, d, "documents"), "source", "text")),
    // tokenizer QA by domain: per-source fertility under the trained
    // merge table (the per-doc native BPE encode rolled up)
    "bpe_fertility_by_source" -> ((s, d) =>
      TextAnalysis.withBpeTokenCount("text", SparkEntry.bpeMerges)(t(s, d, "documents"))
        .groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens_ws").cast("long")).as("sum_tokens_ws"),
          sum(col("n_tokens_bpe").cast("long")).as("sum_tokens_bpe"))
        .withColumn("fertility",
          col("sum_tokens_bpe").cast("double") / col("sum_tokens_ws"))),
    // the published Gopher rule battery (Rae et al. 2021 table A1):
    // integer counts + one IEEE division each, so the oracle is exact.
    // Stop list adapted to the corpus vocabulary (only 'the' from
    // Gopher's own list occurs in the synthetic word stream — the
    // default list would make the verdict vacuously false)
    "text_gopher_rules" -> ((s, d) =>
      TextAnalysis.gopherRules("doc_id", "text", stopwords = Seq("the", "a"))(
        t(s, d, "documents"))),
    // LM training-sample prep: 32-token windows on a 16-token stride
    // (half-overlap, the standard sliding-window eval/train layout)
    "text_token_windows" -> ((s, d) =>
      TextAnalysis.tokenWindows("doc_id", "text", win = 32, stride = 16)(
        t(s, d, "documents"))),
    // one BPE-training merge step: corpus-wide top-20 adjacent token
    // pairs (explode → partial-agg count → TakeOrderedAndProject)
    "text_bpe_pairs" -> ((s, d) =>
      TextAnalysis.bpePairCounts("text", k = 20)(t(s, d, "documents"))),
    // RAG retrieval-index prep: 120-char windows on an 80-char stride
    // (40-char overlap) — pure per-row explode, zero shuffles
    "text_chunks" -> ((s, d) =>
      TextAnalysis.chunkText("doc_id", "text", chunkChars = 120, strideChars = 80)(
        t(s, d, "documents"))),
    // CCNet-style fluency: every doc scored under an add-1 bigram LM
    // trained on the %4==0 subset standing in for the trusted corpus
    "text_lm_score" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.llm.LangModel.withLmScore(docs, docs.where(col("doc_id") % 4 === 0),
        "doc_id", "text")
    }),
    // novelty vs the accumulated store: incoming batch = %5==0 docs,
    // store = the rest; shuffled 8-byte gram-hash join, never a
    // broadcast (the store is corpus-scale by contract)
    "text_novelty" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.llm.Decontam.noveltyReport(
        docs.where(col("doc_id") % 5 === 0),
        docs.where(col("doc_id") % 5 =!= 0),
        "doc_id", "text", n = 3)
    }),
    // benchmark decontamination: docs with doc_id % 19 == 3 stand in
    // for the eval suite; every other doc is scanned for 5-gram
    // overlap with that set (broadcast semi-join — the bench side is
    // tiny by construction)
    "decontam_overlap" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.llm.Decontam.contaminationReport(
        docs.filter(col("doc_id") % 19 =!= 3),
        docs.filter(col("doc_id") % 19 === 3),
        "doc_id", "text", n = 5)
    }),
    // paraphrase-level decontam: docs 0-24 stand in for the eval
    // suite; banded MinHash across the two tables, exact-jaccard
    // verify. Oracle is all-pairs exact jaccard — sound under the
    // corpus-assumption spec (no pairs in the banding miss zone)
    "decontam_minhash" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.llm.MinhashDecontam.minhashContamination(
        docs.filter(col("doc_id") >= 25), docs.filter(col("doc_id") < 25),
        "doc_id", "text", threshold = 0.5)
    }),
    // semantic decontam: vectors 0-9 stand in for the embedded eval
    // suite; every corpus vector reports its nearest bench vector.
    // Threshold 0.35, not 0.9: the synthetic embeddings are
    // near-orthogonal (the sim_embedding_neardup rationale), so a
    // high gate would be vacuously all-false.
    "decontam_semantic" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      graft.llm.Decontam.semanticDecontam(
        emb.filter(col("vec_id") >= 10), emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", threshold = 0.35)
    }),
    // contrastive-pair mining: anchors 0-7, 2 positives + the 20-24
    // hard-negative rank band per anchor (DPR/ANCE-style)
    "mine_contrastive_pairs" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.contrastivePairs(emb, emb.where(col("vec_id") < 8),
        "vec_id", "embedding", posK = 2, negLo = 20, negHi = 24)
    }),
    // range join: clicks attributed to purchases within the hour
    // before them — points bucketed, intervals exploded to covered
    // buckets, candidates meet on an equi-join (no per-key cartesian).
    "range_attribution" -> ((s, d) => {
      val ev = eventsNanos(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          (col("ts") - expr("INTERVAL 1 HOUR")).as("win_start"), col("ts").as("win_end"))
      graft.ops.RangeJoin.bucketedRangeJoin(clicks, purchases, Seq("user_id"),
        "ts", "win_start", "win_end", bucketMicros = 3600L * 1000 * 1000)
    }),
    // as-of join: every purchase gains its user's most recent
    // preceding click (composition: union + running window — one
    // shuffle, no per-key cartesian). Oracle is DuckDB's native
    // ASOF LEFT JOIN.
    "asof_click_before_purchase" -> ((s, d) => {
      val ev = eventsNanos(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"), col("value").as("click_value"))
      graft.ops.AsOf.asofJoinBackward(purchases, clicks, Seq("user_id"),
        "ts", "click_ts", Seq("click_id", "click_ts", "click_value"), prefix = "")
    }),
    "asof_next_purchase_after_click" -> ((s, d) => {
      val ev = eventsNanos(s, d).withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val clicks = ev.where(col("event_type") === "click")
        .select("event_id", "user_id", "ts", "value")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      graft.ops.AsOf.asofJoinForward(clicks, purchases, Seq("user_id"),
        "ts", "purchase_ts", Seq("purchase_id", "purchase_ts", "purchase_value"), prefix = "")
    }),
    // z-order (Morton) key over (user_id, event_id): the bit
    // interleave the multi-dimensional layout sorts by
    // (io/ZOrder.scala — pruning itself is spec-measured in IoSpec)
    "zorder_key" -> ((s, d) =>
      eventsNanos(s, d).select(col("event_id"), col("user_id"),
        graft.io.ZOrder.zkey(Seq(col("user_id"), col("event_id"))).as("zkey"))),
    // salted skew join gated against the PLAIN join oracle — salting
    // must be invisible in the result, only in the partitioning
    "skew_salted_join" -> ((s, d) =>
      graft.ops.Skew.saltedLeftJoin(
        t(s, d, "orders"),
        t(s, d, "customer").withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), buckets = 8)),
    // bloom-pruned selective join gated against the PLAIN join oracle —
    // the prune must be invisible in the result, only in shuffle bytes
    "bloom_prefilter_join" -> ((s, d) => {
      val bigOrders = t(s, d, "orders").filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      graft.ops.BloomJoin.bloomPrunedJoin(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        bigOrders, "l_orderkey")
    }),

    // ===== corpus management: deterministic splits + summary stats =====
    "sample_hash_split" -> ((s, d) =>
      graft.llm.Sampling.withHashSplit("doc_id")(t(s, d, "documents"))
        .select("doc_id", "split")),
    "sample_hash_10pct" -> ((s, d) =>
      graft.llm.Sampling.hashSample("doc_id", 10)(t(s, d, "documents"))),
    // corpus balancing: keep 10% of overrepresented en, 30% elsewhere
    "sample_stratified" -> ((s, d) =>
      graft.llm.Sampling.stratifiedHashSample("doc_id", "lang",
        Seq("en" -> 10), defaultPct = 30)(t(s, d, "documents"))
        .select("doc_id", "lang")),
    // diversity-preserving subsample: <= 3 rows per IVF cell in the
    // stable md5 order (membership a pure function of the data)
    "sample_cluster_balanced" -> ((s, d) =>
      graft.llm.Sampling.clusterBalancedSample(t(s, d, "embeddings"),
        "vec_id", "embedding", ivfModel(s, d), perCell = 3)),
    // temperature-based domain balancing (alpha=0.5: the exponent is
    // a correctly-rounded sqrt, so the rate table is engine-exact)
    "sample_domain_mixture" -> ((s, d) =>
      graft.llm.Sampling.domainMixture("source")(t(s, d, "documents"))),
    "sample_domain_balanced" -> ((s, d) =>
      graft.llm.Sampling.temperatureBalancedSample("doc_id", "source")(t(s, d, "documents"))
        .select("doc_id", "source")),
    "text_top_terms" -> ((s, d) =>
      TextAnalysis.topTermsPerDoc("doc_id", "text", 3)(t(s, d, "documents"))),
    // per-language corpus stats: count, mean and EXACT median token
    // count (p50 interpolation is (a+b)/2 over integers — exact in
    // both engines, unlike general quantiles)
    "text_corpus_stats" -> ((s, d) =>
      TextAnalysis.withTokenStats("text")(t(s, d, "documents"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          avg(col("n_tokens")).as("mean_tokens"),
          expr("percentile(n_tokens, 0.5)").as("median_tokens"))),
    // one-row release datasheet: volume, diversity, dup fraction,
    // token-length shape — all counts/integer sums, engine-exact
    "corpus_datasheet" -> ((s, d) =>
      TextAnalysis.corpusDatasheet(t(s, d, "documents"), "text", "lang", "source")),

    // ===== sequence packing (llm/Packing.scala) =====
    // concat-and-chunk layout: sharded token stream, 2048-token
    // chunks; integer-only arithmetic so the DuckDB replay is
    // bit-exact (see Packing scaladoc for the 100 TB sharding story)
    "pack_sequences" -> ((s, d) =>
      graft.llm.Packing.packSequences("doc_id", "n_tokens", budget = 2048, shards = 16)(
        t(s, d, "documents")
          .select(col("doc_id"), size(split(col("text"), " ")).cast("int").as("n_tokens")))),
    // per-chunk loader manifest: docs/tokens starting in each chunk
    "pack_manifest" -> ((s, d) =>
      graft.llm.Packing.packManifest("doc_id", "n_tokens", budget = 2048, shards = 16)(
        t(s, d, "documents")
          .select(col("doc_id"), size(split(col("text"), " ")).cast("int").as("n_tokens")))),
    // length-band histogram for batch-shape planning (exact CASE
    // boundaries, no floating log2)
    "pack_length_hist" -> ((s, d) =>
      graft.llm.Packing.lengthHistogram("n_tokens")(
        t(s, d, "documents")
          .select(size(split(col("text"), " ")).cast("int").as("n_tokens")))),
    // stride-scheduled source interleave via two-phase ranking (no
    // per-source global sort); power-of-two rates → vt is an exact
    // binary scaling of the integer rank
    "pack_mixture_schedule" -> ((s, d) =>
      graft.llm.Packing.mixtureSchedule("doc_id", "source",
        Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
        defaultRate = 0.125, shards = 16)(
        t(s, d, "documents").select("doc_id", "source"))
        .select("doc_id", "source", "shard", "rank_in_source", "vt")),
    // incremental view maintenance: per-key mergeable state from two
    // disjoint time slices, merged + finalized — the oracle is the
    // direct recompute over all events the merge must equal
    "ivm_event_stats" -> ((s, d) => {
      val ev = eventsNanos(s, d).withColumn("value_cents",
        expr("cast(floor(value*100+0.5) as bigint)"))
      val cutoff = 1705276800000000000L // 2024-01-15T00:00Z as epoch nanos
      val a = graft.ops.Ivm.state(Seq("event_type"), "value_cents")(
        ev.where(col("ts") < cutoff))
      val b = graft.ops.Ivm.state(Seq("event_type"), "value_cents")(
        ev.where(col("ts") >= cutoff))
      graft.ops.Ivm.finalized(graft.ops.Ivm.merge(Seq("event_type"))(a, b))
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
    // deterministic per-epoch reshuffle schedule (two-phase ranked,
    // range-sharded on the order key — exact global hash order)
    "epoch_shuffle" -> ((s, d) =>
      graft.llm.Packing.epochShuffle("doc_id", epochs = 2, shards = 16)(
        t(s, d, "documents").select("doc_id"))),
    // quality-ranked token-budget selection: keep each source's best
    // 500 tokens by type-token ratio (bin-wholesale + exact boundary
    // == the oracle's per-document prefix rule)
    "select_token_budget" -> ((s, d) => {
      val toks = split(col("text"), " ")
      graft.llm.Selection.tokenBudgetSelect(
        "doc_id", "ttr", "n_tokens", "source", budget = 500L)(
        t(s, d, "documents").select(col("doc_id"), col("source"),
          (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr"),
          size(toks).cast("int").as("n_tokens")))
    }),
    // versioned store: publish v1 (subset) then v2 (full), read v1
    // back — time travel after a newer write; oracle reconstructs v1
    "s13_versioned_read" -> ((s, d) => {
      val dir = cleanedTempDir("graft_versioned_")
      val docs = t(s, d, "documents")
      graft.io.Versioned.writeVersion(docs.where(col("doc_id") < 250), dir)
      graft.io.Versioned.writeVersion(docs, dir)
      graft.io.Versioned.readVersion(s, dir, 1L)
    }),
    // collocation mining: adjacent-pair lift (exp-PMI) top-k, exact
    // integer factors + one IEEE division — no logs needed to rank
    "colloc_lift_topk" -> ((s, d) =>
      graft.llm.TextAnalysis.collocationTopK("text", k = 20, minPair = 3)(
        t(s, d, "documents"))),
    // provenance view of exact-substring dedup: which source pairs
    // share verbatim 30-grams, rolled up from the doc-pair view
    "overlap_source_matrix" -> ((s, d) =>
      graft.llm.Dedup.crossSourceOverlap(
        t(s, d, "documents"), "doc_id", "text", "source", k = 30)),
    // cross-domain score calibration: exact per-source percent_rank
    // via bin-decomposed two-phase ranking (no per-source global sort)
    "score_calibrate" -> ((s, d) => {
      val toks = split(col("text"), " ")
      graft.llm.Selection.calibrateScore("doc_id", "ttr", "source")(
        t(s, d, "documents").select(col("doc_id"), col("source"),
          (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr")))
    }),
    // per-type IQR winsorization of event values (integer cents +
    // binary-exact fractions → engine-exact interpolation)
    "winsorize_events" -> ((s, d) =>
      graft.ops.Profile.winsorize("event_type", "value_cents")(
        eventsNanos(s, d)
          .withColumn("value_cents", expr("cast(floor(value*100+0.5) as bigint)"))
          .select("event_id", "event_type", "value_cents"))),
    // curriculum schedule: quality-annealed deterministic priority
    // (best-first percentile blended 50/50 with the stable hash)
    "curriculum_priority" -> ((s, d) => {
      val toks = split(col("text"), " ")
      graft.llm.Selection.curriculumPriority("doc_id", "ttr", "source", mix = 0.5)(
        t(s, d, "documents").select(col("doc_id"), col("source"),
          (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr")))
    }),
    // exact-substring span cutting: merged removal spans over
    // corpus-duplicated 30-char grams (Lee et al. ExactSubstr's cut
    // list; dedup_kgram_coverage is the score-only audit)
    "span_repeat_spans" -> ((s, d) =>
      graft.llm.Dedup.kgramDupSpans(t(s, d, "documents"), "doc_id", "text", k = 30)),
    "span_clean_stats" -> ((s, d) =>
      graft.llm.Dedup.spanCleanStats(t(s, d, "documents"), "doc_id", "text", k = 30)),
    // the cut itself: training copy with duplicated spans removed
    "span_cut_text" -> ((s, d) =>
      graft.llm.Dedup.cutSpans(t(s, d, "documents"), "doc_id", "text", k = 30)
        .select("doc_id", "clean_text")),
    // near-dedup keeping each cluster's best-quality doc (ttr score)
    // instead of its lowest id — the production keep policy
    "dedup_near_keep_best" -> ((s, d) => {
      val toks = split(col("text"), " ")
      graft.llm.Dedup.nearDedupKeepBest(
        t(s, d, "documents").select(col("doc_id"), col("text"),
          (size(array_distinct(toks)).cast("double") / size(toks)).as("ttr")),
        "doc_id", "text", "ttr", threshold = 0.5)
        .select("doc_id", "ttr")
    }),
    // weighted top-k via priority sampling (w/u, one IEEE division —
    // engine-exact, unlike exponential-keys' libm pow/ln)
    "sample_priority_topk" -> ((s, d) =>
      graft.llm.Sampling.prioritySample("doc_id", "n_tokens", 50)(
        t(s, d, "documents")
          .select(col("doc_id"), size(split(col("text"), " ")).cast("int").as("n_tokens")))),
    // DSIR importance weights: per-doc log-likelihood ratio of
    // target-vs-raw hashed-bigram models, fixed-point per bucket so
    // the per-doc sum is an exact integer (llm/Dsir.scala)
    "dsir_weights" -> ((s, d) =>
      graft.llm.Dsir.importanceWeights("doc_id", "text", col("lang") === "en")(
        t(s, d, "documents"))),
    // corpus drift monitor: PSI between two snapshot halves, per
    // lang and per length band (llm/Drift.scala — fixed-point
    // contributions so the total is an exact integer sum)
    "drift_lang" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.llm.Drift.categoryDrift(col("lang"))(
        docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 === 1))
    }),
    "drift_length_bands" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val band = when(col("n_chars") < 200, "short")
        .when(col("n_chars") < 400, "mid").otherwise("long")
      graft.llm.Drift.categoryDrift(band)(
        docs.where(col("doc_id") % 2 === 0), docs.where(col("doc_id") % 2 === 1))
    }),
    // content-level snapshot diff: the "new" snapshot is a
    // deterministic edit of the corpus (drop %17, append to %13,
    // re-id %19 as additions) replayed identically by the oracle
    "drift_snapshot" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val base = docs.where(col("doc_id") % 17 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      val added = docs.where(col("doc_id") % 19 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      graft.llm.Drift.snapshotDiff(docs, base.unionByName(added), "doc_id",
        Seq("text", "lang", "source", "n_chars"))
    }),

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

    // the typical pretraining funnel composed end-to-end: cheap
    // quality gates first, then dedup, then labeling — one lazy plan
    "pipeline_preprocess" -> ((s, d) => {
      val scored = TextAnalysis.withQualityScores("text")(doubledDocs(s, d))
      val gated = scored.filter(col("n_tokens") >= 30 && col("ttr") >= 0.4)
      val deduped = Dedup.exactDedup("text", "doc_id")(gated)
      TextAnalysis.withLangId("text", Seq(
        "en" -> Seq("the", "a"),
        "db" -> Seq("table", "query", "row")))(deduped)
        .select("doc_id", "n_tokens", "ttr", "lang_pred")
    }),
    // the end-to-end training-data prep path a corpus takes before
    // training: quality gate -> exact dedup -> LSH near-dedup ->
    // leak-proof deterministic split. Every stage is the scale path
    // (md5-keyed dedup, banded near-dup, zero-shuffle split); the
    // oracle replays the whole chain with exact all-pairs jaccard.
    "pipeline_train_prep" -> ((s, d) => {
      val scored = TextAnalysis.withQualityScores("text")(doubledDocs(s, d))
      val gated = scored.filter(col("n_tokens") >= 20 && col("ttr") >= 0.3)
      val exact = Dedup.exactDedup("text", "doc_id")(gated)
      val near = Dedup.nearDedup(exact, "doc_id", "text", threshold = 0.5)
      graft.llm.Sampling.withHashSplit("doc_id")(near)
        .select("doc_id", "n_tokens", "ttr", "split")
    }),
    // steady-state ingest: diff the arriving snapshot against the
    // store, content-dedup ONLY the added docs against the store's
    // digest set, quality-gate the survivors. The %50==1 rows are
    // planted content-dups (store rows re-id'd), so the dedup stage
    // provably drops — nothing here reprocesses the store
    "pipeline_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val store = docs.where(col("doc_id") % 5 =!= 0)
      val incoming = docs.where(col("doc_id") % 5 === 0)
        .unionByName(docs.where(col("doc_id") % 50 === 1)
          .withColumn("doc_id", col("doc_id") + 2000000L))
      val diff = graft.llm.Drift.snapshotDiff(store, store.unionByName(incoming),
        "doc_id", Seq("text", "lang", "source", "n_chars"))
      val addedDocs = incoming.join(
        diff.where(col("status") === "added").select("doc_id"), Seq("doc_id"), "left_semi")
      val novel = Dedup.incrementalDedup("text", addedDocs, store)
      TextAnalysis.withQualityScores("text")(novel)
        .where(col("n_tokens") >= 30)
        .select("doc_id", "n_tokens", "ttr")
    }),

    // ===== vector-column ops over embeddings =====
    "vec_norm" -> ((s, d) =>
      t(s, d, "embeddings").select(col("vec_id"),
        Similarity.l2norm(col("embedding").cast("array<double>")).as("l2"))),
    // slice/transform/aggregate over the vector column, flattened to
    // scalar rows (posexplode) — the driver's row compare can't sort
    // array-typed columns, and exploding avoids any float→string
    // formatting divergence a serialized form would risk.
    "vec_slice_ops" -> ((s, d) => {
      val v = col("embedding").cast("array<double>")
      t(s, d, "embeddings")
        .select(
          col("vec_id"),
          slice(v, 1, 8).as("head8"),
          transform(v, x => x * 2.0).as("scaled"),
          aggregate(v, lit(0.0), (acc, x) => acc + x).as("sum_elems"))
        .select(col("vec_id"), col("head8"), col("sum_elems"),
          posexplode(col("scaled")).as(Seq("idx", "scaled_elem")))
        .select(
          col("vec_id"), col("idx"),
          when(col("idx") < 8, element_at(col("head8"), col("idx") + 1)).as("head_elem"),
          col("scaled_elem"), col("sum_elems"))
    }),
    // per-vector int8 quantization audit: scalar code checksums plus
    // `recon_ok` — every element inside the closed-form half-step
    // bound scale/254 (llm/Quantize.scala scaladoc has the scheme)
    "vec_quantize_audit" -> ((s, d) =>
      graft.llm.Quantize.int8Audit("vec_id", "embedding")(t(s, d, "embeddings"))),

    // ===== LLM pipeline: multimodal =====
    "mm_binary_meta" -> ((s, d) =>
      Multimodal.withBinaryMeta("content")(
        Multimodal.withBinaryContent("text")(t(s, d, "documents")))
        .select("doc_id", "n_bytes", "content_sha256")),
    "mm_chunks" -> ((s, d) =>
      Multimodal.chunkBinary("content", 100)(
        Multimodal.withBinaryContent("text")(t(s, d, "documents")))
        .select(col("doc_id"), col("chunk_idx"), decode(col("chunk"), "UTF-8").as("chunk_str"))),
    // REAL header decode over synthesized-but-valid PNG/JPEG byte
    // streams (and raw text as the unrecognized branch): the parser is
    // the general segment walker, the fixture varies the SOF offset
    // per row, the oracle states the dimensions closed-form
    "mm_decode" -> ((s, d) => {
      val withImg = t(s, d, "documents")
        .withColumn("content", Multimodal.synthMediaContent(col("doc_id"), col("text")))
      Multimodal.withImageMeta("content")(withImg)
        .select(col("doc_id"), col("media_meta.format").as("format"),
          col("media_meta.width").as("width"), col("media_meta.height").as("height"),
          octet_length(col("content")).as("n_bytes"))
    }),
    // REAL WAV header decode over the synthesized RIFF stream — the
    // audio twin of mm_decode; LIST chunks at variable offsets and
    // odd-size alignment pads are part of the fixture
    "mm_audio_meta" -> ((s, d) => {
      val withWav = t(s, d, "documents")
        .withColumn("content", Multimodal.synthAudioContent(col("doc_id"), col("text")))
      Multimodal.withAudioMeta("content")(withWav)
        .select(col("doc_id"), col("audio_meta.format").as("format"),
          col("audio_meta.channels").as("channels"),
          col("audio_meta.sample_rate").as("sample_rate"),
          col("audio_meta.bits_per_sample").as("bits_per_sample"),
          col("audio_meta.n_frames").as("n_frames"))
    }),
    // REAL MP4 box-walk over the synthesized ISO-BMFF stream — the
    // video leg of the image/audio/video trio; variable-size free
    // boxes at BOTH nesting levels and mvhd v0/v1 are in the fixture
    "mm_video_meta" -> ((s, d) => {
      val withMp4 = t(s, d, "documents")
        .withColumn("content", Multimodal.synthVideoContent(col("doc_id"), col("text")))
      Multimodal.withVideoMeta("content")(withMp4)
        .select(col("doc_id"), col("video_meta.format").as("format"),
          col("video_meta.brand").as("brand"),
          col("video_meta.timescale").as("timescale"),
          col("video_meta.duration").as("duration"))
    }),
    // REAL per-chunk byte features: the batched feature-extract pass
    // (histogram stats + Shannon entropy) over 100-byte chunks.
    // Entropy is rounded to 4dp on both sides — the two engines sum
    // the same c*ln(c) terms in different orders (~1e-13 apart), and
    // at 4dp the odds of that perturbation straddling a rounding
    // boundary are negligible (6dp left a ~1e-7 per-chunk flake).
    "mm_features" -> ((s, d) =>
      Multimodal.withByteStats("chunk")(
        Multimodal.chunkBinary("content", 100)(
          Multimodal.withBinaryContent("text")(t(s, d, "documents"))))
        .select(col("doc_id"), col("chunk_idx"),
          col("byte_stats.n_bytes").as("n_bytes"),
          col("byte_stats.n_distinct").as("n_distinct"),
          col("byte_stats.byte_sum").as("byte_sum"),
          col("byte_stats.n_printable").as("n_printable"),
          round(col("byte_stats.entropy"), 4).as("entropy"))),
    // whole-doc normalized 16-bin byte histogram, posexploded to
    // scalar rows (same array-compare rationale as vec_slice_ops)
    "mm_byte_hist" -> ((s, d) =>
      Multimodal.withByteHist("content", bins = 16)(
        Multimodal.withBinaryContent("text")(t(s, d, "documents")))
        .select(col("doc_id"), posexplode(col("byte_hist")).as(Seq("bin_idx", "p")))),
  )

  // ===== oracle-SQL builders for the LSH / SimHash families =====
  // The hyperplanes and token hashes are deterministic (seeded Scala
  // RNG / md5), so the DuckDB oracle can replicate bucket assignment
  // bit-for-bit with the planes embedded as list literals. These
  // oracles are banding-AWARE: they reproduce the candidate
  // generation, not just the final threshold, so recall is part of
  // what the gate checks.

  /** Must mirror the defaults the sim_ann_topk / sim_embedding_neardup
    * queries pass to [[Similarity.annTopK]] / embeddingNearDupPairs.
    */
  private lazy val annPlanes = Similarity.hyperplanes(dim = 64, nPlanes = 8, seed = 42L)

  /** Sign-LSH bucket id over a DuckDB DOUBLE[] expression: bit p =
    * (v · plane_p) > 0, packed — same arithmetic as
    * [[Similarity.lshBucket]] (list_inner_product and Spark's
    * aggregate both fold ascending-index, so the signs agree exactly).
    */
  private def duckBucketExpr(v: String): String =
    annPlanes.zipWithIndex.map { case (plane, p) =>
      s"(CASE WHEN list_inner_product($v, [${plane.mkString(",")}]) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** Multi-probe bucket list: self plus every Hamming-1 neighbour. */
  private def duckProbeList(b: String): String =
    s"[$b${(0 until annPlanes.length).map(i => s", xor($b, ${1L << i})").mkString}]"

  private val duckCosine = (x: String, y: String) =>
    s"list_inner_product($x, $y) / (sqrt(list_inner_product($x, $x)) * sqrt(list_inner_product($y, $y)))"

  private def annTopKOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c AS (SELECT vec_id AS neighbor_id, v AS cv, ${duckBucketExpr("v")} AS bucket FROM e),
       |p0 AS (SELECT vec_id AS probe_id, v AS pv, ${duckBucketExpr("v")} AS bucket FROM e WHERE vec_id < 5),
       |p AS (SELECT probe_id, pv, unnest(${duckProbeList("bucket")}) AS bucket FROM p0),
       |cand AS (SELECT DISTINCT probe_id, neighbor_id FROM c JOIN p USING (bucket)),
       |scored AS (SELECT cand.probe_id, cand.neighbor_id, ${duckCosine("c.cv", "q.pv")} AS sim
       |  FROM cand JOIN c ON cand.neighbor_id = c.neighbor_id JOIN p0 q ON cand.probe_id = q.probe_id)
       |SELECT probe_id, neighbor_id, sim, rank FROM (
       |  SELECT *, CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
       |  FROM scored)
       |WHERE rank <= 5""".stripMargin

  private def embeddingNearDupOracle: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |b AS (SELECT vec_id, ${duckBucketExpr("v")} AS bucket FROM e),
       |l AS (SELECT vec_id AS id_a, unnest(${duckProbeList("bucket")}) AS bucket FROM b),
       |r AS (SELECT vec_id AS id_b, bucket FROM b),
       |pairs AS (SELECT DISTINCT id_a, id_b FROM l JOIN r USING (bucket) WHERE id_a < id_b),
       |scored AS (SELECT p.id_a, p.id_b, ${duckCosine("x.v", "y.v")} AS sim
       |  FROM pairs p JOIN e x ON p.id_a = x.vec_id JOIN e y ON p.id_b = y.vec_id)
       |SELECT id_a, id_b, sim FROM scored WHERE sim >= 0.4""".stripMargin

  /** All-pairs SimHash oracle, valid because the query's maxHamming=3
    * blocking is pigeonhole-complete (Dedup.simhashPairs). Replicates
    * md5Hash60 via DuckDB's hex-literal cast; only bits 0–59 exist.
    */
  /** Shared DuckDB CTE replaying [[graft.llm.Dedup.cdcChunks]]: word
    * split, md5-prefix boundary hash (% 8), chunk index = count of
    * boundaries among STRICTLY preceding words (boundary word ends
    * its chunk), chunk text re-joined in word order. The window SUM's
    * HUGEINT stays internal — every output column is cast on the way
    * out by the queries that append to this.
    */
  private def cdcChunksCte: String =
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> length(w) > 0) AS tk
      |  FROM documents),
      |w AS (
      |  SELECT doc_id, g.i AS i, tk[g.i] AS w,
      |         CASE WHEN CAST(concat('0x', substr(md5(tk[g.i]), 1, 15)) AS BIGINT) % 8 = 0
      |              THEN 1 ELSE 0 END AS b
      |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i) g),
      |cid AS (
      |  SELECT doc_id, i, w,
      |         COALESCE(SUM(b) OVER (PARTITION BY doc_id ORDER BY i
      |                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cidx
      |  FROM w),
      |chunks AS (
      |  SELECT doc_id, cidx, string_agg(w, ' ' ORDER BY i) AS chunk,
      |         CAST(count(*) AS BIGINT) AS n_words
      |  FROM cid GROUP BY doc_id, cidx)
      |""".stripMargin

  private def simhashPairsOracle: String = {
    val bitSums = (0 until 60)
      .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS b$j").mkString(", ")
    val fpExpr = (0 until 60)
      .map(j => s"(CASE WHEN b$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
       |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h FROM tok),
       |bits AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id),
       |fp AS (SELECT doc_id, $fpExpr AS fp FROM bits)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
       |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 3""".stripMargin
  }

  /** Bench-only phase decomposition (consumed by Bench.main): the
    * same code paths as the registry query, with a timing boundary
    * between the store WRITE (nest shuffle + partitioned parquet) and
    * the partition-pruned READ, so the pruned-read cost — the number
    * that matters for a point lookup on a 100 TB store — is visible
    * on its own instead of buried in a roundtrip total. Phases run in
    * order within one bench rep; each thunk fully materializes.
    * Correctness still gates the fused registry query; this map only
    * changes how Bench times it.
    */
  def benchPhases: Map[String, (SparkSession, String) => Seq[(String, () => Unit)]] = Map(
    "s1_keyed_scan" -> ((s, d) => {
      val store = scratch("bench_keyed_store")
      Seq(
        "write" -> { () =>
          val base = t(s, d, "lineitem").select(
            col("l_returnflag").as("study_code"), col("l_linestatus").as("view"),
            col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          NestedStore.write(NestedStore.nest(base, "study_code", "view"), store)
        },
        "read" -> { () =>
          NestedStore.flatten(
            s.read.parquet(store).where(col("study_code") === "R" && col("view") === "F"))
            .write.mode("overwrite").format("noop").save()
        })
    }),
    // the deployed-index lifecycle split into its real phases: the
    // write-once layout build vs the steady-state pruned probe read —
    // a fused timing buries the read path the layout exists to serve
    "s16_ivf_cell_layout" -> ((s, d) => {
      val path = scratch("bench_ivf_cells")
      val emb = t(s, d, "embeddings")
      Seq(
        "write" -> { () =>
          graft.llm.Ivf.writeCellLayout(emb, "vec_id", "embedding", ivfModel(s, d), path)
        },
        "probe" -> { () =>
          graft.llm.Ivf.cellLayoutTopK(s, path, emb.where(col("vec_id") < 5),
            "vec_id", "embedding", ivfModel(s, d), k = 5, nProbe = 4)
            .write.mode("overwrite").format("noop").save()
        })
    }))

  /** Oracles whose SQL depends on runtime-trained state: generated at
    * Verify time and merged into oracle_sql.json next to the static
    * map. sim_ivf_topk embeds the seeded-KMeans centroids (shared with
    * the query via [[ivfModel]]) as DOUBLE[] literals.
    */
  def dynamicOracleSql: Map[String, (SparkSession, String) => String] = Map(
    "sim_ivf_topk" -> ((s, d) => {
      val m = ivfModel(s, d)
      val cents = m.centroids.zipWithIndex.map { case (c, i) =>
        s"($i, [${c.mkString(", ")}]::DOUBLE[])"
      }.mkString(", ")
      // dist replicates Ivf.nearestCentroids exactly: term (v_j-c_j)^2
      // folded ascending (list_inner_product of the diff with itself)
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents(cid, c) AS (VALUES $cents),
         |d AS (SELECT vec_id, cid,
         |        list_inner_product(list_transform(generate_series(1, len(v)), j -> v[j] - c[j]),
         |                           list_transform(generate_series(1, len(v)), j -> v[j] - c[j])) AS dist
         |      FROM e CROSS JOIN cents),
         |corp AS (SELECT vec_id AS neighbor_id, cid AS centroid_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1),
         |prb AS (SELECT vec_id AS probe_id, cid AS centroid_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d WHERE vec_id < 5) WHERE rn <= 4),
         |scored AS (SELECT p.probe_id, c.neighbor_id, ${duckCosine("x.v", "y.v")} AS sim
         |  FROM corp c JOIN prb p USING (centroid_id)
         |  JOIN e x ON c.neighbor_id = x.vec_id JOIN e y ON p.probe_id = y.vec_id)
         |SELECT probe_id, neighbor_id, sim, rank FROM (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank
         |  FROM scored)
         |WHERE rank <= 5""".stripMargin
    }),
    // the partitioned-layout search answers exactly what the
    // in-memory IVF answers — same replay
    "s16_ivf_cell_layout" -> ((s, d) => dynamicOracleSql("sim_ivf_topk")(s, d)),
    // roundtrip assignment replay: the TRAINED centroids as literals
    // (loaded == trained iff the artifact round-trips bit-exactly)
    "s15_ivf_model_roundtrip" -> ((s, d) => {
      val m = ivfModel(s, d)
      val cents = m.centroids.zipWithIndex.map { case (c, i) =>
        s"($i, [${c.mkString(", ")}]::DOUBLE[])"
      }.mkString(", ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents(cid, c) AS (VALUES $cents),
         |d AS (SELECT vec_id, cid,
         |        list_inner_product(list_transform(generate_series(1, len(v)), j -> v[j] - c[j]),
         |                           list_transform(generate_series(1, len(v)), j -> v[j] - c[j])) AS dist
         |      FROM e CROSS JOIN cents),
         |asg AS (SELECT vec_id, CAST(cid AS INTEGER) AS centroid_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1)
         |SELECT vec_id, centroid_id FROM asg""".stripMargin
    }),
    // cell-purity replay: same assignment CTE; counts + mode with
    // the tie-to-lowest-label rule
    "sim_cell_purity" -> ((s, d) => {
      val m = ivfModel(s, d)
      val cents = m.centroids.zipWithIndex.map { case (c, i) =>
        s"($i, [${c.mkString(", ")}]::DOUBLE[])"
      }.mkString(", ")
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |cents(cid, c) AS (VALUES $cents),
         |d AS (SELECT vec_id, cid,
         |        list_inner_product(list_transform(generate_series(1, len(v)), j -> v[j] - c[j]),
         |                           list_transform(generate_series(1, len(v)), j -> v[j] - c[j])) AS dist
         |      FROM e CROSS JOIN cents),
         |asg AS (SELECT vec_id, CAST(cid AS INTEGER) AS centroid_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1),
         |counts AS (SELECT a.centroid_id, e.label AS l, count(*) AS n
         |           FROM asg a JOIN e ON a.vec_id = e.vec_id GROUP BY 1, 2),
         |tot AS (SELECT centroid_id, CAST(SUM(n) AS BIGINT) AS n_vectors FROM counts GROUP BY 1)
         |SELECT c.centroid_id, t.n_vectors, c.l AS majority_label, c.n AS n_majority,
         |       CAST(c.n AS DOUBLE) / t.n_vectors AS purity
         |FROM (SELECT *, row_number() OVER (PARTITION BY centroid_id ORDER BY n DESC, l) AS rn
         |      FROM counts) c
         |JOIN tot t ON c.centroid_id = t.centroid_id
         |WHERE c.rn = 1""".stripMargin
    }),
    // label-consistency replay: same assignment CTE; same-cell
    // neighbors ranked excluding self (equivalent to the query's
    // top-(k+1)-then-drop-self two-stage — self holds at most one
    // slot), majority vote ties to the lowest label
    "sim_label_consistency" -> ((s, d) => {
      val m = ivfModel(s, d)
      val cents = m.centroids.zipWithIndex.map { case (c, i) =>
        s"($i, [${c.mkString(", ")}]::DOUBLE[])"
      }.mkString(", ")
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |cents(cid, c) AS (VALUES $cents),
         |d AS (SELECT vec_id, cid,
         |        list_inner_product(list_transform(generate_series(1, len(v)), j -> v[j] - c[j]),
         |                           list_transform(generate_series(1, len(v)), j -> v[j] - c[j])) AS dist
         |      FROM e CROSS JOIN cents),
         |asg AS (SELECT vec_id, CAST(cid AS INTEGER) AS centroid_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1),
         |knn AS (SELECT a.vec_id AS probe_id, b.vec_id AS neighbor_id, ${duckCosine("ea.v", "eb.v")} AS sim
         |        FROM asg a JOIN asg b USING (centroid_id)
         |        JOIN e ea ON a.vec_id = ea.vec_id JOIN e eb ON b.vec_id = eb.vec_id
         |        WHERE a.vec_id <> b.vec_id),
         |topk AS (SELECT probe_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rn FROM knn)
         |  WHERE rn <= 5),
         |votes AS (SELECT t.probe_id, e.label AS nl, count(*) AS n
         |          FROM topk t JOIN e ON t.neighbor_id = e.vec_id GROUP BY 1, 2),
         |maj AS (SELECT probe_id AS vec_id, nl AS knn_label, n AS n_votes FROM (
         |    SELECT *, row_number() OVER (PARTITION BY probe_id ORDER BY n DESC, nl) AS rv FROM votes)
         |  WHERE rv = 1)
         |SELECT e.vec_id, e.label, m.knn_label,
         |       COALESCE(m.n_votes, 0) AS n_votes,
         |       COALESCE(e.label = m.knn_label, FALSE) AS consistent
         |FROM e LEFT JOIN maj m ON e.vec_id = m.vec_id""".stripMargin
    }),
    // Lloyd-refinement replay: same assignment CTE; the per-(cell,
    // dim) sums quantize each component BEFORE summation, so both
    // engines sum exact integers and combine order cannot matter
    "ivf_refine_cells" -> ((s, d) => {
      val m = ivfModel(s, d)
      val cents = m.centroids.zipWithIndex.map { case (c, i) =>
        s"($i, [${c.mkString(", ")}]::DOUBLE[])"
      }.mkString(", ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents(cid, c) AS (VALUES $cents),
         |d AS (SELECT vec_id, cid,
         |        list_inner_product(list_transform(generate_series(1, len(v)), j -> v[j] - c[j]),
         |                           list_transform(generate_series(1, len(v)), j -> v[j] - c[j])) AS dist
         |      FROM e CROSS JOIN cents),
         |asg AS (SELECT vec_id, CAST(cid AS INTEGER) AS centroid_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1),
         |x AS (SELECT a.centroid_id, CAST(g.j - 1 AS INTEGER) AS dim,
         |             CAST(round(e.v[g.j] * 10000) AS BIGINT) AS q
         |      FROM asg a JOIN e ON a.vec_id = e.vec_id,
         |           LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS j) g)
         |SELECT centroid_id, dim, CAST(SUM(q) AS BIGINT) AS sum_q, count(*) AS n_assigned
         |FROM x GROUP BY 1, 2""".stripMargin
    }),
    // SemDeDup replay: the assignment CTE mirrors sim_ivf_topk's
    // (nearest centroid by squared distance, ties to the lower cid);
    // the drop rule is the keep-lowest-id within-cell cosine gate
    "sim_semdedup_keep" -> ((s, d) => {
      val m = ivfModel(s, d)
      val cents = m.centroids.zipWithIndex.map { case (c, i) =>
        s"($i, [${c.mkString(", ")}]::DOUBLE[])"
      }.mkString(", ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents(cid, c) AS (VALUES $cents),
         |d AS (SELECT vec_id, cid,
         |        list_inner_product(list_transform(generate_series(1, len(v)), j -> v[j] - c[j]),
         |                           list_transform(generate_series(1, len(v)), j -> v[j] - c[j])) AS dist
         |      FROM e CROSS JOIN cents),
         |asg AS (SELECT vec_id, CAST(cid AS INTEGER) AS centroid_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1),
         |drops AS (SELECT DISTINCT b.vec_id
         |          FROM asg a JOIN asg b USING (centroid_id)
         |          JOIN e ea ON a.vec_id = ea.vec_id
         |          JOIN e eb ON b.vec_id = eb.vec_id
         |          WHERE a.vec_id < b.vec_id AND ${duckCosine("ea.v", "eb.v")} >= 0.4)
         |SELECT g.vec_id, g.centroid_id FROM asg g
         |WHERE g.vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin
    }),
    // cluster-balanced sample replay: same assignment CTE; the md5
    // order key is the 60-bit hex-prefix integer (monotone in the
    // query's hashFraction, so row_number agrees)
    "sample_cluster_balanced" -> ((s, d) => {
      val m = ivfModel(s, d)
      val cents = m.centroids.zipWithIndex.map { case (c, i) =>
        s"($i, [${c.mkString(", ")}]::DOUBLE[])"
      }.mkString(", ")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents(cid, c) AS (VALUES $cents),
         |d AS (SELECT vec_id, cid,
         |        list_inner_product(list_transform(generate_series(1, len(v)), j -> v[j] - c[j]),
         |                           list_transform(generate_series(1, len(v)), j -> v[j] - c[j])) AS dist
         |      FROM e CROSS JOIN cents),
         |asg AS (SELECT vec_id, CAST(cid AS INTEGER) AS centroid_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1)
         |SELECT vec_id, centroid_id FROM (
         |  SELECT vec_id, centroid_id,
         |         row_number() OVER (PARTITION BY centroid_id
         |           ORDER BY CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT), vec_id) AS rn
         |  FROM asg)
         |WHERE rn <= 3""".stripMargin
    }),
    // skew-hardened SemDeDup: cell assignment + 4-plane sub-bucket
    // (multi-probe left side) replayed with the same plane literals
    // the query derives from hyperplanes(64, 4, 42)
    "sim_semdedup_bucketed" -> ((s, d) => {
      val m = ivfModel(s, d)
      val cents = m.centroids.zipWithIndex.map { case (c, i) =>
        s"($i, [${c.mkString(", ")}]::DOUBLE[])"
      }.mkString(", ")
      val planes = Similarity.hyperplanes(64, 4, 42L)
      val bucketExpr = planes.zipWithIndex.map { case (plane, p) =>
        s"(CASE WHEN list_inner_product(v, [${plane.mkString(",")}]) > 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
      val probeList =
        s"[bucket${(0 until planes.length).map(i => s", xor(bucket, ${1L << i})").mkString}]"
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cents(cid, c) AS (VALUES $cents),
         |d AS (SELECT vec_id, cid,
         |        list_inner_product(list_transform(generate_series(1, len(v)), j -> v[j] - c[j]),
         |                           list_transform(generate_series(1, len(v)), j -> v[j] - c[j])) AS dist
         |      FROM e CROSS JOIN cents),
         |asg AS (SELECT vec_id, CAST(cid AS INTEGER) AS centroid_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn FROM d) WHERE rn = 1),
         |bk AS (SELECT vec_id, $bucketExpr AS bucket FROM e),
         |l AS (SELECT a.vec_id, a.centroid_id, unnest($probeList) AS bucket
         |      FROM asg a JOIN bk USING (vec_id)),
         |r AS (SELECT a.vec_id, a.centroid_id, bucket FROM asg a JOIN bk USING (vec_id)),
         |drops AS (SELECT DISTINCT b.vec_id
         |          FROM l a JOIN r b ON a.centroid_id = b.centroid_id AND a.bucket = b.bucket
         |          JOIN e ea ON a.vec_id = ea.vec_id
         |          JOIN e eb ON b.vec_id = eb.vec_id
         |          WHERE a.vec_id < b.vec_id AND ${duckCosine("ea.v", "eb.v")} >= 0.4)
         |SELECT g.vec_id, g.centroid_id FROM asg g
         |WHERE g.vec_id NOT IN (SELECT vec_id FROM drops)""".stripMargin
    }))

  /** DuckDB oracles — every entry in [[queries]] has one here or in
    * [[dynamicOracleSql]]; no silent rows-only rows remain.
    */
  def oracleSql: Map[String, String] = Map(
    "p1_tolerant_project_skip" -> "SELECT * FROM lineitem",
    "p1_tolerant_project" -> "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "p2_select_columns" -> "SELECT o_orderkey, o_custkey, o_totalprice FROM orders",
    "p3_select_distinct" -> "SELECT DISTINCT c_mktsegment FROM customer",
    "p4_unique_columns" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |      FROM orders) WHERE rn = 1""".stripMargin,
    "p5_remove_columns" -> "SELECT n_nationkey, n_name FROM nation",
    "f1_eq_string" -> "SELECT * FROM lineitem WHERE l_returnflag = 'R'",
    "f1_ge_number" -> "SELECT * FROM lineitem WHERE l_quantity >= 45",
    "f1_le_date" -> "SELECT * FROM lineitem WHERE l_shipdate <= TIMESTAMP '1993-06-30 00:00:00'",
    "f2_not_null" ->
      s"SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, big_total FROM $nullBaseSql WHERE big_total IS NOT NULL",
    "f3_conjunction" -> "SELECT * FROM lineitem WHERE l_returnflag = 'R' AND l_linestatus = 'F'",
    "f4_disjunction" -> "SELECT * FROM orders WHERE o_orderpriority = '1-URGENT' OR o_orderstatus = 'F'",
    "f5_between_number" -> "SELECT * FROM lineitem WHERE l_quantity BETWEEN 5 AND 10",
    "f5_between_date" ->
      "SELECT * FROM orders WHERE o_orderdate BETWEEN TIMESTAMP '1994-01-01 00:00:00' AND TIMESTAMP '1994-12-31 00:00:00'",
    "j1_left_join" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority,
        |       c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    "j1_suffix_policy" ->
      """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice AS val_x, c.c_acctbal AS val_y
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    "j2_outer_join" ->
      """SELECT COALESCE(s.s_nationkey, n.n_nationkey) AS n_nationkey, s.s_suppkey, s.s_name, s.s_acctbal,
        |       n.n_name, n.n_regionkey
        |FROM supplier s FULL OUTER JOIN nation n ON s.s_nationkey = n.n_nationkey""".stripMargin,
    "j3_qualified_join" ->
      "SELECT * FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey",
    "j6_semi_join" ->
      "SELECT * FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "j6_anti_join" ->
      "SELECT * FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)",
    "j5_bucketed_join" ->
      """SELECT c.c_custkey, c.c_name, c.c_acctbal, o.n_orders, o.max_totalprice
        |FROM customer c JOIN (
        |  SELECT o_custkey AS c_custkey, count(*) AS n_orders, max(o_totalprice) AS max_totalprice
        |  FROM orders GROUP BY 1) o USING (c_custkey)""".stripMargin,
    "a1_summarise_minmax" ->
      """SELECT l_returnflag, l_linestatus, min(l_quantity) AS l_quantity, max(l_extendedprice) AS l_extendedprice
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "a1_summarise_sum_count" ->
      "SELECT l_returnflag, sum(l_quantity) AS l_quantity, count(l_orderkey) AS l_orderkey FROM lineitem GROUP BY 1",
    "a1_summarise_mean" ->
      "SELECT l_returnflag, avg(l_quantity) AS l_quantity FROM lineitem GROUP BY 1",
    "a1_summarise_last" ->
      """SELECT l_orderkey, l_quantity FROM (
        |  SELECT l_orderkey, l_quantity,
        |         row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber DESC, l_quantity DESC) AS rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin,
    "a1_summarise_first" ->
      """SELECT l_orderkey, l_quantity FROM (
        |  SELECT l_orderkey, l_quantity,
        |         row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS rn
        |  FROM lineitem) WHERE rn = 1""".stripMargin,
    "a2_aggregate_min" ->
      "SELECT *, least(l_quantity, l_discount, l_tax) AS min_val FROM lineitem",
    "a2_aggregate_max" ->
      "SELECT *, greatest(l_quantity, l_discount, l_tax) AS max_val FROM lineitem",
    "a3_groupby_slice" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY o_custkey ORDER BY o_totalprice DESC NULLS LAST, o_orderkey DESC NULLS LAST) AS rn
        |      FROM orders) WHERE rn <= 2""".stripMargin,
    "a5_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS INTEGER) AS grouping_id,
        |  sum(l_quantity) AS sum_qty, count(l_quantity) AS n, avg(l_quantity) AS avg_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "a5_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping_id(l_returnflag, l_linestatus) AS INTEGER) AS grouping_id,
        |  sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "a6_pivot" ->
      """SELECT l_returnflag,
        |  sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS "F",
        |  sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS "O"
        |FROM lineitem GROUP BY 1""".stripMargin,
    "a6_unpivot" ->
      """WITH p AS (
        |  SELECT l_returnflag,
        |    sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS f,
        |    sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS o
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'F' AS l_linestatus, f AS sum_qty FROM p
        |UNION ALL
        |SELECT l_returnflag, 'O' AS l_linestatus, o AS sum_qty FROM p""".stripMargin,
    "c1_rename" -> "SELECT n_nationkey, n_name AS nation_name, n_regionkey FROM nation",
    "c2_format_datetime" ->
      "SELECT o_orderkey, strptime(strftime(o_orderdate, '%d-%m-%Y'), '%d-%m-%Y') AS od_str FROM orders",
    "c2_format_number" ->
      "SELECT l_orderkey, l_linenumber, CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty FROM lineitem",
    "c3_add_column" -> "SELECT r_regionkey, r_name, 'S001' AS study_code FROM region",
    "c4_attach_notnull" ->
      s"SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, big_total, big_total IS NOT NULL AS has_big FROM $nullBaseSql",
    "c5_attach_sumeq" ->
      """SELECT *, (SELECT coalesce(sum(l_quantity), 0) FROM lineitem) = (SELECT coalesce(sum(l_linenumber), 0) FROM lineitem) AS chk
        |FROM lineitem""".stripMargin,
    "c6_attach_null" ->
      s"""SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, big_total,
         |       CASE WHEN big_total IS NULL THEN 'NONE' ELSE c_mktsegment END AS seg2
         |FROM $nullBaseSql""".stripMargin,
    "c7_decision_when" ->
      """SELECT *, CASE o_orderpriority WHEN '1-URGENT' THEN 'U' WHEN '2-HIGH' THEN 'H' WHEN '3-MEDIUM' THEN 'M' END AS prio_code
        |FROM orders""".stripMargin,
    "c7_decision_join" ->
      """SELECT *, CASE o_orderpriority WHEN '1-URGENT' THEN 'U' WHEN '2-HIGH' THEN 'H' WHEN '3-MEDIUM' THEN 'M' END AS prio_code
        |FROM orders""".stripMargin,
    "c8_concat_key" ->
      "SELECT *, concat_ws('#', c_mktsegment, c_name) AS subject_hierarchy FROM customer",
    "r1_bind_rows" ->
      """SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS r_regionkey, CAST(NULL AS VARCHAR) AS r_name FROM nation
        |UNION ALL
        |SELECT CAST(NULL AS INTEGER), CAST(NULL AS VARCHAR), r_regionkey, r_name FROM region""".stripMargin,
    "r2_sort_dataset" -> "SELECT * FROM region ORDER BY r_name DESC NULLS LAST",
    "r3_remove_rows" ->
      s"SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, big_total FROM $nullBaseSql WHERE big_total IS NOT NULL",
    "r5_intersect" ->
      """SELECT * FROM nation WHERE n_nationkey < 15
        |INTERSECT SELECT * FROM nation WHERE n_nationkey >= 10""".stripMargin,
    "r5_except" ->
      """SELECT * FROM nation WHERE n_nationkey < 15
        |EXCEPT SELECT * FROM nation WHERE n_nationkey >= 10""".stripMargin,
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
    "dedup_exact" ->
      s"""SELECT doc_id, text, lang, source, n_chars
         |FROM (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM $doubledDocsSql)
         |WHERE rn = 1""".stripMargin,
    "dedup_exact_stats" ->
      s"SELECT md5(text) AS content_md5, count(*) AS n_copies, min(doc_id) AS keep_id FROM $doubledDocsSql GROUP BY 1",
    "dedup_incremental" ->
      """WITH batch AS (
        |  SELECT doc_id + 10000 AS doc_id,
        |    CASE WHEN (doc_id + 10000) % 2 = 1 THEN text || ' fresh' ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id, text FROM batch
        |WHERE md5(text) NOT IN (SELECT md5(text) FROM documents)""".stripMargin,
    "dedup_minhash_pairs" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
        |       FROM toks)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.5""".stripMargin,
    "dedup_jaccard_audit" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
        |       FROM toks)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.3""".stripMargin,
    // cluster-aware split replay: the dedup_clusters recursive
    // reachability walk for the representative, then the
    // sample_hash_split bucket rule on COALESCE(cluster, own id)
    "sample_cluster_split" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
        |       FROM toks),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.3),
        |edges AS (SELECT id_a AS s, id_b AS t FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |walk(v, r) AS (
        |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t0
        |  UNION
        |  SELECT e.t, w.r FROM walk w JOIN edges e ON e.s = w.v),
        |cc AS (SELECT v AS doc_id, min(r) AS cluster_id FROM walk GROUP BY 1),
        |keyed AS (SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS split_key
        |          FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id)
        |SELECT doc_id, split_key,
        |  CASE WHEN CAST(concat('0x', substr(md5(CAST(split_key AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 5 THEN 'val'
        |       WHEN CAST(concat('0x', substr(md5(CAST(split_key AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10 THEN 'test'
        |       ELSE 'train' END AS split
        |FROM keyed""".stripMargin,
    // cluster-size histogram replay: CC walk at the 0.5 near-dup
    // threshold, plus the singleton row from the corpus complement
    "dedup_cluster_sizes" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
        |       FROM toks),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
        |edges AS (SELECT id_a AS s, id_b AS t FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |walk(v, r) AS (
        |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t0
        |  UNION
        |  SELECT e.t, w.r FROM walk w JOIN edges e ON e.s = w.v),
        |cc AS (SELECT v AS doc_id, min(r) AS cluster_id FROM walk GROUP BY 1),
        |sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY 1),
        |hist AS (SELECT cluster_size, count(*) AS n_clusters FROM sizes GROUP BY 1),
        |single AS (SELECT CAST(1 AS BIGINT) AS cluster_size,
        |                  (SELECT count(*) FROM documents) - (SELECT count(*) FROM cc) AS n_clusters)
        |SELECT cluster_size, CAST(SUM(n_clusters) AS BIGINT) AS n_clusters
        |FROM (SELECT * FROM hist UNION ALL SELECT * FROM single WHERE n_clusters > 0)
        |GROUP BY 1""".stripMargin,
    // triangle census replay: the same a<b<c oriented two-join over
    // the 0.3 jaccard pair list
    "dedup_graph_triangles" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
        |       FROM toks),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.3),
        |v AS (SELECT count(DISTINCT x) AS n_vertices FROM
        |        (SELECT id_a AS x FROM pairs UNION ALL SELECT id_b FROM pairs)),
        |ne AS (SELECT count(*) AS n_edges FROM pairs),
        |tri AS (SELECT count(*) AS n_triangles FROM pairs e1
        |        JOIN pairs e2 ON e1.id_b = e2.id_a
        |        JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b)
        |SELECT v.n_vertices, ne.n_edges, tri.n_triangles FROM v, ne, tri""".stripMargin,
    // incremental near-dedup replay: exact shingle jaccard (the
    // corpus-assumption spec pins LSH == exact at gate scales), batch
    // vs store first, then keep-lowest among the store-survivors
    "dedup_incremental_near" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
        |       FROM toks),
        |storedrop AS (
        |  SELECT DISTINCT a.doc_id
        |  FROM sh a JOIN sh b ON a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
        |surv AS (
        |  SELECT doc_id FROM documents
        |  WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT doc_id FROM storedrop)),
        |batchdrop AS (
        |  SELECT DISTINCT b.doc_id
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE a.doc_id IN (SELECT doc_id FROM surv)
        |    AND b.doc_id IN (SELECT doc_id FROM surv)
        |    AND CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.5)
        |SELECT * FROM documents
        |WHERE doc_id IN (SELECT doc_id FROM surv)
        |  AND doc_id NOT IN (SELECT doc_id FROM batchdrop)""".stripMargin,
    // leakage replay: the jaccard-audit pair CTE, each side's split
    // recomputed from its id by the sample_hash_split bucket rule
    "split_leakage_audit" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
        |       FROM toks),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) AS jaccard
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.3),
        |lab AS (
        |  SELECT id_a, id_b, jaccard,
        |    CASE WHEN CAST(concat('0x', substr(md5(CAST(id_a AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 5 THEN 'val'
        |         WHEN CAST(concat('0x', substr(md5(CAST(id_a AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10 THEN 'test'
        |         ELSE 'train' END AS split_a,
        |    CASE WHEN CAST(concat('0x', substr(md5(CAST(id_b AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 5 THEN 'val'
        |         WHEN CAST(concat('0x', substr(md5(CAST(id_b AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10 THEN 'test'
        |         ELSE 'train' END AS split_b
        |  FROM pairs)
        |SELECT * FROM lab WHERE split_a <> split_b""".stripMargin,
    "er_pairs" ->
      """SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        |       a.c_name AS name_a, b.c_name AS name_b,
        |       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS dist
        |FROM customer a JOIN customer b
        |  ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
        | AND a.c_custkey < b.c_custkey
        |WHERE levenshtein(a.c_name, b.c_name) <= 2""".stripMargin,
    "er_groups" ->
      """WITH RECURSIVE pairs AS (
        |  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        |  FROM customer a JOIN customer b
        |    ON a.c_nationkey = b.c_nationkey AND a.c_mktsegment = b.c_mktsegment
        |   AND a.c_custkey < b.c_custkey
        |  WHERE levenshtein(a.c_name, b.c_name) <= 2),
        |edges AS (SELECT id_a AS s, id_b AS t FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |walk(v, r) AS (
        |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t0
        |  UNION
        |  SELECT e.t, w.r FROM walk w JOIN edges e ON e.s = w.v)
        |SELECT v AS doc_id, min(r) AS cluster_id FROM walk GROUP BY 1""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
        |       FROM toks),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.3),
        |edges AS (SELECT id_a AS s, id_b AS t FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |walk(v, r) AS (
        |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t0
        |  UNION
        |  SELECT e.t, w.r FROM walk w JOIN edges e ON e.s = w.v)
        |SELECT v AS doc_id, min(r) AS cluster_id FROM walk GROUP BY 1""".stripMargin,
    "dedup_kgram_coverage" ->
      """WITH pos AS (
        |  SELECT doc_id, g.i AS pos, substr(text, g.i, 30) AS gram
        |  FROM documents,
        |       LATERAL (SELECT unnest(generate_series(1, len(text) - 29)) AS i) g),
        |dup AS (SELECT gram FROM pos GROUP BY gram HAVING count(DISTINCT doc_id) >= 2)
        |SELECT p.doc_id, count(*) AS n_grams,
        |       count(CASE WHEN d.gram IS NOT NULL THEN 1 END) AS dup_grams,
        |       count(CASE WHEN d.gram IS NOT NULL THEN 1 END) / CAST(count(*) AS DOUBLE) AS dup_frac
        |FROM pos p LEFT JOIN dup d USING (gram)
        |GROUP BY 1""".stripMargin,
    "dedup_kgram_pairs" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, substr(text, i.i, 30) AS gram
        |  FROM documents,
        |       LATERAL (SELECT unnest(generate_series(1, len(text) - 29)) AS i) i)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_grams
        |FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |GROUP BY 1, 2""".stripMargin,
    // CDC chunk replay: same boundary rule (md5-prefix hash of the
    // word, % 8), boundary word ends its chunk; the window-sum of
    // boundary flags over STRICTLY preceding words is the chunk index
    "dedup_cdc_chunks" ->
      (cdcChunksCte +
        """SELECT md5(chunk) AS chunk_md5,
          |       count(DISTINCT doc_id) AS n_docs,
          |       count(*) AS n_occurrences,
          |       max(n_words) AS n_words
          |FROM chunks GROUP BY 1 HAVING count(*) >= 2""".stripMargin),
    "dedup_cdc_coverage" ->
      (cdcChunksCte +
        """, ch AS (SELECT doc_id, md5(chunk) AS h, n_words FROM chunks),
          |dup AS (SELECT h FROM ch GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
          |per AS (
          |  SELECT ch.doc_id,
          |         CAST(count(*) AS BIGINT) AS n_chunks,
          |         CAST(count(CASE WHEN d.h IS NOT NULL THEN 1 END) AS BIGINT) AS dup_chunks,
          |         CAST(sum(ch.n_words) AS BIGINT) AS n_words,
          |         CAST(COALESCE(sum(CASE WHEN d.h IS NOT NULL THEN ch.n_words END), 0) AS BIGINT) AS dup_words
          |  FROM ch LEFT JOIN dup d ON ch.h = d.h GROUP BY 1)
          |SELECT doc.doc_id,
          |       COALESCE(p.n_chunks, 0) AS n_chunks,
          |       COALESCE(p.dup_chunks, 0) AS dup_chunks,
          |       COALESCE(p.n_words, 0) AS n_words,
          |       COALESCE(p.dup_words, 0) AS dup_words,
          |       COALESCE(CAST(p.dup_words AS DOUBLE) / p.n_words, 0.0) AS dup_word_frac
          |FROM documents doc LEFT JOIN per p ON doc.doc_id = p.doc_id""".stripMargin),
    "dedup_novelty_curve" ->
      """WITH firsts AS (
        |  SELECT md5(text) AS d, min(doc_id) AS first_id FROM documents GROUP BY 1),
        |nov AS (SELECT first_id // 50 AS bucket, count(*) AS n_novel FROM firsts GROUP BY 1),
        |tot AS (SELECT doc_id // 50 AS bucket, count(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT t.bucket, t.n_docs, COALESCE(n.n_novel, 0) AS n_novel,
        |       COALESCE(n.n_novel, 0) / CAST(t.n_docs AS DOUBLE) AS novel_frac
        |FROM tot t LEFT JOIN nov n ON t.bucket = n.bucket""".stripMargin,
    "dedup_near_keep" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
        |       FROM toks),
        |drops AS (SELECT DISTINCT b.doc_id AS id_b
        |          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.5)
        |SELECT * FROM documents WHERE doc_id NOT IN (SELECT id_b FROM drops)""".stripMargin,
    "sim_cosine_topk" ->
      """WITH probe AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |       list_inner_product(embedding::DOUBLE[], p) /
        |         (sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) * sqrt(list_inner_product(p, p))) AS sim
        |FROM embeddings, probe
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin,
    "sim_knn_join" ->
      """WITH p AS (SELECT vec_id AS probe_id, embedding::DOUBLE[] AS pv FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT p.probe_id, e.vec_id AS neighbor_id,
        |        list_inner_product(e.embedding::DOUBLE[], p.pv) /
        |          (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_inner_product(p.pv, p.pv))) AS sim
        |      FROM embeddings e, p)
        |SELECT probe_id, neighbor_id, sim, rank FROM (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank FROM s)
        |WHERE rank <= 5""".stripMargin,
    "text_stats" ->
      """SELECT doc_id, text, lang, source, n_chars,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars_calc,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens
        |FROM documents""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(regexp_replace(nfc_normalize(text),
        |    '[\t\r\n]+', ' ', 'g'), '[\p{Cc}\p{Cf}]', '', 'g'), ' +', ' ', 'g')) AS clean_text,
        |  CAST(length(trim(regexp_replace(regexp_replace(regexp_replace(nfc_normalize(text),
        |    '[\t\r\n]+', ' ', 'g'), '[\p{Cc}\p{Cf}]', '', 'g'), ' +', ' ', 'g'))) AS INTEGER) AS n_chars_clean,
        |  trim(regexp_replace(regexp_replace(regexp_replace(nfc_normalize(text),
        |    '[\t\r\n]+', ' ', 'g'), '[\p{Cc}\p{Cf}]', '', 'g'), ' +', ' ', 'g')) <> text AS changed
        |FROM documents""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS ttr,
        |  (CAST(length(text) AS DOUBLE) - len(string_split(text, ' ')) + 1.0) / len(string_split(text, ' ')) AS mean_token_len,
        |  CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['the', 'a'], t))) AS DOUBLE) / len(string_split(text, ' ')) AS stopword_ratio,
        |  (CAST(length(text) AS DOUBLE) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))) / CAST(length(text) AS DOUBLE) AS punct_ratio
        |FROM documents""".stripMargin,
    "text_langid" ->
      """WITH scored AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['the', 'a'], t))) AS INTEGER) AS score_en,
        |    CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['table', 'query', 'row'], t))) AS INTEGER) AS score_db,
        |    CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['spark', 'vector', 'stream'], t))) AS INTEGER) AS score_sys
        |  FROM documents)
        |SELECT doc_id, score_en, score_db, score_sys,
        |  CASE WHEN score_en >= score_db AND score_en >= score_sys THEN 'en'
        |       WHEN score_db >= score_sys THEN 'db' ELSE 'sys' END AS lang_pred
        |FROM scored""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_fingerprint
        |FROM documents""".stripMargin,
    "mm_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes, sha256(text) AS content_sha256
        |FROM documents""".stripMargin,
    "mm_chunks" ->
      """SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx, substr(text, CAST(i * 100 + 1 AS INTEGER), 100) AS chunk_str
        |FROM (SELECT doc_id, text,
        |        unnest(generate_series(0, CAST(ceil(length(text) / 100.0) AS BIGINT) - 1)) AS i
        |      FROM documents)""".stripMargin,
    "text_tokens_bpe" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '[^\p{L}\p{N}]+'), t -> length(t) > 0)) AS INTEGER) AS n_bpe_tokens
        |FROM documents""".stripMargin,
    "text_pii_scan" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(text, 'https?://[A-Za-z0-9./_%?&=-]+')) AS INTEGER) AS n_urls
        |FROM documents""".stripMargin,
    // bit-for-bit replay of ZOrder.zkey's interleave: col i's bit b
    // lands at global bit b*2 + i; low 16 bits of each dimension
    "zorder_key" ->
      """SELECT event_id, user_id,
        |  CAST(list_aggregate(list_transform(generate_series(0, 15),
        |         b -> ((((user_id & 65535) >> b) & 1) << (2*b))), 'sum')
        |     + list_aggregate(list_transform(generate_series(0, 15),
        |         b -> ((((event_id & 65535) >> b) & 1) << (2*b + 1))), 'sum') AS BIGINT) AS zkey
        |FROM events""".stripMargin,
    "skew_salted_join" ->
      """SELECT o.o_custkey, o.o_orderkey, o.o_orderstatus, o.o_totalprice, o.o_orderdate, o.o_orderpriority,
        |       c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    "bloom_prefilter_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_totalprice
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_totalprice > 400000""".stripMargin,
    "s11_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "s12_orc_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "s14_avro_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "text_vocabulary" ->
      """SELECT t AS token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |GROUP BY 1""".stripMargin,
    // word-2-gram construction mirrors Dedup.shingles: len(w)-1
    // positional grams, whole text as one gram for <2-word docs
    "text_repetition" ->
      """WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS gram
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 2)
        |  UNION ALL
        |  SELECT doc_id, text AS gram FROM toks WHERE len(w) < 2),
        |cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_gram_frac,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_gram_frac
        |FROM cnt GROUP BY 1""".stripMargin,
    // same shingle/jaccard CTE as dedup_jaccard_audit; banding is one
    // IEEE multiply + floor so the same double lands in the same band
    "dedup_threshold_curve" -> thresholdCurveSql,
    // IDENTICAL oracle by design: the sf0.01 corpus's hottest shingle
    // df is 7, below the query's cap of 16, so the capped curve must
    // hash-match the uncapped one — the gate IS the capped==uncapped
    // pin the cap's no-op contract claims
    "dedup_threshold_curve_capped" -> thresholdCurveSql,
    // the gopher verdict CTE (stop list ['the','a']) -> md5 keep-first
    // -> per-source stage counts
    "curation_funnel" ->
      s"""WITH base AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS w, string_split(text, chr(10)) AS l
        |  FROM $doubledDocsSql),
        |m AS (
        |  SELECT doc_id, source, text,
        |    CAST(len(w) AS INTEGER) AS n_words,
        |    CAST(list_aggregate(list_transform(w, t -> length(t)), 'sum') AS DOUBLE) / len(w) AS mean_word_len,
        |    CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(w) AS frac_alpha_words,
        |    (CAST(length(text) - length(regexp_replace(text, '#', '', 'g')) AS DOUBLE)
        |      + (length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3) / len(w) AS symbol_ratio,
        |    CAST(len(list_filter(l, x -> substr(x, 1, 1) IN ('-', '*', '•'))) AS DOUBLE) / len(l) AS frac_bullet_lines,
        |    CAST(len(list_filter(l, x -> ends_with(x, '...') OR ends_with(x, '…'))) AS DOUBLE) / len(l) AS frac_ellipsis_lines,
        |    CAST(len(list_filter(list_distinct(list_transform(w, t -> lower(t))),
        |      t -> list_contains(['the','a'], t))) AS INTEGER) AS n_stop
        |  FROM base),
        |v AS (SELECT doc_id, source, text,
        |        (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |         AND symbol_ratio <= 0.1 AND frac_bullet_lines <= 0.9 AND frac_ellipsis_lines <= 0.3
        |         AND frac_alpha_words > 0.8 AND n_stop >= 2) AS p
        |      FROM m),
        |keep AS (SELECT min(doc_id) AS kid FROM v WHERE p GROUP BY md5(text)),
        |k AS (SELECT source, CAST(count(*) AS BIGINT) AS n_kept_unique
        |      FROM v WHERE p AND doc_id IN (SELECT kid FROM keep) GROUP BY 1),
        |agg AS (SELECT source, count(*) AS n_docs,
        |          CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_rules
        |        FROM v GROUP BY 1)
        |SELECT agg.source, agg.n_docs, agg.n_pass_rules,
        |  COALESCE(k.n_kept_unique, 0) AS n_kept_unique,
        |  CAST(agg.n_pass_rules AS DOUBLE) / agg.n_docs AS pass_frac,
        |  CAST(COALESCE(k.n_kept_unique, 0) AS DOUBLE) / agg.n_docs AS keep_frac
        |FROM agg LEFT JOIN k USING (source)""".stripMargin,
    "doc_length_outliers" ->
      """WITH c AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |m AS (SELECT source, quantile_cont(n_tokens, 0.5) AS med FROM c GROUP BY 1),
        |d AS (SELECT c.doc_id, c.source, c.n_tokens, m.med,
        |    abs(c.n_tokens - m.med) AS dev
        |  FROM c JOIN m USING (source)),
        |md AS (SELECT source, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.doc_id, d.source, d.n_tokens,
        |       d.med AS median, md.mad AS mad,
        |       d.dev * 2 > md.mad * 7 AS is_outlier
        |FROM d JOIN md USING (source)""".stripMargin,
    // pair enumeration replayed as position × bounded-offset unnest;
    // same exact-factor lift as colloc_lift_topk
    "text_skipgram_lift" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
        |pos AS (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        |        FROM tk WHERE len(t) >= 2),
        |pairs AS (SELECT t[i] AS w1, t[i + g.d] AS w2
        |          FROM pos, LATERAL (SELECT unnest(generate_series(1, least(3, len(t) - i))) AS d) g),
        |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
        |       FROM pairs GROUP BY 1, 2 HAVING count(*) >= 3),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w
        |        FROM (SELECT unnest(t) AS w FROM tk) GROUP BY 1),
        |tot AS (SELECT CAST(sum(len(t)) AS BIGINT) AS n_tokens FROM tk)
        |SELECT p.w1, p.w2, p.n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2, tot.n_tokens,
        |  CAST(p.n_pair * tot.n_tokens AS DOUBLE) / (u1.n_w * u2.n_w) AS lift
        |FROM pc p
        |JOIN uni u1 ON u1.w = p.w1
        |JOIN uni u2 ON u2.w = p.w2, tot
        |ORDER BY lift DESC, w1, w2 LIMIT 20""".stripMargin,
    // gate replay: gopher verdict -> NOT EXISTS bench 5-gram ->
    // keep-first per normalized-content fingerprint (ts order ==
    // doc_id order under the fabricated timestamps) -> md5 anti-join
    "w6_curation_gate_twin" ->
      """WITH base AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS w, string_split(text, chr(10)) AS l
        |  FROM documents WHERE doc_id % 19 <> 3),
        |m AS (
        |  SELECT doc_id, source, text,
        |    CAST(len(w) AS INTEGER) AS n_words,
        |    CAST(list_aggregate(list_transform(w, t -> length(t)), 'sum') AS DOUBLE) / len(w) AS mean_word_len,
        |    CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(w) AS frac_alpha_words,
        |    (CAST(length(text) - length(regexp_replace(text, '#', '', 'g')) AS DOUBLE)
        |      + (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) / 3) / len(w) AS symbol_ratio,
        |    CAST(len(list_filter(l, x -> substr(x, 1, 1) IN ('-', '*', '•'))) AS DOUBLE) / len(l) AS frac_bullet_lines,
        |    CAST(len(list_filter(l, x -> ends_with(x, '...') OR ends_with(x, '…'))) AS DOUBLE) / len(l) AS frac_ellipsis_lines,
        |    CAST(len(list_filter(list_distinct(list_transform(w, t -> lower(t))),
        |      t -> list_contains(['the','a'], t))) AS INTEGER) AS n_stop
        |  FROM base),
        |q AS (SELECT doc_id, source, text FROM m
        |      WHERE n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |        AND symbol_ratio <= 0.1 AND frac_bullet_lines <= 0.9 AND frac_ellipsis_lines <= 0.3
        |        AND frac_alpha_words > 0.8 AND n_stop >= 2),
        |allg AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS gram
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i
        |        FROM allg WHERE len(w) >= 5)
        |  UNION ALL
        |  SELECT doc_id, text AS gram FROM allg WHERE len(w) < 5),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 19 = 3),
        |dec AS (SELECT q.* FROM q WHERE NOT EXISTS (
        |    SELECT 1 FROM g WHERE g.doc_id = q.doc_id AND g.gram IN (SELECT gram FROM bench))),
        |fp AS (SELECT *, md5(trim(regexp_replace(regexp_replace(lower(text),
        |         '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS f FROM dec),
        |kept AS (SELECT doc_id, source, text FROM (
        |    SELECT *, row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn FROM fp)
        |  WHERE rn = 1)
        |SELECT doc_id, source FROM kept
        |WHERE md5(text) NOT IN (SELECT md5(text) FROM documents WHERE doc_id % 23 = 5)""".stripMargin,
    // stage-by-stage replay: gopher verdict (stop list the,a) ->
    // blocklist NOT-overlap -> keep-first per md5 -> hash-bucket split
    "pipeline_curation_config" ->
      s"""WITH base AS (
        |  SELECT doc_id, source, text, string_split(text, ' ') AS w, string_split(text, chr(10)) AS l
        |  FROM $doubledDocsSql),
        |m AS (
        |  SELECT doc_id, source, text, w,
        |    CAST(len(w) AS INTEGER) AS n_words,
        |    CAST(list_aggregate(list_transform(w, t -> length(t)), 'sum') AS DOUBLE) / len(w) AS mean_word_len,
        |    CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(w) AS frac_alpha_words,
        |    (CAST(length(text) - length(regexp_replace(text, '#', '', 'g')) AS DOUBLE)
        |      + (length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3) / len(w) AS symbol_ratio,
        |    CAST(len(list_filter(l, x -> substr(x, 1, 1) IN ('-', '*', '•'))) AS DOUBLE) / len(l) AS frac_bullet_lines,
        |    CAST(len(list_filter(l, x -> ends_with(x, '...') OR ends_with(x, '…'))) AS DOUBLE) / len(l) AS frac_ellipsis_lines,
        |    CAST(len(list_filter(list_distinct(list_transform(w, t -> lower(t))),
        |      t -> list_contains(['the','a'], t))) AS INTEGER) AS n_stop
        |  FROM base),
        |q AS (SELECT doc_id, source, text, w FROM m
        |      WHERE n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |        AND symbol_ratio <= 0.1 AND frac_bullet_lines <= 0.9 AND frac_ellipsis_lines <= 0.3
        |        AND frac_alpha_words > 0.8 AND n_stop >= 2),
        |bl AS (SELECT doc_id, source, text FROM q
        |       WHERE NOT len(list_filter(list_transform(w, t -> lower(t)),
        |         t -> list_contains(['slow'], t))) > 0),
        |dd AS (SELECT doc_id, source FROM (
        |    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM bl)
        |  WHERE rn = 1)
        |SELECT doc_id, source,
        |  CASE WHEN b < 5 THEN 'val' WHEN b < 10 THEN 'test' ELSE 'train' END AS split
        |FROM (SELECT doc_id, source,
        |        CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
        |      FROM dd)""".stripMargin,
    // v2 recipe replay: PII redact (identity on this corpus, but the
    // regexes run on both engines) -> semantic filter (exact cosine
    // vs the 10 bench vectors, survivors have max_sim < 0.35) ->
    // keep-best near-dedup (recursive-CTE components, ttr-desc rank)
    "pipeline_curation_v2" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT d.doc_id, d.source, d.text AS t0, e.embedding::DOUBLE[] AS cv,
        |    CAST(len(list_distinct(string_split(d.text, ' '))) AS DOUBLE)
        |      / len(string_split(d.text, ' ')) AS ttr
        |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
        |  WHERE d.doc_id >= 10),
        |red AS (
        |  SELECT doc_id, source, cv, ttr,
        |    regexp_replace(
        |      regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
        |      'https?://[A-Za-z0-9./_%?&=-]+', '<URL>', 'g') AS text
        |  FROM corpus),
        |b AS (SELECT embedding::DOUBLE[] AS bv FROM embeddings WHERE vec_id < 10),
        |sim AS (SELECT r.doc_id,
        |          max(list_inner_product(r.cv, b.bv) /
        |            (sqrt(list_inner_product(r.cv, r.cv)) * sqrt(list_inner_product(b.bv, b.bv)))) AS max_sim
        |        FROM red r, b GROUP BY 1),
        |dec AS (SELECT r.doc_id, r.source, r.ttr, r.text FROM red r JOIN sim USING (doc_id)
        |        WHERE max_sim < 0.35),
        |toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM dec),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
        |       FROM toks),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b2.doc_id AS id_b
        |  FROM sh a JOIN sh b2 ON a.doc_id < b2.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b2.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b2.s))) >= 0.5),
        |edges AS (SELECT id_a AS s, id_b AS t FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |walk(v, r) AS (
        |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t0
        |  UNION
        |  SELECT e.t, w.r FROM walk w JOIN edges e ON e.s = w.v),
        |cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM walk GROUP BY 1),
        |ranked AS (SELECT c.doc_id,
        |             row_number() OVER (PARTITION BY c.cluster_id
        |               ORDER BY d.ttr DESC, c.doc_id) AS rn
        |           FROM cl c JOIN dec d USING (doc_id))
        |SELECT d.doc_id, d.source, d.ttr FROM dec d
        |WHERE d.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)""".stripMargin,
    // the weight total is an ORDERED full-frame window sum (by
    // source), so both engines add in the same sequence — a plain
    // aggregate's combine order would be partition-dependent
    "mixture_temperature" ->
      """WITH c AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |           FROM documents GROUP BY 1),
        |w AS (SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS weight FROM c)
        |SELECT source, n_tokens, weight,
        |  weight / sum(weight) OVER (ORDER BY source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS prob,
        |  (weight / sum(weight) OVER (ORDER BY source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
        |  / (CAST(n_tokens AS DOUBLE) / CAST(sum(n_tokens) OVER (ORDER BY source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE)) AS upsample_factor
        |FROM w""".stripMargin,
    "text_blocklist" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(list_transform(w, t -> lower(t)),
        |    t -> list_contains(['slow','junk','big'], t))) AS INTEGER) AS n_blocklist_hits,
        |  CAST(len(list_filter(list_distinct(list_transform(w, t -> lower(t))),
        |    t -> list_contains(['slow','junk','big'], t))) AS INTEGER) AS n_blocklist_terms,
        |  CAST(len(list_filter(list_transform(w, t -> lower(t)),
        |    t -> list_contains(['slow','junk','big'], t))) AS DOUBLE) / len(w) AS frac_blocklist,
        |  len(list_filter(list_transform(w, t -> lower(t)),
        |    t -> list_contains(['slow','junk','big'], t))) > 0 AS flagged
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)""".stripMargin,
    // fixed-point per-token terms (floor(c·ln(c)·1e6 + ½) as BIGINT)
    // integer-sum across partitions; the entropy assembly is the same
    // 3 IEEE ops on both engines
    "text_entropy" ->
      """WITH c AS (
        |  SELECT doc_id, t, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  GROUP BY 1, 2),
        |a AS (
        |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS INTEGER) AS n_distinct,
        |    CAST(sum(CAST(floor(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000 + 0.5)
        |      AS BIGINT)) AS BIGINT) AS sum_clnc_fp
        |  FROM c GROUP BY 1)
        |SELECT doc_id, n_tokens, n_distinct, sum_clnc_fp,
        |  (CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
        |    - CAST(sum_clnc_fp AS DOUBLE) / n_tokens) / 1000000.0 AS entropy_nats
        |FROM a""".stripMargin,
    "vocab_overlap_matrix" ->
      """WITH v AS (SELECT DISTINCT g, t FROM
        |       (SELECT source AS g, unnest(string_split(text, ' ')) AS t FROM documents)),
        |s AS (SELECT g, count(*) AS n FROM v GROUP BY 1),
        |sh AS (SELECT a.g AS source_a, b.g AS source_b, count(*) AS n_shared
        |       FROM v a JOIN v b ON a.t = b.t AND a.g < b.g GROUP BY 1, 2)
        |SELECT sa.g AS source_a, sb.g AS source_b, sa.n AS n_vocab_a, sb.n AS n_vocab_b,
        |  COALESCE(sh.n_shared, 0) AS n_shared,
        |  CAST(COALESCE(sh.n_shared, 0) AS DOUBLE)
        |    / (sa.n + sb.n - COALESCE(sh.n_shared, 0)) AS jaccard
        |FROM s sa JOIN s sb ON sa.g < sb.g
        |LEFT JOIN sh ON sh.source_a = sa.g AND sh.source_b = sb.g""".stripMargin,
    // every Gopher signal is integer counting + one IEEE division,
    // reproduced op-for-op (including the h + e/3 addition order)
    "text_gopher_rules" ->
      """WITH base AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS w, string_split(text, chr(10)) AS l
        |  FROM documents),
        |m AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS INTEGER) AS n_words,
        |    CAST(list_aggregate(list_transform(w, t -> length(t)), 'sum') AS DOUBLE) / len(w) AS mean_word_len,
        |    CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(w) AS frac_alpha_words,
        |    (CAST(length(text) - length(regexp_replace(text, '#', '', 'g')) AS DOUBLE)
        |      + (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) / 3) / len(w) AS symbol_ratio,
        |    CAST(len(list_filter(l, x -> substr(x, 1, 1) IN ('-', '*', '•'))) AS DOUBLE) / len(l) AS frac_bullet_lines,
        |    CAST(len(list_filter(l, x -> ends_with(x, '...') OR ends_with(x, '…'))) AS DOUBLE) / len(l) AS frac_ellipsis_lines,
        |    CAST(len(list_filter(list_distinct(list_transform(w, t -> lower(t))),
        |      t -> list_contains(['the','a'], t))) AS INTEGER) AS n_stopwords_present
        |  FROM base)
        |SELECT *,
        |  (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |   AND symbol_ratio <= 0.1 AND frac_bullet_lines <= 0.9 AND frac_ellipsis_lines <= 0.3
        |   AND frac_alpha_words > 0.8 AND n_stopwords_present >= 2) AS passes_gopher
        |FROM m""".stripMargin,
    // window starts 0, 16, 32, … while inside the doc; slice bounds
    // are 1-based inclusive on both engines and clamp at the tail
    "text_token_windows" ->
      """SELECT doc_id, CAST(i AS INTEGER) AS win_idx,
        |  array_to_string(w[i*16+1 : i*16+32], ' ') AS win_text,
        |  CAST(len(w[i*16+1 : i*16+32]) AS INTEGER) AS n_win_tokens
        |FROM (SELECT doc_id, w, unnest(generate_series(0, (len(w)-1)//16)) AS i
        |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))""".stripMargin,
    // replays the greedy merge loop as a recursive CTE carrying the
    // PARTS LIST as state. The `it < 90` recursion cap merges one
    // occurrence per round, so a single word needing >90 merges would
    // silently keep partial state — impossible here (corpus words are
    // <=15 chars and every merge consumes >=1 char, so <=15 rounds),
    // but a longer-word corpus must raise the cap with the word
    // length. Each round finds the lowest-rank merge
    // whose pair is adjacent anywhere and merges its LEFTMOST
    // occurrence via list slicing. One-merge-per-round leftmost-first
    // is exactly canonical L2R-non-overlap merging — including
    // self-pairs like (a,a), where string replace() tricks consume
    // shared boundaries and mis-merge runs of 6+ (verified: this form
    // gives [aa,aa,aa] for 'aaaaaa', matching BpeEncode.encode).
    // Cross-pair ordering is safe because a well-formed table ranks a
    // pair consuming a merged token after the merge that created it.
    // Merge rows interpolate from the SAME bpeMerges value the query
    // uses, so the two sides cannot drift.
    "text_bpe_encode" ->
      s"""WITH RECURSIVE m(rank, a, b) AS (
         |  SELECT * FROM (VALUES ${bpeMerges.zipWithIndex
            .map { case ((a, b), i) => s"($i, '$a', '$b')" }.mkString(", ")}) v),
         |ws AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
         |wx AS (SELECT doc_id, i, w[i] AS word
         |       FROM ws, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) g),
         |enc(doc_id, i, p, it) AS (
         |  SELECT doc_id, i,
         |    list_transform(generate_series(1, length(word)), j -> word[j]), 0
         |  FROM wx
         |  UNION ALL
         |  SELECT doc_id, i,
         |    p[1:pos.j - 1] || [p[pos.j] || p[pos.j + 1]] || p[pos.j + 2:], it + 1
         |  FROM enc,
         |    LATERAL (SELECT a, b FROM m
         |             WHERE len(list_filter(generate_series(1, len(p) - 1),
         |                                   j -> p[j] = m.a AND p[j + 1] = m.b)) > 0
         |             ORDER BY rank LIMIT 1) best,
         |    LATERAL (SELECT min(j) AS j
         |             FROM (SELECT unnest(generate_series(1, len(p) - 1)) AS j) t
         |             WHERE p[j] = best.a AND p[j + 1] = best.b) pos
         |  WHERE it < 90),
         |fin AS (SELECT doc_id, i, p FROM (
         |  SELECT doc_id, i, p, row_number() OVER (PARTITION BY doc_id, i ORDER BY it DESC) AS rn
         |  FROM enc) WHERE rn = 1),
         |cnt AS (SELECT doc_id, CAST(SUM(len(p)) AS INTEGER) AS n_bpe
         |FROM fin GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(len(string_split(d.text, ' ')) AS INTEGER) AS n_tokens_ws,
         |  c.n_bpe AS n_tokens_bpe,
         |  CAST(c.n_bpe AS DOUBLE) / len(string_split(d.text, ' ')) AS fertility
         |FROM documents d JOIN cnt c USING (doc_id)""".stripMargin,
    // the same per-doc recursive-CTE BPE replay, rolled up per source
    "bpe_fertility_by_source" ->
      s"""WITH RECURSIVE m(rank, a, b) AS (
         |  SELECT * FROM (VALUES ${bpeMerges.zipWithIndex
            .map { case ((a, b), i) => s"($i, '$a', '$b')" }.mkString(", ")}) v),
         |ws AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
         |wx AS (SELECT doc_id, i, w[i] AS word
         |       FROM ws, LATERAL (SELECT unnest(generate_series(1, len(w))) AS i) g),
         |enc(doc_id, i, p, it) AS (
         |  SELECT doc_id, i,
         |    list_transform(generate_series(1, length(word)), j -> word[j]), 0
         |  FROM wx
         |  UNION ALL
         |  SELECT doc_id, i,
         |    p[1:pos.j - 1] || [p[pos.j] || p[pos.j + 1]] || p[pos.j + 2:], it + 1
         |  FROM enc,
         |    LATERAL (SELECT a, b FROM m
         |             WHERE len(list_filter(generate_series(1, len(p) - 1),
         |                                   j -> p[j] = m.a AND p[j + 1] = m.b)) > 0
         |             ORDER BY rank LIMIT 1) best,
         |    LATERAL (SELECT min(j) AS j
         |             FROM (SELECT unnest(generate_series(1, len(p) - 1)) AS j) t
         |             WHERE p[j] = best.a AND p[j + 1] = best.b) pos
         |  WHERE it < 90),
         |fin AS (SELECT doc_id, i, p FROM (
         |  SELECT doc_id, i, p, row_number() OVER (PARTITION BY doc_id, i ORDER BY it DESC) AS rn
         |  FROM enc) WHERE rn = 1),
         |cnt AS (SELECT doc_id, CAST(SUM(len(p)) AS INTEGER) AS n_bpe
         |FROM fin GROUP BY 1)
         |SELECT d.source, count(*) AS n_docs,
         |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS sum_tokens_ws,
         |  CAST(SUM(c.n_bpe) AS BIGINT) AS sum_tokens_bpe,
         |  CAST(SUM(c.n_bpe) AS DOUBLE) / SUM(len(string_split(d.text, ' '))) AS fertility
         |FROM documents d JOIN cnt c USING (doc_id)
         |GROUP BY 1""".stripMargin,
    // adjacent-pair counts; the ORDER BY is a total order (count desc,
    // pair asc) so LIMIT is deterministic in both engines
    "text_bpe_pairs" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
        |p AS (SELECT unnest(CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
        |                         ELSE list_transform(generate_series(1, len(t) - 1),
        |                                i -> concat_ws(' ', t[i], t[i+1])) END) AS pair
        |      FROM tk)
        |SELECT pair, count(*) AS n_pairs FROM p
        |GROUP BY 1 ORDER BY n_pairs DESC, pair ASC LIMIT 20""".stripMargin,
    "text_chunks" ->
      """SELECT doc_id, CAST(g.i // 80 AS INTEGER) AS chunk_idx,
        |  substr(text, CAST(g.i + 1 AS INTEGER), 120) AS chunk,
        |  CAST(length(substr(text, CAST(g.i + 1 AS INTEGER), 120)) AS INTEGER) AS n_chunk_chars
        |FROM documents,
        |     LATERAL (SELECT unnest(generate_series(0, greatest(len(text) - 1, 0), 80)) AS i) g""".stripMargin,
    // bigram-LM replay: same shingle rule (whole text as one "bigram"
    // for sub-2-token docs), fixed-point per-bigram logs -> integer
    // per-doc sums; explicit DOUBLE cast keeps the division IEEE
    "text_lm_score" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT doc_id,
        |         CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
        |              ELSE list_transform(generate_series(1, len(w) - 1),
        |                     i -> concat_ws(' ', w[i], w[i+1])) END AS gs
        |       FROM toks),
        |refbg AS (SELECT g AS bg, CAST(count(*) AS BIGINT) AS cb
        |          FROM (SELECT unnest(gs) AS g FROM bg WHERE doc_id % 4 = 0) GROUP BY 1),
        |refu AS (SELECT t AS w1, CAST(count(*) AS BIGINT) AS cu
        |         FROM (SELECT unnest(w) AS t FROM toks WHERE doc_id % 4 = 0) GROUP BY 1),
        |v AS (SELECT count(*) AS v FROM refu),
        |docg AS (SELECT doc_id, g AS bg, string_split(g, ' ')[1] AS w1
        |         FROM (SELECT doc_id, unnest(gs) AS g FROM bg)),
        |sc AS (SELECT doc_id,
        |         CAST(floor(ln(CAST(COALESCE(cb, 0) + 1 AS DOUBLE) / (COALESCE(cu, 0) + v.v))
        |              * 1000000.0 + 0.5) AS BIGINT) AS lp
        |       FROM docg LEFT JOIN refbg USING (bg) LEFT JOIN refu USING (w1) CROSS JOIN v)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
        |       CAST(sum(lp) AS BIGINT) AS logprob_sum_fp
        |FROM sc GROUP BY 1""".stripMargin,
    // novelty replay on RAW grams (the query joins xxhash64 keys; the
    // oracle's string join additionally pins zero collisions)
    "text_novelty" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(w) - 2),
        |                     i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) END AS s
        |       FROM toks),
        |sg AS (SELECT DISTINCT g FROM (SELECT unnest(s) AS g FROM sh WHERE doc_id % 5 != 0)),
        |dg AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 5 = 0)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_grams,
        |  CAST(sum(CASE WHEN g IN (SELECT g FROM sg) THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
        |  CAST(count(*) - sum(CASE WHEN g IN (SELECT g FROM sg) THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS novelty
        |FROM dg GROUP BY 1""".stripMargin,
    // 5-gram overlap replay: same shingle rule, bench = doc_id%19==3
    "decontam_overlap" ->
      """WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
        |g AS (
        |  SELECT doc_id, array_to_string(w[i:i+4], ' ') AS gram
        |  FROM (SELECT doc_id, w, unnest(generate_series(1, len(w) - 4)) AS i
        |        FROM toks WHERE len(w) >= 5)
        |  UNION ALL
        |  SELECT doc_id, text AS gram FROM toks WHERE len(w) < 5),
        |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 19 = 3),
        |tg AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 19 <> 3)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_grams,
        |  CAST(sum(CASE WHEN gram IN (SELECT gram FROM bench) THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        |  sum(CASE WHEN gram IN (SELECT gram FROM bench) THEN 1 ELSE 0 END) > 0 AS contaminated
        |FROM tg GROUP BY 1""".stripMargin,
    // cross-table exact jaccard (3-word shingles, short-doc rule):
    // all-pairs train x bench is oracle-side only — the query's
    // banded recall equals the exact >= 0.5 set by the
    // corpus-assumption spec
    "decontam_minhash" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(w) - 2),
        |                     i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) END AS s
        |       FROM toks),
        |pairs AS (SELECT t.doc_id AS train_id, b.doc_id AS bench_id,
        |            CAST(len(list_intersect(t.s, b.s)) AS DOUBLE)
        |              / len(list_distinct(list_concat(t.s, b.s))) AS jaccard
        |          FROM sh t JOIN sh b ON t.doc_id >= 25 AND b.doc_id < 25)
        |SELECT train_id, bench_id, jaccard FROM pairs WHERE jaccard >= 0.5""".stripMargin,
    // argmax replay: row_number(sim DESC, bench_id ASC) = Spark's
    // max(struct(sim, -bench_id)) — highest sim, lowest id on ties
    "decontam_semantic" ->
      """WITH b AS (SELECT vec_id AS bench_id, embedding::DOUBLE[] AS bv
        |           FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT e.vec_id, b.bench_id,
        |        list_inner_product(e.embedding::DOUBLE[], b.bv) /
        |          (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
        |           * sqrt(list_inner_product(b.bv, b.bv))) AS sim
        |      FROM embeddings e, b WHERE e.vec_id >= 10)
        |SELECT vec_id, bench_id AS nearest_bench_id, sim AS max_sim,
        |       sim >= 0.35 AS contaminated
        |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, bench_id) AS rn
        |      FROM s)
        |WHERE rn = 1""".stripMargin,
    "mine_contrastive_pairs" ->
      """WITH a AS (SELECT vec_id AS anchor_id, embedding::DOUBLE[] AS av
        |           FROM embeddings WHERE vec_id < 8),
        |s AS (SELECT a.anchor_id, e.vec_id AS pair_id,
        |        list_inner_product(e.embedding::DOUBLE[], a.av) /
        |          (sqrt(list_inner_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
        |           * sqrt(list_inner_product(a.av, a.av))) AS sim
        |      FROM embeddings e, a WHERE e.vec_id <> a.anchor_id),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id
        |        ORDER BY sim DESC, pair_id) AS INTEGER) AS rank FROM s)
        |SELECT anchor_id, pair_id,
        |       CASE WHEN rank <= 2 THEN 'pos' ELSE 'neg' END AS role, sim, rank
        |FROM r WHERE rank <= 2 OR rank BETWEEN 20 AND 24""".stripMargin,
    "range_attribution" ->
      """WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events WHERE event_type = 'click'),
        |     p AS (SELECT event_id AS purchase_id, user_id,
        |             ts - INTERVAL 1 HOUR AS win_start, ts AS win_end
        |           FROM events WHERE event_type = 'purchase')
        |SELECT c.click_id, c.user_id, c.ts, p.purchase_id, p.win_start, p.win_end
        |FROM c JOIN p ON c.user_id = p.user_id AND c.ts >= p.win_start AND c.ts <= p.win_end""".stripMargin,
    "asof_click_before_purchase" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'),
        |     r AS (SELECT event_id AS click_id, user_id, ts AS click_ts, value AS click_value
        |           FROM events WHERE event_type = 'click')
        |SELECT l.event_id, l.user_id, l.ts, l.value, r.click_id, r.click_ts, r.click_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.click_ts""".stripMargin,
    "asof_next_purchase_after_click" ->
      """WITH l AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
        |     r AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value AS purchase_value
        |           FROM events WHERE event_type = 'purchase')
        |SELECT l.event_id, l.user_id, l.ts, l.value, r.purchase_id, r.purchase_ts, r.purchase_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.purchase_ts""".stripMargin,
    "sample_hash_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 5 THEN 'val' WHEN b < 10 THEN 'test' ELSE 'train' END AS split
        |FROM (SELECT doc_id,
        |        CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS b
        |      FROM documents)""".stripMargin,
    "sample_hash_10pct" ->
      """SELECT * FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 < 10""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
        |      < CASE WHEN lang = 'en' THEN 10 ELSE 30 END""".stripMargin,
    "sample_domain_mixture" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |m AS (SELECT min(n_docs) AS n_min FROM c)
        |SELECT source, n_docs, sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS sample_rate
        |FROM c, m""".stripMargin,
    "sample_domain_balanced" ->
      """WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |m AS (SELECT min(n_docs) AS n_min FROM c),
        |r AS (SELECT source, sqrt(CAST(n_min AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS rate FROM c, m)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN r USING (source)
        |WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |      / 1152921504606846976.0 < r.rate OR r.rate >= 1.0""".stripMargin,
    "text_top_terms" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
        |dfq AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1)
        |SELECT doc_id, token, tf, df, rank FROM (
        |  SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
        |    CAST(row_number() OVER (PARTITION BY tf.doc_id
        |         ORDER BY tf.tf DESC, dfq.df ASC, tf.token ASC) AS INTEGER) AS rank
        |  FROM tf JOIN dfq USING (token))
        |WHERE rank <= 3""".stripMargin,
    "text_corpus_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  avg(CAST(len(string_split(text, ' ')) AS INTEGER)) AS mean_tokens,
        |  quantile_cont(CAST(len(string_split(text, ' ')) AS INTEGER), 0.5) AS median_tokens
        |FROM documents GROUP BY 1""".stripMargin,
    "corpus_datasheet" ->
      """SELECT count(*) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  count(DISTINCT lang) AS n_langs,
        |  count(DISTINCT source) AS n_sources,
        |  count(DISTINCT md5(text)) AS n_unique_texts,
        |  avg(CAST(len(string_split(text, ' ')) AS BIGINT)) AS mean_tokens,
        |  quantile_cont(CAST(len(string_split(text, ' ')) AS BIGINT), 0.5) AS median_tokens,
        |  CAST(max(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
        |  CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE) / count(*) AS dup_frac
        |FROM documents""".stripMargin,
    // sequence packing: same sharded window cumsum, integer `//`
    "pack_sequences" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 16 AS shard
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, n_tokens, shard,
        |    COALESCE(SUM(CAST(n_tokens AS BIGINT)) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM toks)
        |SELECT doc_id, n_tokens, shard,
        |  CAST(tokens_before // 2048 AS BIGINT) AS pack_id,
        |  CAST(tokens_before - (tokens_before // 2048) * 2048 AS BIGINT) AS pack_offset,
        |  (tokens_before - (tokens_before // 2048) * 2048 + n_tokens > 2048) AS spans_boundary
        |FROM cum""".stripMargin,
    "pack_manifest" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 16 AS shard
        |  FROM documents),
        |cum AS (
        |  SELECT doc_id, n_tokens, shard,
        |    COALESCE(SUM(CAST(n_tokens AS BIGINT)) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
        |  FROM toks)
        |SELECT shard, CAST(tokens_before // 2048 AS BIGINT) AS pack_id,
        |  count(*) AS n_docs,
        |  CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN tokens_before - (tokens_before // 2048) * 2048 + n_tokens > 2048
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
        |FROM cum GROUP BY 1, 2""".stripMargin,
    "pack_length_hist" ->
      """SELECT CASE WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
        |    WHEN n_tokens <= 256 THEN 256 WHEN n_tokens <= 512 THEN 512
        |    WHEN n_tokens <= 1024 THEN 1024 WHEN n_tokens <= 2048 THEN 2048
        |    WHEN n_tokens <= 4096 THEN 4096 ELSE -1 END AS bucket_hi,
        |  count(*) AS n_docs, CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS sum_tokens
        |FROM (SELECT CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens FROM documents)
        |GROUP BY 1""".stripMargin,
    "pack_mixture_schedule" ->
      """WITH s AS (
        |  SELECT doc_id, source,
        |    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 16 AS shard
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, shard,
        |    row_number() OVER (PARTITION BY source ORDER BY shard, doc_id) AS rank_in_source
        |  FROM s)
        |SELECT doc_id, source, shard, rank_in_source,
        |  CAST(rank_in_source AS DOUBLE) /
        |    (CASE source WHEN 'src0' THEN CAST(1.0 AS DOUBLE)
        |                 WHEN 'src1' THEN CAST(0.5 AS DOUBLE)
        |                 WHEN 'src2' THEN CAST(0.25 AS DOUBLE)
        |                 ELSE CAST(0.125 AS DOUBLE) END) AS vt
        |FROM r""".stripMargin,
    // IVM merge must equal the direct recompute (integer-cent sums →
    // re-association is exact)
    "ivm_event_stats" ->
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(count(v) AS BIGINT) AS n_vals,
        |  CAST(sum(v) AS BIGINT) AS sum_val,
        |  min(v) AS min_val, max(v) AS max_val,
        |  CASE WHEN count(v) > 0 THEN CAST(sum(v) AS DOUBLE) / count(v) END AS mean_val
        |FROM (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v FROM events)
        |GROUP BY 1""".stripMargin,
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
    // per-epoch reshuffle: the oracle is the naive per-epoch global
    // row_number the two-phase Spark plan provably equals
    "epoch_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id, e.epoch,
        |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':',
        |      CAST(e.epoch AS VARCHAR))), 1, 15)) AS BIGINT) AS order_key
        |  FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e)
        |SELECT CAST(epoch AS INTEGER) AS epoch, doc_id, order_key,
        |  CAST(row_number() OVER (PARTITION BY epoch ORDER BY order_key, doc_id) AS BIGINT) AS "rank"
        |FROM k""".stripMargin,
    // token-budget selection: the oracle is the per-document prefix
    // rule (score DESC, id) the bin-wholesale Spark plan equals
    "select_token_budget" ->
      """WITH q AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS ttr,
        |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, ttr, n_tokens,
        |    SUM(CAST(n_tokens AS BIGINT)) OVER (PARTITION BY source
        |      ORDER BY ttr DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM q)
        |SELECT doc_id, source, ttr, n_tokens FROM c WHERE cum <= 500""".stripMargin,
    // merged duplicated-span cut list: same positions vocabulary as
    // dedup_kgram_coverage, islands by running-max-end
    "span_repeat_spans" ->
      """WITH pos AS (
        |  SELECT doc_id, CAST(g.i AS INTEGER) AS pos, substr(text, g.i, 30) AS gram
        |  FROM documents,
        |       LATERAL (SELECT unnest(generate_series(1, len(text) - 29)) AS i) g),
        |dup AS (SELECT gram FROM pos GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |f AS (SELECT doc_id, pos FROM pos WHERE gram IN (SELECT gram FROM dup)),
        |m AS (SELECT doc_id, pos,
        |        max(pos + 29) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |      FROM f),
        |i AS (SELECT doc_id, pos,
        |        CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS is_new
        |      FROM m),
        |s AS (SELECT doc_id, pos,
        |        SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS UNBOUNDED PRECEDING) AS span_id
        |      FROM i)
        |SELECT doc_id, CAST(span_id AS BIGINT) AS span_id,
        |  min(pos) AS span_start, max(pos) + 29 AS span_end,
        |  max(pos) + 29 - min(pos) + 1 AS span_len
        |FROM s GROUP BY 1, 2""".stripMargin,
    "s13_versioned_read" ->
      "SELECT * FROM documents WHERE doc_id < 250",
    "colloc_lift_topk" ->
      """WITH tk AS (SELECT string_split(text, ' ') AS t FROM documents),
        |pairs AS (
        |  SELECT t[g.i] AS w1, t[g.i + 1] AS w2
        |  FROM tk, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) g
        |  WHERE len(t) >= 2),
        |pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
        |       FROM pairs GROUP BY 1, 2 HAVING count(*) >= 3),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w
        |        FROM (SELECT unnest(t) AS w FROM tk) GROUP BY 1),
        |tot AS (SELECT CAST(sum(len(t)) AS BIGINT) AS n_tokens FROM tk)
        |SELECT p.w1, p.w2, p.n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2, tot.n_tokens,
        |  CAST(p.n_pair * tot.n_tokens AS DOUBLE) / (u1.n_w * u2.n_w) AS lift
        |FROM pc p
        |JOIN uni u1 ON u1.w = p.w1
        |JOIN uni u2 ON u2.w = p.w2, tot
        |ORDER BY lift DESC, w1, w2 LIMIT 20""".stripMargin,
    "overlap_source_matrix" ->
      """WITH g AS (
        |  SELECT DISTINCT doc_id, substr(text, i.i, 30) AS gram
        |  FROM documents,
        |       LATERAL (SELECT unnest(generate_series(1, len(text) - 29)) AS i) i),
        |dp AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT least(da.source, db.source) AS source_a,
        |       greatest(da.source, db.source) AS source_b,
        |       CAST(count(*) AS BIGINT) AS n_doc_pairs,
        |       CAST(sum(dp.n_shared) AS BIGINT) AS n_shared_grams
        |FROM dp
        |JOIN documents da ON da.doc_id = dp.id_a
        |JOIN documents db ON db.doc_id = dp.id_b
        |GROUP BY 1, 2""".stripMargin,
    // calibration oracle: the single-window percent_rank the
    // two-phase plan provably equals
    "score_calibrate" ->
      """WITH q AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS ttr
        |  FROM documents)
        |SELECT doc_id, source, ttr,
        |  percent_rank() OVER (PARTITION BY source ORDER BY ttr) AS score_pct
        |FROM q""".stripMargin,
    "winsorize_events" ->
      """WITH c AS (SELECT event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
        |  FROM events),
        |b AS (SELECT event_type,
        |    quantile_cont(value_cents, 0.25) AS lo,
        |    quantile_cont(value_cents, 0.75) AS hi
        |  FROM c WHERE value_cents IS NOT NULL GROUP BY 1)
        |SELECT c.event_id, c.event_type, c.value_cents,
        |  CASE WHEN c.value_cents IS NULL THEN NULL
        |       ELSE least(greatest(CAST(c.value_cents AS DOUBLE), b.lo), b.hi) END AS value_cents_w
        |FROM c LEFT JOIN b USING (event_type)""".stripMargin,
    // curriculum blend: (1-pct)*0.5 + hash_frac*0.5, both factors
    // exact — binary-exact mix keeps the arithmetic engine-portable
    "curriculum_priority" ->
      """WITH q AS (
        |  SELECT doc_id, source,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS ttr
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, ttr,
        |    percent_rank() OVER (PARTITION BY source ORDER BY ttr) AS score_pct
        |  FROM q)
        |SELECT doc_id, source, ttr, score_pct,
        |  (1.0 - score_pct) * 0.5 +
        |  (CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |     / 1152921504606846976.0) * 0.5 AS priority
        |FROM c""".stripMargin,
    // the cut replayed character-wise: every position not covered by
    // a merged span survives, in order (string_agg skips the NULLed
    // covered chars); fully-covered docs coalesce to ''
    "span_cut_text" ->
      """WITH pos AS (
        |  SELECT doc_id, CAST(g.i AS INTEGER) AS pos, substr(text, g.i, 30) AS gram
        |  FROM documents,
        |       LATERAL (SELECT unnest(generate_series(1, len(text) - 29)) AS i) g),
        |dup AS (SELECT gram FROM pos GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |f AS (SELECT doc_id, pos FROM pos WHERE gram IN (SELECT gram FROM dup)),
        |m AS (SELECT doc_id, pos,
        |        max(pos + 29) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |      FROM f),
        |i AS (SELECT doc_id, pos,
        |        CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS is_new
        |      FROM m),
        |sp AS (SELECT doc_id, span_id, min(pos) AS s, max(pos) + 29 AS e
        |       FROM (SELECT doc_id, pos,
        |               SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos
        |                 ROWS UNBOUNDED PRECEDING) AS span_id
        |             FROM i)
        |       GROUP BY 1, 2),
        |ch AS (SELECT d.doc_id, CAST(g.i AS INTEGER) AS i, substr(d.text, g.i, 1) AS c
        |       FROM documents d,
        |            LATERAL (SELECT unnest(generate_series(1, len(d.text))) AS i) g),
        |cov AS (SELECT ch.doc_id, ch.i, ch.c,
        |          EXISTS (SELECT 1 FROM sp WHERE sp.doc_id = ch.doc_id
        |                  AND ch.i BETWEEN sp.s AND sp.e) AS cut
        |        FROM ch)
        |, agg AS (SELECT doc_id,
        |  COALESCE(string_agg(CASE WHEN cut THEN NULL ELSE c END, '' ORDER BY i), '') AS clean_text
        |FROM cov GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.clean_text, d.text) AS clean_text
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    "span_clean_stats" ->
      """WITH pos AS (
        |  SELECT doc_id, CAST(g.i AS INTEGER) AS pos, substr(text, g.i, 30) AS gram
        |  FROM documents,
        |       LATERAL (SELECT unnest(generate_series(1, len(text) - 29)) AS i) g),
        |dup AS (SELECT gram FROM pos GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
        |f AS (SELECT doc_id, pos FROM pos WHERE gram IN (SELECT gram FROM dup)),
        |m AS (SELECT doc_id, pos,
        |        max(pos + 29) OVER (PARTITION BY doc_id ORDER BY pos
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |      FROM f),
        |i AS (SELECT doc_id, pos,
        |        CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS is_new
        |      FROM m),
        |sp AS (SELECT doc_id, span_id, max(pos) + 29 - min(pos) + 1 AS span_len
        |       FROM (SELECT doc_id, pos,
        |               SUM(is_new) OVER (PARTITION BY doc_id ORDER BY pos
        |                 ROWS UNBOUNDED PRECEDING) AS span_id
        |             FROM i)
        |       GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
        |          CAST(SUM(span_len) AS BIGINT) AS chars_flagged
        |        FROM sp GROUP BY 1)
        |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
        |  COALESCE(a.n_spans, 0) AS n_spans,
        |  COALESCE(a.chars_flagged, 0) AS chars_flagged,
        |  CAST(CAST(length(d.text) AS BIGINT) - COALESCE(a.chars_flagged, 0) AS DOUBLE)
        |    / CAST(NULLIF(length(d.text), 0) AS BIGINT) AS clean_frac
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin,
    // keep-best-quality near-dedup: connected components at 0.5
    // jaccard, representative = (ttr DESC, doc_id) head per cluster
    "dedup_near_keep_best" ->
      """WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |sh AS (SELECT doc_id,
        |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
        |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
        |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
        |       FROM toks),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
        |edges AS (SELECT id_a AS s, id_b AS t FROM pairs UNION SELECT id_b, id_a FROM pairs),
        |walk(v, r) AS (
        |  SELECT s, s FROM (SELECT DISTINCT s FROM edges) t0
        |  UNION
        |  SELECT e.t, w.r FROM walk w JOIN edges e ON e.s = w.v),
        |cl AS (SELECT v AS doc_id, min(r) AS cluster_id FROM walk GROUP BY 1),
        |q AS (SELECT doc_id, CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS ttr FROM toks),
        |ranked AS (SELECT c.doc_id,
        |             row_number() OVER (PARTITION BY c.cluster_id
        |               ORDER BY q.ttr DESC, c.doc_id) AS rn
        |           FROM cl c JOIN q USING (doc_id))
        |SELECT q.doc_id, q.ttr FROM q
        |WHERE q.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)""".stripMargin,
    "sample_priority_topk" ->
      """SELECT doc_id, n_tokens, CAST(n_tokens AS DOUBLE) / u AS priority
        |FROM (SELECT doc_id,
        |        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |        greatest(
        |          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |            / 1152921504606846976.0,
        |          1.0 / 1152921504606846976.0) AS u
        |      FROM documents)
        |ORDER BY priority DESC, doc_id LIMIT 50""".stripMargin,
    // DuckDB regexp_replace needs the explicit 'g' flag (Spark's is
    // global by default); email pass first, same order as redactPii
    "text_pii_redact" ->
      """SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
        |    'https?://[A-Za-z0-9./_%?&=-]+', '<URL>', 'g') AS text_redacted
        |FROM documents""".stripMargin,
    "text_oov_rate" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |vocab AS (SELECT token FROM (SELECT token, count(*) AS c FROM tok
        |                             GROUP BY 1 ORDER BY c DESC, token LIMIT 20))
        |SELECT t.doc_id, count(*) AS n_tokens,
        |  count(CASE WHEN v.token IS NULL THEN 1 END) AS n_oov,
        |  CAST(count(CASE WHEN v.token IS NULL THEN 1 END) AS DOUBLE) / count(*) AS oov_rate
        |FROM tok t LEFT JOIN vocab v USING (token)
        |GROUP BY 1""".stripMargin,
    // same bigram rule as text_repetition, same md5 bucketing as the
    // hash splits, fixed-point ln-ratio quantized once per bucket
    "dsir_weights" ->
      """WITH toks AS (SELECT doc_id, lang, text, string_split(text, ' ') AS w FROM documents),
        |g0 AS (
        |  SELECT doc_id, lang, array_to_string(w[i:i+1], ' ') AS gram
        |  FROM (SELECT doc_id, lang, w, unnest(generate_series(1, len(w) - 1)) AS i
        |        FROM toks WHERE len(w) >= 2)
        |  UNION ALL
        |  SELECT doc_id, lang, text AS gram FROM toks WHERE len(w) < 2),
        |g AS (SELECT doc_id,
        |        CASE WHEN lang = 'en' THEN 1 END AS is_tgt,
        |        CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) % 1024 AS bucket
        |      FROM g0),
        |cnt AS (SELECT bucket, count(*) AS c_raw, count(is_tgt) AS c_tgt
        |        FROM g GROUP BY 1),
        |model AS (SELECT bucket,
        |            CAST(floor((ln(CAST(c_tgt + 1 AS DOUBLE) / (sum(c_tgt) OVER () + 1024))
        |                      - ln(CAST(c_raw + 1 AS DOUBLE) / (sum(c_raw) OVER () + 1024)))
        |                       * 1000000.0 + 0.5) AS BIGINT) AS ratio_fp
        |          FROM cnt)
        |SELECT g.doc_id, count(*) AS n_grams, CAST(sum(m.ratio_fp) AS BIGINT) AS score_fp
        |FROM g JOIN model m USING (bucket)
        |GROUP BY 1""".stripMargin,
    // drift: full-join of per-snapshot counts, add-1 smoothed PSI,
    // same fixed-point floor(x+0.5) quantization as dsir/quantize
    "drift_lang" ->
      """WITH o AS (SELECT lang AS value, count(*) AS n_old FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
        |n AS (SELECT lang AS value, count(*) AS n_new FROM documents WHERE doc_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT value, coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
        |      FROM o FULL JOIN n USING (value)),
        |p AS (SELECT value, n_old, n_new,
        |        CAST(n_old + 1 AS DOUBLE) / (sum(n_old) OVER () + count(*) OVER ()) AS p_old,
        |        CAST(n_new + 1 AS DOUBLE) / (sum(n_new) OVER () + count(*) OVER ()) AS p_new
        |      FROM j),
        |c AS (SELECT value, n_old, n_new,
        |        CAST(floor((p_new - p_old) * (ln(p_new) - ln(p_old)) * 1000000.0 + 0.5) AS BIGINT) AS psi_fp
        |      FROM p)
        |SELECT value, n_old, n_new, psi_fp, CAST(sum(psi_fp) OVER () AS BIGINT) AS psi_total_fp
        |FROM c""".stripMargin,
    "drift_length_bands" ->
      """WITH b AS (SELECT doc_id,
        |        CASE WHEN n_chars < 200 THEN 'short' WHEN n_chars < 400 THEN 'mid' ELSE 'long' END AS band
        |      FROM documents),
        |o AS (SELECT band AS value, count(*) AS n_old FROM b WHERE doc_id % 2 = 0 GROUP BY 1),
        |n AS (SELECT band AS value, count(*) AS n_new FROM b WHERE doc_id % 2 = 1 GROUP BY 1),
        |j AS (SELECT value, coalesce(n_old, 0) AS n_old, coalesce(n_new, 0) AS n_new
        |      FROM o FULL JOIN n USING (value)),
        |p AS (SELECT value, n_old, n_new,
        |        CAST(n_old + 1 AS DOUBLE) / (sum(n_old) OVER () + count(*) OVER ()) AS p_old,
        |        CAST(n_new + 1 AS DOUBLE) / (sum(n_new) OVER () + count(*) OVER ()) AS p_new
        |      FROM j),
        |c AS (SELECT value, n_old, n_new,
        |        CAST(floor((p_new - p_old) * (ln(p_new) - ln(p_old)) * 1000000.0 + 0.5) AS BIGINT) AS psi_fp
        |      FROM p)
        |SELECT value, n_old, n_new, psi_fp, CAST(sum(psi_fp) OVER () AS BIGINT) AS psi_total_fp
        |FROM c""".stripMargin,
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
    "pipeline_preprocess" ->
      s"""WITH q AS (
         |  SELECT doc_id, text,
         |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS ttr
         |  FROM $doubledDocsSql),
         |f AS (SELECT * FROM q WHERE n_tokens >= 30 AND ttr >= 0.4),
         |d AS (SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM f) WHERE rn = 1),
         |scored AS (SELECT doc_id, n_tokens, ttr,
         |    CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['the', 'a'], t))) AS INTEGER) AS s_en,
         |    CAST(len(list_filter(string_split(text, ' '), t -> list_contains(['table', 'query', 'row'], t))) AS INTEGER) AS s_db
         |  FROM d)
         |SELECT doc_id, n_tokens, ttr,
         |  CASE WHEN s_en >= s_db THEN 'en' ELSE 'db' END AS lang_pred
         |FROM scored""".stripMargin,
    "pipeline_train_prep" ->
      s"""WITH q AS (
         |  SELECT doc_id, text,
         |    CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS ttr
         |  FROM $doubledDocsSql),
         |f AS (SELECT * FROM q WHERE n_tokens >= 20 AND ttr >= 0.3),
         |d AS (SELECT * FROM (
         |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM f) WHERE rn = 1),
         |toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM d),
         |sh AS (SELECT doc_id,
         |         CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
         |              ELSE list_distinct(list_transform(generate_series(1, len(tk) - 2),
         |                     i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2]))) END AS s
         |       FROM toks),
         |drops AS (SELECT DISTINCT b.doc_id AS id_b
         |          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |          WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(list_distinct(list_concat(a.s, b.s))) >= 0.5)
         |SELECT doc_id, n_tokens, ttr,
         |  CASE WHEN bkt < 5 THEN 'val' WHEN bkt < 10 THEN 'test' ELSE 'train' END AS split
         |FROM (SELECT doc_id, n_tokens, ttr,
         |        CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bkt
         |      FROM d WHERE doc_id NOT IN (SELECT id_b FROM drops))""".stripMargin,
    // incoming ids are all absent from the store by construction, so
    // the diff stage's "added" set equals the incoming set and the
    // oracle replays dedup + quality directly (the diff labelling
    // itself is gated by drift_snapshot)
    "pipeline_incremental" ->
      """WITH store AS (SELECT * FROM documents WHERE doc_id % 5 != 0),
        |incoming AS (
        |  SELECT * FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 50 = 1),
        |novel AS (SELECT * FROM incoming
        |          WHERE md5(text) NOT IN (SELECT md5(text) FROM store))
        |SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS ttr
        |FROM novel WHERE len(string_split(text, ' ')) >= 30""".stripMargin,
    "vec_norm" ->
      "SELECT vec_id, sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS l2 FROM embeddings",
    "vec_slice_ops" ->
      """SELECT vec_id, CAST(i AS INTEGER) AS idx,
        |  CASE WHEN i < 8 THEN v[CAST(i + 1 AS INTEGER)] END AS head_elem,
        |  v[CAST(i + 1 AS INTEGER)] * 2.0 AS scaled_elem,
        |  list_aggregate(v, 'sum') AS sum_elems
        |FROM (SELECT vec_id, embedding::DOUBLE[] AS v,
        |        unnest(generate_series(0, len(embedding) - 1)) AS i
        |      FROM embeddings)""".stripMargin,
    // same max-abs/floor(x+0.5) scheme as Quantize.int8Codes — floor
    // is spelled out because engines disagree on round()'s half mode
    "vec_quantize_audit" ->
      """WITH v AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS scale
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, v, scale,
        |         list_transform(v, x -> CASE WHEN scale = 0 THEN 0
        |                                     ELSE CAST(floor(x / scale * 127 + 0.5) AS INTEGER) END) AS qa
        |  FROM v)
        |SELECT vec_id, CAST(len(v) AS INTEGER) AS n_dims, scale,
        |  CAST(list_aggregate(qa, 'sum') AS BIGINT) AS q_sum,
        |  CAST(list_aggregate(qa, 'min') AS INTEGER) AS q_min,
        |  CAST(list_aggregate(qa, 'max') AS INTEGER) AS q_max,
        |  list_max(list_transform(generate_series(1, len(v)),
        |    i -> abs(qa[i] * scale / 127 - v[i]))) <= scale / 254 + 1e-9 AS recon_ok
        |FROM q""".stripMargin,
    "sim_quant_recall" ->
      """WITH q AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v,
        |         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS scale
        |  FROM embeddings),
        |qq AS (
        |  SELECT vec_id, v, scale,
        |         list_transform(v, x -> CASE WHEN scale = 0 THEN 0
        |                                     ELSE CAST(floor(x / scale * 127 + 0.5) AS INTEGER) END)::DOUBLE[] AS qa
        |  FROM q),
        |exact AS (
        |  SELECT probe_id, neighbor_id FROM (
        |    SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |           row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |             list_inner_product(c.v, p.v) / (sqrt(list_inner_product(c.v, c.v)) * sqrt(list_inner_product(p.v, p.v))) DESC,
        |             c.vec_id) AS rn
        |    FROM qq c, qq p WHERE p.vec_id < 5)
        |  WHERE rn <= 10),
        |quant AS (
        |  SELECT probe_id, neighbor_id FROM (
        |    SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
        |           row_number() OVER (PARTITION BY p.vec_id ORDER BY
        |             list_inner_product(c.qa, p.qa) / (sqrt(list_inner_product(c.qa, c.qa)) * sqrt(list_inner_product(p.qa, p.qa))) DESC,
        |             c.vec_id) AS rn
        |    FROM qq c, qq p WHERE p.vec_id < 5)
        |  WHERE rn <= 10)
        |SELECT e.probe_id, count(*) / 10.0 AS recall_at_k
        |FROM exact e JOIN quant t ON e.probe_id = t.probe_id AND e.neighbor_id = t.neighbor_id
        |GROUP BY 1""".stripMargin,
    // BM25 replay: same fixed-point per-term quantization as the
    // dsir_* oracles — the integer per-doc sum is order-independent,
    // the one cross-engine float op is ln() per query term
    "ret_bm25_topk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, tk FROM d),
        |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |post AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf, any_value(dl) AS dl
        |         FROM (SELECT doc_id, dl, unnest(tk) AS t FROM dl)
        |         WHERE t IN ('dup', 'vector', 'spark')
        |         GROUP BY doc_id, t),
        |dfre AS (SELECT term, CAST(count(*) AS BIGINT) AS dft FROM post GROUP BY term),
        |sc AS (SELECT p.doc_id,
        |         CAST(floor(ln((s.n - f.dft + 0.5) / (f.dft + 0.5) + 1.0)
        |              * ((p.tf * (1.2 + 1.0))
        |                 / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(p.dl AS DOUBLE) / s.avgdl)))
        |              * 1000000.0 + 0.5) AS BIGINT) AS c_fp
        |       FROM post p JOIN dfre f USING (term) CROSS JOIN stats s)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_matched,
        |       CAST(sum(c_fp) AS BIGINT) AS bm25_fp
        |FROM sc GROUP BY doc_id
        |ORDER BY bm25_fp DESC, doc_id LIMIT 10""".stripMargin,
    // RRF fusion of the two oracle-replayed arms; CAST(1 AS DOUBLE)
    // keeps the division IEEE (a bare 1.0 is DECIMAL in DuckDB)
    "ret_hybrid_topk" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |dl AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl, tk FROM d),
        |stats AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
        |post AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf, any_value(dl) AS dl
        |         FROM (SELECT doc_id, dl, unnest(tk) AS t FROM dl)
        |         WHERE t IN ('dup', 'vector', 'spark')
        |         GROUP BY doc_id, t),
        |dfre AS (SELECT term, CAST(count(*) AS BIGINT) AS dft FROM post GROUP BY term),
        |sc AS (SELECT p.doc_id,
        |         CAST(floor(ln((s.n - f.dft + 0.5) / (f.dft + 0.5) + 1.0)
        |              * ((p.tf * (1.2 + 1.0))
        |                 / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * CAST(p.dl AS DOUBLE) / s.avgdl)))
        |              * 1000000.0 + 0.5) AS BIGINT) AS c_fp
        |       FROM post p JOIN dfre f USING (term) CROSS JOIN stats s),
        |bm AS (SELECT doc_id, CAST(sum(c_fp) AS BIGINT) AS bm25_fp
        |       FROM sc GROUP BY doc_id ORDER BY bm25_fp DESC, doc_id LIMIT 20),
        |lex AS (SELECT doc_id,
        |          CAST(row_number() OVER (ORDER BY bm25_fp DESC, doc_id) AS INTEGER) AS lex_rank
        |        FROM bm),
        |probe AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0),
        |cos AS (SELECT vec_id AS doc_id,
        |          list_inner_product(embedding::DOUBLE[], p) /
        |            (sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) * sqrt(list_inner_product(p, p))) AS sim
        |        FROM embeddings, probe ORDER BY sim DESC, vec_id LIMIT 20),
        |sem AS (SELECT doc_id,
        |          CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS INTEGER) AS sem_rank
        |        FROM cos)
        |SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,
        |  COALESCE(CAST(1 AS DOUBLE) / (60 + l.lex_rank), 0)
        |    + COALESCE(CAST(1 AS DOUBLE) / (60 + s.sem_rank), 0) AS rrf
        |FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    // closed-form statement of what a correct header parser must
    // return for the synthMediaContent fixture (PNG = 33 bytes fixed;
    // baseline JPEG = 45 + COM pad; EXIF/SOF2 JPEG = 33 + APP1 pad;
    // text rows decode to null)
    "mm_decode" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' END AS format,
        |  CASE WHEN doc_id % 3 IN (0, 1) THEN CAST(doc_id % 1913 + 16 AS INTEGER) END AS width,
        |  CASE WHEN doc_id % 3 IN (0, 1) THEN CAST(doc_id % 1061 + 16 AS INTEGER) END AS height,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 33
        |       WHEN 1 THEN (CASE WHEN doc_id % 2 = 0 THEN 34 ELSE 46 END) + doc_id % 37
        |       ELSE octet_length(encode(text)) END AS INTEGER) AS n_bytes
        |FROM documents""".stripMargin,
    "mm_audio_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'wav' END AS format,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INTEGER) END AS channels,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(8000 + (doc_id % 5) * 2000 AS INTEGER) END AS sample_rate,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(CASE WHEN doc_id % 7 < 4 THEN 8 ELSE 16 END AS INTEGER) END AS bits_per_sample,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 500 + 1 AS BIGINT) END AS n_frames
        |FROM documents""".stripMargin,
    // closed-form mvhd replay: timescale/duration derive from the id
    // exactly as synthVideoContent builds them; text rows are null
    "mm_video_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'mp4' END AS format,
        |  CASE WHEN doc_id % 2 = 0 THEN 'isom' END AS brand,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 977 + 1000 AS INTEGER) END AS timescale,
        |  CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id % 89 + 1) * (doc_id % 977 + 1000) AS BIGINT) END AS duration
        |FROM documents""".stripMargin,
    // independent byte-level recompute: hex the UTF-8 bytes, unnest to
    // byte values, aggregate the same histogram statistics. Chunking
    // happens on the HEX STRING (200 hex chars = 100 bytes) so the
    // oracle splits the encoded BYTES exactly like the Spark side —
    // substr(text, …) would split by CHARACTER and diverge on any
    // non-ASCII document.
    "mm_features" ->
      """WITH chunks AS (
        |  SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
        |         substr(hx, CAST(i * 200 + 1 AS INTEGER), 200) AS hx
        |  FROM (SELECT doc_id, hex(encode(text)) AS hx,
        |          unnest(generate_series(0, CAST(ceil(octet_length(encode(text)) / 100.0) AS BIGINT) - 1)) AS i
        |        FROM documents)),
        |bytes AS (
        |  SELECT doc_id, chunk_idx,
        |         CAST(concat('0x', substr(hx, CAST(j * 2 + 1 AS INTEGER), 2)) AS INTEGER) AS v
        |  FROM (SELECT doc_id, chunk_idx, hx,
        |          unnest(generate_series(0, CAST(length(hx) / 2 AS BIGINT) - 1)) AS j
        |        FROM chunks)),
        |cnt AS (SELECT doc_id, chunk_idx, v, count(*) AS c FROM bytes GROUP BY 1, 2, 3)
        |SELECT doc_id, chunk_idx,
        |  CAST(sum(c) AS INTEGER) AS n_bytes,
        |  CAST(count(*) AS INTEGER) AS n_distinct,
        |  CAST(sum(v * c) AS BIGINT) AS byte_sum,
        |  CAST(sum(CASE WHEN v BETWEEN 32 AND 126 THEN c ELSE 0 END) AS INTEGER) AS n_printable,
        |  round((ln(sum(c)) - sum(c * ln(c)) / sum(c)) / ln(2), 4) AS entropy
        |FROM cnt GROUP BY 1, 2""".stripMargin,
    "mm_byte_hist" ->
      """WITH bytes AS (
        |  SELECT doc_id,
        |         CAST(concat('0x', substr(hx, CAST(j * 2 + 1 AS INTEGER), 2)) AS INTEGER) // 16 AS bin
        |  FROM (SELECT doc_id, hex(encode(text)) AS hx,
        |          unnest(generate_series(0, octet_length(encode(text)) - 1)) AS j
        |        FROM documents)),
        |cnt AS (SELECT doc_id, bin, count(*) AS c FROM bytes GROUP BY 1, 2),
        |n AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
        |SELECT n.doc_id, CAST(g.i AS INTEGER) AS bin_idx,
        |  COALESCE(cnt.c, 0) / CAST(n.n AS DOUBLE) AS p
        |FROM n CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS i) g
        |LEFT JOIN cnt ON cnt.doc_id = n.doc_id AND cnt.bin = g.i""".stripMargin,
    "sim_ann_topk" -> annTopKOracle,
    "sim_embedding_neardup" -> embeddingNearDupOracle,
    "dedup_simhash_pairs" -> simhashPairsOracle,
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
    "c9_filename_meta" ->
      """SELECT doc_id, 'documents.parquet' AS source_file, 'documents' AS view_id, '' AS source_timestamp
        |FROM documents""".stripMargin,
    "c10_null_fill" ->
      s"""SELECT c_custkey, CASE WHEN big_total IS NULL THEN 'Null' ELSE CAST(big_total AS VARCHAR) END AS big_total
         |FROM $nullBaseSql""".stripMargin,
    "w2_json_props" ->
      """SELECT event_id, CAST(props->>'k' AS INTEGER) AS k,
        |       CAST(props->>'k' AS DOUBLE) * value AS weighted
        |FROM events""".stripMargin,
    // strict-order funnel: each stage's first qualifying time chains
    // off the previous stage's (first-touch); ns-exact comparisons
    "funnel_stages" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
        |SELECT 'view' AS stage, CAST(1 AS INTEGER) AS stage_idx, count(*) AS n_users FROM s1
        |UNION ALL SELECT 'click', CAST(2 AS INTEGER), count(*) FROM s2
        |UNION ALL SELECT 'purchase', CAST(3 AS INTEGER), count(*) FROM s3""".stripMargin,
    // µs gaps via epoch_us — DuckDB's TIMESTAMP read of the ns column
    // is floor(ns/1000), identical to the Spark side's `ts div 1000`
    "funnel_conversion" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1),
        |g12 AS (SELECT epoch_us(s2.t) - epoch_us(s1.t) AS gap FROM s2 JOIN s1 USING (user_id)),
        |g23 AS (SELECT epoch_us(s3.t) - epoch_us(s2.t) AS gap FROM s3 JOIN s2 USING (user_id))
        |SELECT 'view' AS from_stage, 'click' AS to_stage, CAST(2 AS INTEGER) AS to_stage_idx,
        |       count(*) AS n_converted, min(gap) AS min_gap,
        |       quantile_cont(gap, 0.5) AS median_gap, max(gap) AS max_gap
        |FROM g12
        |UNION ALL
        |SELECT 'click', 'purchase', CAST(3 AS INTEGER), count(*), min(gap),
        |       quantile_cont(gap, 0.5), max(gap)
        |FROM g23""".stripMargin,
    // date truncation commutes with max (floor is monotone), so
    // last_d from µs timestamps equals the Spark side's from ns
    "event_rfm" ->
      """WITH pu AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_d,
        |         CAST(count(*) AS BIGINT) AS frequency,
        |         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_cents
        |       FROM events GROUP BY 1),
        |ref AS (SELECT max(last_d) AS ref_d FROM pu),
        |r AS (SELECT user_id, CAST(date_diff('day', last_d, ref_d) AS INTEGER) AS recency_days,
        |             frequency, monetary_cents FROM pu CROSS JOIN ref),
        |b AS (SELECT quantile_cont(recency_days, [0.2, 0.4, 0.6, 0.8]) AS rb,
        |             quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS fb,
        |             quantile_cont(monetary_cents, [0.2, 0.4, 0.6, 0.8]) AS mb
        |      FROM r),
        |binned AS (SELECT user_id, recency_days, frequency, monetary_cents,
        |  CAST(1 + (recency_days > rb[1])::INT + (recency_days > rb[2])::INT
        |         + (recency_days > rb[3])::INT + (recency_days > rb[4])::INT AS INTEGER) AS r_bin,
        |  CAST(1 + (frequency < fb[1])::INT + (frequency < fb[2])::INT
        |         + (frequency < fb[3])::INT + (frequency < fb[4])::INT AS INTEGER) AS f_bin,
        |  CAST(1 + (monetary_cents < mb[1])::INT + (monetary_cents < mb[2])::INT
        |         + (monetary_cents < mb[3])::INT + (monetary_cents < mb[4])::INT AS INTEGER) AS m_bin
        |  FROM r CROSS JOIN b)
        |SELECT user_id, recency_days, frequency, monetary_cents, r_bin, f_bin, m_bin,
        |       CAST(r_bin * 100 + f_bin * 10 + m_bin AS INTEGER) AS rfm_code
        |FROM binned""".stripMargin,
    "event_trend" ->
      """WITH cells AS (
        |  SELECT event_type,
        |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
        |         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(y) AS BIGINT) AS sum_y,
        |       CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS slope_num,
        |       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS slope_den
        |FROM cells GROUP BY 1""".stripMargin,
    "event_corr" ->
      """WITH c AS (
        |  SELECT event_type,
        |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
        |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT) AS cov_num,
        |       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT) AS var_x,
        |       CAST(count(*) * sum(y * y) - sum(y) * sum(y) AS BIGINT) AS var_y
        |FROM c GROUP BY event_type""".stripMargin,
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
    "range_overlap_join" ->
      """WITH t AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sq AS (SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM t),
        |s AS (SELECT user_id, session_seq, min(ts) AS st, max(ts) AS en
        |      FROM sq GROUP BY 1, 2)
        |SELECT a.st AS ls, a.en AS le, a.user_id AS user_a, a.session_seq AS seq_a,
        |       b.st AS rs, b.en AS re, b.user_id AS user_b, b.session_seq AS seq_b
        |FROM s a JOIN s b ON a.user_id >= 50 AND b.user_id < 50
        |                 AND a.st <= b.en AND b.st <= a.en""".stripMargin,
    "profile_events" ->
      """WITH c AS (SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents,
        |                  user_id, event_id FROM events)
        |SELECT 'value_cents' AS "column", CAST(count(value_cents) AS BIGINT) AS n_value,
        |       CAST(sum(CASE WHEN value_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |       CAST(count(DISTINCT value_cents) AS BIGINT) AS ndv,
        |       CAST(min(value_cents) AS BIGINT) AS min_v, CAST(max(value_cents) AS BIGINT) AS max_v,
        |       CAST(sum(value_cents) AS BIGINT) AS sum_v FROM c
        |UNION ALL
        |SELECT 'user_id', CAST(count(user_id) AS BIGINT),
        |       CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(count(DISTINCT user_id) AS BIGINT),
        |       CAST(min(user_id) AS BIGINT), CAST(max(user_id) AS BIGINT),
        |       CAST(sum(user_id) AS BIGINT) FROM c
        |UNION ALL
        |SELECT 'event_id', CAST(count(event_id) AS BIGINT),
        |       CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(count(DISTINCT event_id) AS BIGINT),
        |       CAST(min(event_id) AS BIGINT), CAST(max(event_id) AS BIGINT),
        |       CAST(sum(event_id) AS BIGINT) FROM c""".stripMargin,
    "scd2_history" ->
      """WITH snaps AS (
        |  SELECT o_custkey, o_orderdate, arg_min(o_orderpriority, o_orderkey) AS priority
        |  FROM orders GROUP BY 1, 2),
        |flagged AS (
        |  SELECT o_custkey, o_orderdate, priority,
        |         (row_number() OVER w = 1 OR
        |          priority IS DISTINCT FROM lag(priority) OVER w) AS opens
        |  FROM snaps WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate))
        |SELECT o_custkey, priority, o_orderdate AS valid_from,
        |       lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS valid_to
        |FROM flagged WHERE opens""".stripMargin,
    "scd2_asof" ->
      """WITH snaps AS (
        |  SELECT o_custkey, o_orderdate, arg_min(o_orderpriority, o_orderkey) AS priority
        |  FROM orders GROUP BY 1, 2),
        |flagged AS (
        |  SELECT o_custkey, o_orderdate, priority,
        |         (row_number() OVER w = 1 OR
        |          priority IS DISTINCT FROM lag(priority) OVER w) AS opens
        |  FROM snaps WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate)),
        |hist AS (
        |  SELECT o_custkey, priority, o_orderdate AS valid_from,
        |         lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS valid_to
        |  FROM flagged WHERE opens)
        |SELECT * FROM hist
        |WHERE valid_from <= TIMESTAMP '1995-06-01'
        |  AND (valid_to IS NULL OR TIMESTAMP '1995-06-01' < valid_to)""".stripMargin,
    "ffill_locf" ->
      """WITH obs AS (
        |  SELECT o_custkey, o_orderdate, o_orderkey,
        |         CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority END AS priority,
        |         CASE WHEN o_orderkey % 5 = 0 THEN o_orderstatus END AS status
        |  FROM orders)
        |SELECT o_custkey, o_orderdate, o_orderkey,
        |       last_value(priority IGNORE NULLS) OVER w AS priority,
        |       last_value(status IGNORE NULLS) OVER w AS status
        |FROM obs
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,
    "a7_group_mode" ->
      """WITH counts AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |         o_orderpriority AS mode_value, CAST(count(*) AS BIGINT) AS n_mode
        |  FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1, 2),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY month ORDER BY n_mode DESC, mode_value ASC) AS rn
        |  FROM counts)
        |SELECT month, mode_value, n_mode FROM r WHERE rn = 1""".stripMargin,
    "funnel_top_paths" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM ranked WHERE rn <= 3 GROUP BY user_id)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users
        |FROM p GROUP BY path HAVING count(*) >= 2""".stripMargin,
    "profile_value_hist" ->
      """WITH c AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type,
        |       CAST(((v - ((v % 500 + 500) % 500)) // 500) * 500 AS BIGINT) AS bin_lo,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM c GROUP BY 1, 2""".stripMargin,
    "profile_day_islands" ->
      """WITH days AS (
        |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS d FROM events),
        |g AS (
        |  SELECT event_type, d,
        |         date_diff('day', DATE '1970-01-01', d) -
        |           row_number() OVER (PARTITION BY event_type ORDER BY d) AS grp
        |  FROM days)
        |SELECT event_type, min(d) AS island_start, max(d) AS island_end,
        |       CAST(count(*) AS BIGINT) AS n_days
        |FROM g GROUP BY event_type, grp""".stripMargin,
    "session_concurrency" ->
      """WITH t AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sq AS (SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM t),
        |s AS (SELECT user_id, session_seq, min(ts) AS st, max(ts) AS en
        |      FROM sq GROUP BY 1, 2),
        |deltas AS (SELECT st AS ts, CAST(1 AS INTEGER) AS delta, user_id, session_seq FROM s
        |           UNION ALL
        |           SELECT en, CAST(-1 AS INTEGER), user_id, session_seq FROM s)
        |SELECT ts, delta, user_id, session_seq,
        |       CAST(sum(delta) OVER (ORDER BY ts, -delta, user_id, session_seq
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrent
        |FROM deltas""".stripMargin,
    "graph_pagerank" ->
      """WITH ev AS (SELECT user_id, ts, event_id, CAST(props->>'k' AS INTEGER) AS item FROM events),
        |tr AS (SELECT lag(item) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
        |              item AS dst FROM ev),
        |e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM tr WHERE src IS NOT NULL GROUP BY 1, 2),
        |v AS (SELECT src AS vertex FROM e UNION SELECT dst FROM e),
        |o AS (SELECT src, sum(w) AS out_w FROM e GROUP BY 1),
        |r0 AS (SELECT vertex, CAST(1000000000 AS BIGINT) AS rank_fp FROM v),
        |c1 AS (SELECT e.dst AS vertex, sum((r.rank_fp * 17 * e.w) // (20 * o.out_w)) AS in_fp
        |       FROM e JOIN r0 r ON e.src = r.vertex JOIN o ON e.src = o.src GROUP BY 1),
        |r1 AS (SELECT v.vertex, CAST(150000000 + coalesce(c1.in_fp, 0) AS BIGINT) AS rank_fp
        |       FROM v LEFT JOIN c1 ON v.vertex = c1.vertex),
        |c2 AS (SELECT e.dst AS vertex, sum((r.rank_fp * 17 * e.w) // (20 * o.out_w)) AS in_fp
        |       FROM e JOIN r1 r ON e.src = r.vertex JOIN o ON e.src = o.src GROUP BY 1),
        |r2 AS (SELECT v.vertex, CAST(150000000 + coalesce(c2.in_fp, 0) AS BIGINT) AS rank_fp
        |       FROM v LEFT JOIN c2 ON v.vertex = c2.vertex),
        |c3 AS (SELECT e.dst AS vertex, sum((r.rank_fp * 17 * e.w) // (20 * o.out_w)) AS in_fp
        |       FROM e JOIN r2 r ON e.src = r.vertex JOIN o ON e.src = o.src GROUP BY 1),
        |r3 AS (SELECT v.vertex, CAST(150000000 + coalesce(c3.in_fp, 0) AS BIGINT) AS rank_fp
        |       FROM v LEFT JOIN c3 ON v.vertex = c3.vertex)
        |SELECT vertex, rank_fp FROM r3""".stripMargin,
    "event_outliers" ->
      """WITH c AS (SELECT event_id, event_type,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents
        |  FROM events),
        |m AS (SELECT event_type, quantile_cont(value_cents, 0.5) AS med FROM c GROUP BY 1),
        |d AS (SELECT c.event_id, c.event_type, c.value_cents, m.med,
        |    abs(c.value_cents - m.med) AS dev
        |  FROM c JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
        |SELECT d.event_id, d.event_type, d.value_cents,
        |       d.med AS med_cents, md.mad AS mad_cents,
        |       d.dev * 2 > md.mad * 7 AS is_outlier
        |FROM d JOIN md USING (event_type)""".stripMargin,
    "drift_snapshot" ->
      """WITH newsnap AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text,
        |         lang, source, n_chars
        |  FROM documents WHERE doc_id % 17 != 0
        |  UNION ALL
        |  SELECT doc_id + 1000000, text, lang, source, n_chars
        |  FROM documents WHERE doc_id % 19 = 0),
        |od AS (SELECT doc_id, md5(concat_ws(chr(1), CASE WHEN text IS NULL THEN 'N' ELSE 'V' || CAST(text AS VARCHAR) END, CASE WHEN lang IS NULL THEN 'N' ELSE 'V' || CAST(lang AS VARCHAR) END, CASE WHEN source IS NULL THEN 'N' ELSE 'V' || CAST(source AS VARCHAR) END, CASE WHEN n_chars IS NULL THEN 'N' ELSE 'V' || CAST(n_chars AS VARCHAR) END)) AS h FROM documents),
        |nd AS (SELECT doc_id, md5(concat_ws(chr(1), CASE WHEN text IS NULL THEN 'N' ELSE 'V' || CAST(text AS VARCHAR) END, CASE WHEN lang IS NULL THEN 'N' ELSE 'V' || CAST(lang AS VARCHAR) END, CASE WHEN source IS NULL THEN 'N' ELSE 'V' || CAST(source AS VARCHAR) END, CASE WHEN n_chars IS NULL THEN 'N' ELSE 'V' || CAST(n_chars AS VARCHAR) END)) AS h FROM newsnap)
        |SELECT COALESCE(od.doc_id, nd.doc_id) AS doc_id,
        |  CASE WHEN od.h IS NULL THEN 'added'
        |       WHEN nd.h IS NULL THEN 'removed'
        |       WHEN od.h != nd.h THEN 'modified'
        |       ELSE 'unchanged' END AS status
        |FROM od FULL OUTER JOIN nd ON od.doc_id = nd.doc_id""".stripMargin,
    "cohort_retention" ->
      """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |coh AS (SELECT user_id, min(d) AS cohort_date FROM act GROUP BY 1)
        |SELECT cohort_date, CAST(datediff('day', cohort_date, d) AS INTEGER) AS offset_days,
        |       count(*) AS n_users
        |FROM act JOIN coh USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    "w3_sessionize" ->
      """WITH t AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT user_id, ts,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM t)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end
        |FROM s GROUP BY 1, 2""".stripMargin,
    "w4_rolling_sum" ->
      """SELECT l_orderkey, l_linenumber,
        |  sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
        |                        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rolling_qty
        |FROM lineitem""".stripMargin,
    "w5_percent_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  percent_rank() OVER w AS pr, cume_dist() OVER w AS cd
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)""".stripMargin,
    "w1_event_windows" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |       count(*) AS n_events, max(value) AS max_value
        |FROM events GROUP BY 1, 2""".stripMargin,
  )
}
