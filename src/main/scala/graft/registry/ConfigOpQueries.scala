package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{ParquetResolver, StudyRunner, Interpreter, PipelineContext}
import graft.io.{ConfigReader, Export, NestedStore, Standardized}
import graft.llm.{Dedup, Multimodal, Similarity, Sketch, TextAnalysis}
import graft.model._
import graft.ops.Ops

/** Query registry — the reference's config-table operators (SURVEY.md §2.2-§2.7): projection, condition filters, joins, aggregation, column derivation, row ops.
  *
  * Split out of SparkEntry (round 13) purely for maintainability: the
  * public driver contract is still `SparkEntry.queries` /
  * `SparkEntry.oracleSql`, which concatenate the per-family maps.
  * Helpers shared across families live in [[QueryHelpers]].
  */
private[graft] object ConfigOpQueries {
  import QueryHelpers._

  val queries: Map[String, (SparkSession, String) => DataFrame] = reg(
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
    "c9_filename_meta" -> ((s, d) =>
      graft.io.Ingestion.withFileMetadata(t(s, d, "documents"))
        .select("doc_id", "source_file", "view_id", "source_timestamp")),
    "c10_null_fill" -> ((s, d) =>
      graft.io.Ingestion.nullFill(
        nullBase(s, d).select(col("c_custkey"), col("big_total").cast("string").as("big_total")))),
    // categorical mode per month, smallest-value tie-break (a total
    // engine-portable order; "undefined on ties" doesn't replay)
    "a7_group_mode" -> ((s, d) =>
      graft.ops.Profile.groupMode("month", "o_orderpriority")(
        t(s, d, "orders").withColumn(
          "month", trunc(col("o_orderdate"), "month")))),
  )

  val oracleSql: Map[String, String] = reg(
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
    "c9_filename_meta" ->
      """SELECT doc_id, 'documents.parquet' AS source_file, 'documents' AS view_id, '' AS source_timestamp
        |FROM documents""".stripMargin,
    "c10_null_fill" ->
      s"""SELECT c_custkey, CASE WHEN big_total IS NULL THEN 'Null' ELSE CAST(big_total AS VARCHAR) END AS big_total
         |FROM $nullBaseSql""".stripMargin,
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
  )
}
