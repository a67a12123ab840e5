package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{ParquetResolver, StudyRunner, Interpreter, PipelineContext}
import graft.io.{ConfigReader, Export, NestedStore, Standardized}
import graft.llm.{Dedup, Multimodal, Similarity, Sketch, TextAnalysis}
import graft.model._
import graft.ops.Ops

/** Query registry — event-time analytics: windows, sessionization, as-of/range joins, funnels, profiles, SCD2, drift, IVM, scale-infra joins (bloom/skew/z-order).
  *
  * Split out of SparkEntry (round 13) purely for maintainability: the
  * public driver contract is still `SparkEntry.queries` /
  * `SparkEntry.oracleSql`, which concatenate the per-family maps.
  * Helpers shared across families live in [[QueryHelpers]].
  */
private[graft] object EventQueries {
  import QueryHelpers._

  val queries: Map[String, (SparkSession, String) => DataFrame] = reg(
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
    // per-key Pearson components in exact longs: covariance
    // numerator + both variance factors ship; the square root is
    // the one op that would break the hash gate
    "event_corr" -> ((s, d) =>
      graft.ops.Trend.groupedCorrelation("event_type", "day_idx", "value_cents")(
        eventsNanos(s, d)
          .withColumn("day_idx",
            datediff(to_date(timestamp_micros(expr("ts div 1000"))), lit("1970-01-01")))
          .withColumn("value_cents", expr("cast(floor(value*100+0.5) as bigint)")))),
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
  )

  val oracleSql: Map[String, String] = reg(
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
