package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality over event-derived edges: fixed-iteration
  * PageRank in integer fixed-point arithmetic. Web-corpus curation
  * ranks pages by link centrality before sampling (the CommonCrawl /
  * OpenWebText discipline: a page many navigation paths cross is
  * likelier worth keeping than an orphan); the same operator ranks
  * items in a clickstream by how much user traffic flows through
  * them.
  *
  * Reference scope note: the reference engine (994-line pandas ETL)
  * has no graph surface; this extends the mandated
  * training-data-pipeline family (SURVEY.md §6).
  *
  * Engine-portable determinism (the [[graft.llm.Drift]] fixed-point
  * discipline taken one step further): ranks are LONGS at `scale`
  * fixed-point; one iteration is
  * `r'(v) = base + Σ_{(u,v,w)} (r(u) · dampNum · w) div (dampDen · outW(u))`
  * with `base = (scale · (dampDen − dampNum)) div dampDen` and
  * integer (truncating) division — every operation is exact long
  * arithmetic, order-independent, and replayable bit-for-bit by the
  * DuckDB oracle's chained CTEs. Truncation loses < 1 ulp of rank
  * mass per in-edge per iteration — irrelevant to ranking, decisive
  * for gateability (float PageRank can NEVER hash-match across
  * engines; summation order alone moves the low bits). Dangling
  * vertices (no out-edges) leak their damped mass each iteration —
  * the standard simplification, identical in both engines.
  *
  * Scale shape: one iteration = one equi-join of edges onto the
  * rank table (both keyed on the source vertex — co-partitioned
  * after the first shuffle) + one aggregation keyed on the
  * destination + a left join back onto the vertex table. Edges are
  * referenced every iteration (plus by the vertex and out-weight
  * derivations), so [[pageRankFp]] materializes the normalized edge
  * frame ONCE via `localCheckpoint` — without it the edge-derivation
  * subtree (a window over the raw event log) replays per reference;
  * blocks release when the frame is garbage-collected (the
  * [[graft.llm.Dedup.nearDupClusters]] discipline, no cache-manager
  * entry to leak). Iterations chain lazily — each rank intermediate
  * is referenced exactly once, so the DAG stays linear in `iters`.
  */
object Graph {

  /** Directed transition edges from an event log: consecutive events
    * of the same user define (src_item → dst_item) steps; edge
    * weight = step count across all users. `orderCol` must be a
    * totally-ordered column; ties broken by `tieCol` so the edge set
    * is deterministic under any partitioning (the
    * [[graft.streaming.StreamingIngest]] sessionize ordering rule).
    * One window shuffle on the user, one aggregation on the edge.
    */
  def transitionEdges(
      userCol: String,
      orderCol: String,
      tieCol: String,
      itemCol: String)(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(orderCol), col(tieCol))
    df.select(col(userCol), lag(col(itemCol), 1).over(w).as("src"),
        col(itemCol).as("dst"))
      // null DST too: a null item would otherwise emit (prev -> NULL)
      // edges whose routed rank mass silently vanishes at pageRankFp's
      // null-unsafe join-back
      .where(col("src").isNotNull && col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("weight"))
  }

  /** Fixed-point PageRank over weighted directed edges
    * (`src`, `dst`, `weight`). Output: (vertex, rank_fp) for every
    * vertex appearing as a source or destination; rank_fp is the
    * fixed-point long (divide by `scale` for the real-valued rank).
    * `iters` is deliberately small and fixed (power iteration
    * contracts at the damping rate; 3–5 iterations separate head
    * from tail, which is what corpus curation consumes) — and the
    * oracle unrolls the SAME count.
    */
  def pageRankFp(
      edges: DataFrame,
      iters: Int = 3,
      scale: Long = 1000000000L,
      dampNum: Long = 17L,
      dampDen: Long = 20L): DataFrame = {
    require(iters >= 1 && iters <= 20, s"iters $iters out of [1,20]")
    require(dampNum > 0 && dampNum < dampDen, "damping must be in (0,1)")
    // defensive null-vertex drop: rank mass routed to a NULL vertex
    // could never join back (null-unsafe equi-join) — it would just
    // disappear from the totals with no error
    val e = edges.select(col("src"), col("dst"), col("weight").cast("long").as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true)
    // verts and outW are consumed EVERY iteration (the chained plan
    // re-evaluates each level) — materialize both once like the edge
    // frame, or the distinct/aggregate shuffles replay per iteration
    val verts = e.select(col("src").as("vertex"))
      .union(e.select(col("dst").as("vertex"))).distinct()
      .localCheckpoint(true)
    val outW = e.groupBy(col("src")).agg(sum("w").as("out_w"))
      .localCheckpoint(true)
    val base = (scale * (dampDen - dampNum)) / dampDen
    var ranks = verts.withColumn("rank_fp", lit(scale))
    for (_ <- 1 to iters) {
      val contrib = e
        .join(ranks.select(col("vertex").as("src"), col("rank_fp")), "src")
        .join(outW, "src")
        .select(col("dst").as("vertex"),
          // DECIMAL(38,0) intermediate: three chained long products
          // overflow Int64 for hub ranks x heavy edge weights (an ANSI
          // ARITHMETIC_OVERFLOW task failure at clickstream scale);
          // the decimal product is exact to 38 digits and `div`
          // truncates identically, so gate values are unchanged
          expr(s"CAST((CAST(rank_fp AS DECIMAL(38,0)) * ${dampNum}L * w)" +
            s" div (${dampDen}L * out_w) AS BIGINT)").as("c"))
        .groupBy("vertex").agg(sum("c").as("in_fp"))
      ranks = verts.join(contrib, Seq("vertex"), "left")
        .select(col("vertex"),
          (lit(base) + coalesce(col("in_fp"), lit(0L))).as("rank_fp"))
    }
    ranks
  }
}
