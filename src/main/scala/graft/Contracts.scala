package graft

/** Plan-shape contracts shared by the test gate (ContractSpec) and the
  * cluster-shape audit tool (tools/ClusterShape): the single source of
  * truth for which queries are ALLOWED a BroadcastNestedLoopJoin
  * because their build side is bounded by construction. Everything
  * else must plan equi-joins only — at any partition count.
  */
object Contracts {

  /** Queries whose plans may contain a BroadcastNestedLoopJoin: each
    * build side is a 1-row aggregate, an eval-suite-sized frame, or a
    * guarded `maybeBroadcast` probe set — never corpus-scaled.
    */
  val boundedBuildSide: Set[String] = Set(
    "c5_attach_sumeq",        // crossJoin(broadcast(1-row global agg))
    "sim_cosine_topk",        // crossJoin(broadcast(1-row probe vector))
    "sim_knn_join",           // exact-kNN baseline: guarded probe-set broadcast (maybeBroadcast cap)
    "pipeline_preprocess",    // SUMEQ-style 1-row corpus stats broadcast
    "engine_clinical_study",  // study configs contain ATTACH COLUMN/SUMEQ -> 1-row agg cross
    "engine_study", "engine_pipeline", // same SUMEQ pattern via the interpreter
    "sketch_heavy_hitters",   // crossJoin(broadcast(1-row CMS sketch + total))
    "sim_quant_recall",       // recall audit: guarded probe-set broadcast (maybeBroadcast cap), both rankings
    "ret_bm25_topk",          // crossJoin(broadcast(1-row corpus stats: N, avgdl))
    "text_lm_score",          // crossJoin(broadcast(1-row vocabulary size))
    "ret_hybrid_topk",        // both arms' bounded 1-row broadcasts (bm25 stats + cosine probe)
    "event_rfm",              // crossJoin(broadcast(1-row ref ts + 1-row quantile bounds))
    "sketch_union_ndv",       // crossJoin(broadcast(1-row merged HLL sketch estimate))
    "sketch_inter_ndv",       // inclusion-exclusion: every cross side a 1-row agg/estimate
    "dq_ref_coverage",        // crossJoin(broadcast(1-row orphan count))
    "dedup_cluster_sizes",    // crossJoin of two 1-row counts for the singleton row
    "dedup_graph_triangles",  // crossJoin of three 1-row census aggregates
    "decontam_semantic",      // bench side is eval-suite-sized by construction (broadcast cross)
    "pipeline_curation_v2",   // SEMANTIC DECONTAM stage: same eval-suite-sized bench broadcast
    "mine_contrastive_pairs", // anchors are the mined-batch side (guarded maybeBroadcast cap)
    "vocab_overlap_matrix",   // pair frame from the groups-sized totals cross (groups^2, not data)
    "text_skipgram_lift",     // crossJoin(broadcast(1-row corpus token total))
    "colloc_lift_topk",       // crossJoin(broadcast(1-row corpus token total))
    "er_recommend_bands",     // crossJoin(1-row surviving-hull agg x ≤numBands spec rows)
    "text_kn_score",          // crossJoin(broadcast(1-row (T, V2) type counts))
    "text_kn_buckets",        // same KN scalar cross + partitions-sized offsets broadcast
    "text_kn_incremental",    // same KN scalar cross, counts read from the delta store
    "text_kn3_score",         // same KN scalar cross at the trigram order
    "text_kn3_incremental",   // same trigram scalar cross, counts from the delta store
    "text_kn_erase",          // same KN scalar cross, post-erase counts
    "pipeline_train_prep_v2"  // KN-bucket fluency cut carries the same scalar cross
  )
}
