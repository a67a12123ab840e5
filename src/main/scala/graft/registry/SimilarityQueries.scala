package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{ParquetResolver, StudyRunner, Interpreter, PipelineContext}
import graft.io.{ConfigReader, Export, NestedStore, Standardized}
import graft.llm.{Dedup, Multimodal, Similarity, Sketch, TextAnalysis}
import graft.model._
import graft.ops.Ops

/** Query registry — embedding similarity: cosine/kNN/ANN/IVF, SemDeDup, retrieval (BM25/hybrid), vector column ops, contrastive mining.
  *
  * Split out of SparkEntry (round 13) purely for maintainability: the
  * public driver contract is still `SparkEntry.queries` /
  * `SparkEntry.oracleSql`, which concatenate the per-family maps.
  * Helpers shared across families live in [[QueryHelpers]].
  */
private[graft] object SimilarityQueries {
  import QueryHelpers._

  val queries: Map[String, (SparkSession, String) => DataFrame] = reg(

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
    // the deployment composition: IVF cell pruning + int8-code
    // ranking (the 4x-smaller store sim_quant_recall prices) — exact
    // integer dots, scale-cancelling cosine, same probe contract
    "sim_ivf_quant_topk" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      graft.llm.Ivf.ivfQuantTopK(emb, emb.where(col("vec_id") < 5), "vec_id", "embedding",
        ivfModel(s, d), k = 5, nProbe = 4)
    }),
    // the full deployment query: quantized candidates (k*3 via the
    // int8 path) float-reranked to top-k — the k-for-rerank pattern
    // sim_quant_recall prices; float vectors touched for candidates
    // only
    "sim_ivf_quant_rerank" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      graft.llm.Ivf.ivfQuantRerankTopK(emb, emb.where(col("vec_id") < 5),
        "vec_id", "embedding", ivfModel(s, d), k = 5, nProbe = 4, rerankFactor = 3)
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
    // contrastive-pair mining: anchors 0-7, 2 positives + the 20-24
    // hard-negative rank band per anchor (DPR/ANCE-style)
    "mine_contrastive_pairs" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.contrastivePairs(emb, emb.where(col("vec_id") < 8),
        "vec_id", "embedding", posK = 2, negLo = 20, negHi = 24)
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
  )

  val oracleSql: Map[String, String] = reg(
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
    "sim_ann_topk" -> annTopKOracle,
    "sim_embedding_neardup" -> embeddingNearDupOracle,
  )
}
