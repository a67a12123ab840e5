package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a document corpus.
  *
  * The missing retrieval half of the similarity family: [[Similarity]]
  * ranks by embedding cosine, this ranks by lexical relevance — the
  * scorer behind hard-negative mining, RAG keyword fallback, and
  * corpus QA ("which documents match this probe query, and how
  * well"). Okapi BM25 (Robertson & Spärck Jones lineage; the public
  * formula every search engine documents):
  *
  * {{{
  *   score(d, Q) = Σ_{t ∈ Q} idf(t) · tf(t,d)·(k1+1)
  *                           / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))
  *   idf(t)      = ln((N − df(t) + ½) / (df(t) + ½) + 1)
  * }}}
  *
  * Shaped for 100 TB the same way [[Dsir]] is:
  *
  *  - the corpus is tokenized in ONE map pass and the gram stream is
  *    filtered to the query's terms BEFORE anything shuffles — only
  *    matching postings (`(doc_id, term)` pairs) ever leave the scan,
  *    a |Q|/|vocab| sliver of the corpus;
  *  - document frequencies reduce to a ≤|Q|-row table joined back by
  *    broadcast; corpus totals (N, avgdl) are one 1-row aggregate
  *    broadcast the same way [[graft.ops.Ops]]'s SUMEQ attach is;
  *  - the corpus is scanned column-pruned once per aggregate lineage
  *    (stats, postings, postings-again under the df count) rather
  *    than caching the exploded gram stream — the [[Dsir]] trade: at
  *    100 TB re-reading two pruned columns beats pinning a corpus-
  *    sized explode in memory;
  *  - the final ranking is `ORDER BY … LIMIT k` —
  *    TakeOrderedAndProject (per-partition heap + k-row driver
  *    merge), never a full sort.
  *
  * Engine-portable determinism, the [[Dsir]] fixed-point contract:
  * each per-(doc, term) contribution is quantized to `fpScale`
  * fixed-point ONCE (`floor(x·fpScale + ½)` as long — micro-score
  * units at the default scale), so the per-doc score is an INTEGER
  * sum: order-independent under any partitioning and bit-identical
  * in the DuckDB oracle. The only cross-engine float op is one `ln`
  * per query term.
  *
  * Reference scope note: the reference engine (994-line pandas ETL,
  * `/root/reference/Configurable_ETL_Python.py`) has no text-search
  * surface; this belongs to the mandated LLM-pipeline family
  * (SURVEY.md §6) alongside [[TextAnalysis.topTermsPerDoc]]'s tf-idf.
  */
object Retrieval {

  /** Top-k documents for a bag-of-terms query. Output: one row per
    * retrieved doc — (idCol, n_matched, bm25_fp), ranked by
    * `bm25_fp DESC, id ASC`. Documents matching no query term are
    * never scored (standard BM25: their score is 0). Duplicate query
    * terms are collapsed — BM25 weights a term once per its corpus
    * statistics, not per its multiplicity in the query string.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      fpScale: Double = 1e6): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(k > 0, "bm25TopK needs k > 0")
    val terms = queryTerms.distinct

    val docs = df.select(
      col(idCol),
      size(TextAnalysis.tokens(col(textCol))).as("__dl"),
      TextAnalysis.tokens(col(textCol)).as("__tk"))

    // 1-row corpus stats, broadcast (the SUMEQ attach shape)
    val stats = docs.agg(
      count(lit(1)).as("__n"),
      (sum("__dl").cast("double") / count(lit(1))).as("__avgdl"))

    // postings: term filter applied map-side, pre-shuffle — only
    // query-term hits carry (doc_id, term, dl) into the aggregation
    val postings = docs
      .select(col(idCol), col("__dl"), explode(col("__tk")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"), first("__dl").as("__dl"))

    // ≤|Q| rows: document frequency per query term
    val docFreq = postings.groupBy("term").agg(count(lit(1)).as("__df"))

    val idf = log((col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)) + lit(1.0))
    val tfPart = (col("__tf") * (lit(k1) + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl").cast("double") / col("__avgdl")))
    val contribFp = floor(idf * tfPart * lit(fpScale) + lit(0.5)).cast("long")

    postings
      .join(broadcast(docFreq), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), contribFp.as("__c_fp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_matched"), sum("__c_fp").as("bm25_fp"))
      .orderBy(col("bm25_fp").desc, col(idCol).asc)
      .limit(k)
  }

  /** Hybrid retrieval: lexical BM25 candidates fused with
    * embedding-cosine candidates by reciprocal-rank fusion
    * (`RRF(d) = Σ_lists 1/(rrfK + rank_list(d))`, Cormack et al. —
    * the standard score-free fusion every hybrid search stack uses).
    * `docs` and `emb` must share `idCol`; the probe is an id into
    * `emb` (the embedded form of the query/anchor document).
    *
    * Scale: each arm is its own top-`candidates` pipeline
    * ([[bm25TopK]]'s postings discipline; [[Similarity.cosineTopK]]'s
    * TakeOrderedAndProject), so the fusion join touches
    * 2·candidates rows — the single-partition rank windows and the
    * full-outer join run on candidate-sized frames, bounded by
    * construction ([[graft.llm.Drift]]'s bounded-window class), never
    * the corpus. RRF terms are 1/(int+int) — engine-exact doubles in
    * a fixed two-term sum, no score normalization to go non-portable.
    */
  def hybridTopK(
      docs: DataFrame,
      emb: DataFrame,
      idCol: String,
      textCol: String,
      vecCol: String,
      queryTerms: Seq[String],
      probeId: Long,
      k: Int,
      candidates: Int = 50,
      rrfK: Int = 60): DataFrame = {
    require(k <= 2 * candidates, s"k ($k) cannot exceed the fused pool (2 x $candidates)")
    val one = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25_fp").desc, col(idCol).asc)
    val lex = bm25TopK(docs, idCol, textCol, queryTerms, candidates)
      .withColumn("lex_rank", row_number().over(one))
      .select(col(idCol), col("lex_rank"))
    val two = org.apache.spark.sql.expressions.Window
      .orderBy(col("sim").desc, col(idCol).asc)
    val sem = Similarity.cosineTopK(emb, idCol, vecCol, probeId, candidates)
      .withColumn("sem_rank", row_number().over(two))
      .select(col(idCol), col("sem_rank"))
    lex.join(sem, Seq(idCol), "full")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("sem_rank")), lit(0.0)))
      .orderBy(col("rrf").desc, col(idCol).asc)
      .limit(k)
  }
}
