package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{ParquetResolver, StudyRunner, Interpreter, PipelineContext}
import graft.io.{ConfigReader, Export, NestedStore, Standardized}
import graft.llm.{Dedup, Multimodal, Similarity, Sketch, TextAnalysis}
import graft.model._
import graft.ops.Ops

/** Query registry — text analysis: quality, language id, BPE, chunking, PII, entropy, collocations, vocabulary audits.
  *
  * Split out of SparkEntry (round 13) purely for maintainability: the
  * public driver contract is still `SparkEntry.queries` /
  * `SparkEntry.oracleSql`, which concatenate the per-family maps.
  * Helpers shared across families live in [[QueryHelpers]].
  */
private[graft] object TextQueries {
  import QueryHelpers._

  val queries: Map[String, (SparkSession, String) => DataFrame] = reg(

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
      TextAnalysis.withBpeTokenCount("text", bpeMerges)(t(s, d, "documents"))
        .select("doc_id", "n_tokens_ws", "n_tokens_bpe", "fertility")),
    // the FULL trainer loop (round 17): text_bpe_pairs' one-step
    // argmax iterated — 4 merges trained on the corpus's distinct-word
    // frequency table, each iteration a vocab re-encode under the
    // merges so far + weighted argmax. The oracle derives the whole
    // trajectory itself (computed merge CTEs, not literals)
    "text_bpe_train" -> ((s, d) => {
      val sp = s
      import sp.implicits._
      TextAnalysis.trainBpeMerges("text", nMerges = 4)(t(s, d, "documents"))
        .toDF().select("rank", "lhs", "rhs", "freq")
    }),
    // fertility under the TRAINED table (12 merges, memoized per dir
    // like the IVF model) — the re-measure a tokenizer-fit loop runs
    // after retraining; oracle is DYNAMIC (the shared encode replay
    // with the trained table embedded at Verify time)
    "bpe_fertility_trained" -> ((s, d) =>
      TextAnalysis.withBpeTokenCount("text",
        trainedBpe(s, d).map(m => (m.lhs, m.rhs)))(t(s, d, "documents"))
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
      TextAnalysis.withBpeTokenCount("text", bpeMerges)(t(s, d, "documents"))
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
    // interpolated Kneser-Ney upgrade of the same filter: unseen
    // bigrams priced by the continuation distribution, not a flat
    // add-1 — the KenLM-default estimator CCNet actually ships
    "text_kn_score" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.llm.LangModel.withKnScore(docs, docs.where(col("doc_id") % 4 === 0),
        "doc_id", "text")
    }),
    // CCNet head/middle/tail: the corpus cut into perplexity tertiles
    // via the two-phase range rank (no one-partition ntile window)
    "text_kn_buckets" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.llm.LangModel.knBuckets(docs, docs.where(col("doc_id") % 4 === 0),
        "doc_id", "text")
    }),
    // the KN family's steady-state face: the model store seeded with
    // HALF the reference, the other half offered as an increment
    // (count-delta partition), scores read from the MERGED store —
    // must equal the from-scratch text_kn_score bit-for-bit, so it
    // shares that oracle's SQL (the mm_neardup_incr_indexed pattern)
    "text_kn_incremental" -> ((s, d) => {
      import graft.llm.LangModel
      val docs = t(s, d, "documents")
      val modelDir = scratch("kn_model_q")
      LangModel.seedKnModel(docs.where(col("doc_id") % 8 === 0), "text", modelDir)
      LangModel.ingestKnModel(
        docs.where(col("doc_id") % 4 === 0 && col("doc_id") % 8 =!= 0),
        "text", modelDir, batchId = 0L)
      LangModel.withKnScoreFromCounts(docs,
        LangModel.loadKnCounts(s, modelDir), "doc_id", "text")
    }),
    // deletion propagation for the KN model store (round 18): seed
    // with a SUPERSET reference (%2==0), erase the %4==2 slice as an
    // exact negative count delta, score from the merged store — the
    // result must equal a from-scratch model over the survivors
    // (%4==0), so it shares text_kn_score's oracle VERBATIM: fully
    // erased grams must vanish from the type/continuation censuses
    // exactly as a rebuild would drop them
    "text_kn_erase" -> ((s, d) => {
      import graft.llm.LangModel
      val docs = t(s, d, "documents")
      val modelDir = scratch("kn_model_erase_q")
      LangModel.seedKnModel(docs.where(col("doc_id") % 2 === 0), "text", modelDir)
      LangModel.eraseKnModel(docs.where(col("doc_id") % 4 === 2), "text",
        modelDir, batchId = 0L)
      LangModel.withKnScoreFromCounts(docs,
        LangModel.loadKnCounts(s, modelDir), "doc_id", "text")
    }),
    // production n-gram order: trigram interpolated KN discounting
    // into the full bigram-KN backoff (raw-count lower order variant,
    // documented); same reference split, same fixed-point discipline
    "text_kn3_score" -> ((s, d) => {
      val docs = t(s, d, "documents")
      graft.llm.LangModel.withKn3Score(docs, docs.where(col("doc_id") % 4 === 0),
        "doc_id", "text")
    }),
    // trigram steady state (round 18): the TWO-ORDER delta store
    // seeded with half the reference, the other half offered as an
    // increment, scores read from the merged store — must equal the
    // from-scratch text_kn3_score bit-for-bit (its oracle verbatim),
    // the text_kn_incremental discipline at the production order
    "text_kn3_incremental" -> ((s, d) => {
      import graft.llm.LangModel
      val docs = t(s, d, "documents")
      val modelDir = scratch("kn3_model_q")
      LangModel.seedKn3Model(docs.where(col("doc_id") % 8 === 0), "text", modelDir)
      LangModel.ingestKn3Model(
        docs.where(col("doc_id") % 4 === 0 && col("doc_id") % 8 =!= 0),
        "text", modelDir, batchId = 0L)
      val (tri, bg) = LangModel.loadKn3Counts(s, modelDir)
      LangModel.withKn3ScoreFromCounts(docs, tri, bg, "doc_id", "text")
    }),
    // model-based quality filter, training face: DISTILL the full
    // Gopher rule battery (the expensive teacher) into a 2-feature
    // closed-form ridge probe (integer normal equations -> BigInt
    // Cramer) — the FineWeb-Edu pattern of replacing a costly labeler
    // with a cheap linear student; the oracle re-derives the whole
    // fit in SQL (HUGEINT determinants over the same gopher replay)
    "quality_probe_train" -> ((s, d) => {
      import graft.llm.QualityProbe
      val withG = TextAnalysis.withGopherSignals("text", Seq("the", "a"))(
        t(s, d, "documents"))
      val p = QualityProbe.trainRidge(withG, QualityProbe.tokenCount("text"),
        QualityProbe.markerCount("text", "the"), col("passes_gopher"))
      def fp(w: Double): Long = math.floor(w * 1e9 + 0.5).toLong
      val sp = s
      import sp.implicits._
      Seq((p.n, fp(p.w0), fp(p.w1), fp(p.w2)))
        .toDF("n_docs", "w0_fp", "w1_fp", "w2_fp")
    }),
    // scoring face: the fitted weights ride the plan as literals —
    // per-row codegen'd linear form, zero exchanges over the corpus
    "quality_probe_score" -> ((s, d) => {
      import graft.llm.QualityProbe
      val docs = t(s, d, "documents")
      val x1 = QualityProbe.tokenCount("text")
      val x2 = QualityProbe.markerCount("text", "the")
      val withG = TextAnalysis.withGopherSignals("text", Seq("the", "a"))(docs)
      val p = QualityProbe.trainRidge(withG, x1, x2, col("passes_gopher"))
      QualityProbe.withScores(docs, "doc_id", x1, x2, p)
    }),
    // eval face: confusion counts of the student's decision against
    // the teacher verdict — the distillation-fidelity number a
    // curation pipeline actually watches before swapping filters
    "quality_probe_eval" -> ((s, d) => {
      import graft.llm.QualityProbe
      val x1 = QualityProbe.tokenCount("text")
      val x2 = QualityProbe.markerCount("text", "the")
      val withG = TextAnalysis.withGopherSignals("text", Seq("the", "a"))(
        t(s, d, "documents"))
      val p = QualityProbe.trainRidge(withG, x1, x2, col("passes_gopher"))
      withG.select(col("passes_gopher").cast("int").as("label"),
          (QualityProbe.score(p, x1, x2) >= lit(0.5)).cast("int").as("pred"))
        .groupBy("label", "pred").agg(count(lit(1)).as("n_docs"))
    }),
    // probe lifecycle (round 18): drift-triggered refit check — a
    // FRESH probe trained on the current window (%2==1) compared
    // against the DEPLOYED one (%2==0): decision agreement over the
    // fresh window, quantized weight drift, refit verdict. One row;
    // the oracle refits BOTH probes in SQL (two suffixed HUGEINT
    // Cramer instantiations over the same feature CTEs) and replays
    // the agreement aggregate exactly
    "quality_probe_refit" -> ((s, d) => {
      import graft.llm.QualityProbe
      val x1 = QualityProbe.tokenCount("text")
      val x2 = QualityProbe.markerCount("text", "the")
      val withG = TextAnalysis.withGopherSignals("text", Seq("the", "a"))(
        t(s, d, "documents"))
      QualityProbe.refitReport(
        withG.where(col("doc_id") % 2 === 0),
        withG.where(col("doc_id") % 2 === 1),
        x1, x2, col("passes_gopher"))
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
    // collocation mining: adjacent-pair lift (exp-PMI) top-k, exact
    // integer factors + one IEEE division — no logs needed to rank
    "colloc_lift_topk" -> ((s, d) =>
      graft.llm.TextAnalysis.collocationTopK("text", k = 20, minPair = 3)(
        t(s, d, "documents"))),
  )

  /** Shared KN-model CTE prefix for text_kn_score / text_kn_buckets:
    * ref bigram counts + history/continuation rollups + the (T, V2)
    * scalar pair, then per-(doc, gram) fixed-point KN log-probs. The
    * gram probability mirrors [[graft.llm.LangModel.withKnScore]]'s
    * IEEE op order term for term — integer model counts are engine
    * identical, so the only cross-engine float op is the one ln per
    * gram the fixed-point quantization already tolerates.
    */
  /** The bigram MODEL half (toks -> counts -> rollups -> scalars),
    * shared by the bigram scorer and the trigram scorer's backoff
    * level.
    */
  private[graft] val knModelSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |bg AS (SELECT doc_id,
      |         CASE WHEN len(w) < 2 THEN [array_to_string(w, ' ')]
      |              ELSE list_transform(generate_series(1, len(w) - 1),
      |                     i -> concat_ws(' ', w[i], w[i+1])) END AS gs
      |       FROM toks),
      |refbg AS (SELECT g AS bg, CAST(count(*) AS BIGINT) AS cb
      |          FROM (SELECT unnest(gs) AS g FROM bg WHERE doc_id % 4 = 0) GROUP BY 1),
      |hist AS (SELECT string_split(bg, ' ')[1] AS w1,
      |                CAST(sum(cb) AS BIGINT) AS c1, CAST(count(*) AS BIGINT) AS n1l
      |         FROM refbg GROUP BY 1),
      |cont AS (SELECT sp[len(sp)] AS w2, CAST(count(*) AS BIGINT) AS n1r
      |         FROM (SELECT string_split(bg, ' ') AS sp FROM refbg) GROUP BY 1),
      |tv AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM refbg) AS tt,
      |              (SELECT CAST(count(*) AS BIGINT) FROM cont) AS v2),
      |""".stripMargin

  /** The trigram-scoring tail appended to [[knModelSql]] — shared
    * VERBATIM by text_kn3_score and text_kn3_incremental (the
    * merged two-order delta store must reproduce the from-scratch
    * model bit-for-bit, so the replay is one text).
    */
  private val kn3ScoreTail: String =
    """g3 AS (SELECT doc_id,
        |         CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
        |              ELSE list_transform(generate_series(1, len(w) - 2),
        |                     i -> concat_ws(' ', w[i], w[i+1], w[i+2])) END AS gs
        |       FROM toks),
        |reftri AS (SELECT g AS tg, CAST(count(*) AS BIGINT) AS c3
        |           FROM (SELECT unnest(gs) AS g FROM g3 WHERE doc_id % 4 = 0) GROUP BY 1),
        |hist3 AS (SELECT CASE WHEN len(sp) >= 2 THEN array_to_string(sp[1:len(sp)-1], ' ')
        |                      ELSE '' END AS h2,
        |                 CAST(sum(c3) AS BIGINT) AS c2h, CAST(count(*) AS BIGINT) AS n1l3
        |          FROM (SELECT string_split(tg, ' ') AS sp, c3 FROM reftri) GROUP BY 1),
        |docg AS (SELECT doc_id, tg,
        |           sp[len(sp)] AS w3,
        |           CASE WHEN len(sp) >= 2 THEN sp[len(sp)-1] ELSE '' END AS w2,
        |           CASE WHEN len(sp) >= 2 THEN array_to_string(sp[1:len(sp)-1], ' ')
        |                ELSE '' END AS h2,
        |           concat(CASE WHEN len(sp) >= 2 THEN sp[len(sp)-1] ELSE '' END,
        |                  ' ', sp[len(sp)]) AS bg
        |         FROM (SELECT doc_id, g AS tg, string_split(g, ' ') AS sp
        |               FROM (SELECT doc_id, unnest(gs) AS g FROM g3))),
        |sc AS (SELECT doc_id,
        |         CAST(floor(ln(
        |           CASE WHEN COALESCE(c2h, 0) > 0 THEN
        |             (greatest(CAST(COALESCE(c3, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE),
        |                       CAST(0.0 AS DOUBLE))
        |              + CAST(0.75 AS DOUBLE) * CAST(COALESCE(n1l3, 0) AS DOUBLE)
        |                * (CASE WHEN COALESCE(c1, 0) > 0 THEN
        |             (greatest(CAST(COALESCE(cb, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE),
        |                       CAST(0.0 AS DOUBLE))
        |              + CAST(0.75 AS DOUBLE) * CAST(COALESCE(n1l, 0) AS DOUBLE)
        |                * (CAST(COALESCE(n1r, 0) + 1 AS DOUBLE) / CAST(tt + v2 + 1 AS DOUBLE)))
        |             / CAST(c1 AS DOUBLE)
        |           ELSE CAST(COALESCE(n1r, 0) + 1 AS DOUBLE) / CAST(tt + v2 + 1 AS DOUBLE)
        |           END)) / CAST(c2h AS DOUBLE)
        |           ELSE (CASE WHEN COALESCE(c1, 0) > 0 THEN
        |             (greatest(CAST(COALESCE(cb, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE),
        |                       CAST(0.0 AS DOUBLE))
        |              + CAST(0.75 AS DOUBLE) * CAST(COALESCE(n1l, 0) AS DOUBLE)
        |                * (CAST(COALESCE(n1r, 0) + 1 AS DOUBLE) / CAST(tt + v2 + 1 AS DOUBLE)))
        |             / CAST(c1 AS DOUBLE)
        |           ELSE CAST(COALESCE(n1r, 0) + 1 AS DOUBLE) / CAST(tt + v2 + 1 AS DOUBLE)
        |           END) END) * 1000000.0 + 0.5) AS BIGINT) AS lp
        |       FROM docg LEFT JOIN reftri USING (tg) LEFT JOIN hist3 USING (h2)
        |            LEFT JOIN refbg ON docg.bg = refbg.bg
        |            LEFT JOIN hist ON docg.w2 = hist.w1
        |            LEFT JOIN cont ON docg.w3 = cont.w2
        |            CROSS JOIN tv)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_trigrams,
        |       CAST(sum(lp) AS BIGINT) AS logprob_sum_fp
        |FROM sc GROUP BY 1""".stripMargin

  private val knScoreSql: String = knModelSql +
    """docg AS (SELECT doc_id, bg, sp[1] AS w1, sp[len(sp)] AS w2
      |         FROM (SELECT doc_id, g AS bg, string_split(g, ' ') AS sp
      |               FROM (SELECT doc_id, unnest(gs) AS g FROM bg))),
      |sc AS (SELECT doc_id,
      |         CAST(floor(ln(
      |           CASE WHEN COALESCE(c1, 0) > 0 THEN
      |             (greatest(CAST(COALESCE(cb, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE),
      |                       CAST(0.0 AS DOUBLE))
      |              + CAST(0.75 AS DOUBLE) * CAST(COALESCE(n1l, 0) AS DOUBLE)
      |                * (CAST(COALESCE(n1r, 0) + 1 AS DOUBLE) / CAST(tt + v2 + 1 AS DOUBLE)))
      |             / CAST(c1 AS DOUBLE)
      |           ELSE CAST(COALESCE(n1r, 0) + 1 AS DOUBLE) / CAST(tt + v2 + 1 AS DOUBLE)
      |           END) * 1000000.0 + 0.5) AS BIGINT) AS lp
      |       FROM docg LEFT JOIN refbg USING (bg) LEFT JOIN hist USING (w1)
      |            LEFT JOIN cont USING (w2) CROSS JOIN tv)
      |""".stripMargin

  /** Shared ridge-probe CTE prefix for the quality_probe_* gates:
    * integer features + weak label, exact BIGINT normal-equation
    * sums, HUGEINT Cramer determinants (the query's BigInt twin — 3
    * sums of ~1e10 multiply to ~1e30, past int64), and the weight
    * derivation as ONE double division per weight, mirroring
    * [[graft.llm.QualityProbe.trainRidge]] exactly.
    */
  private[graft] val probeFeatSql: String =
    """WITH gb AS (
      |  SELECT doc_id, text, string_split(COALESCE(text, ''), ' ') AS w,
      |         string_split(COALESCE(text, ''), chr(10)) AS l
      |  FROM documents),
      |gm AS (
      |  SELECT doc_id, w,
      |    CAST(len(w) AS INTEGER) AS n_words,
      |    CAST(list_aggregate(list_transform(w, t -> length(t)), 'sum') AS DOUBLE) / len(w) AS mean_word_len,
      |    CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(w) AS frac_alpha_words,
      |    (CAST(length(text) - length(regexp_replace(text, '#', '', 'g')) AS DOUBLE)
      |      + (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) / 3) / len(w) AS symbol_ratio,
      |    CAST(len(list_filter(l, x -> substr(x, 1, 1) IN ('-', '*', '•'))) AS DOUBLE) / len(l) AS frac_bullet_lines,
      |    CAST(len(list_filter(l, x -> ends_with(x, '...') OR ends_with(x, '…'))) AS DOUBLE) / len(l) AS frac_ellipsis_lines,
      |    CAST(len(list_filter(list_distinct(list_transform(w, t -> lower(t))),
      |      t -> list_contains(['the','a'], t))) AS INTEGER) AS n_stopwords_present
      |  FROM gb),
      |f AS (SELECT doc_id,
      |    CAST(len(w) AS BIGINT) AS x1,
      |    CAST(len(list_filter(w, t -> t = 'the')) AS BIGINT) AS x2,
      |    CAST(CASE WHEN n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
      |      AND symbol_ratio <= 0.1 AND frac_bullet_lines <= 0.9 AND frac_ellipsis_lines <= 0.3
      |      AND frac_alpha_words > 0.8 AND n_stopwords_present >= 2
      |      THEN 1 ELSE 0 END AS BIGINT) AS y
      |  FROM gm),
      |""".stripMargin

  /** One ridge fit as CTEs (normal-equation sums over `f`, HUGEINT
    * Cramer, the weight divisions), name-suffixed so a replay can fit
    * TWO probes over different row filters in one statement (the
    * quality_probe_refit gate) while the unsuffixed instantiation
    * keeps the original quality_probe_* oracles' text.
    */
  private[graft] def probeFitCtes(sfx: String, where: String): String =
    s"""s$sfx AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |        CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
       |        CAST(sum(x1*x1) AS BIGINT) AS s11, CAST(sum(x1*x2) AS BIGINT) AS s12,
       |        CAST(sum(x2*x2) AS BIGINT) AS s22,
       |        CAST(sum(y) AS BIGINT) AS b0, CAST(sum(x1*y) AS BIGINT) AS b1,
       |        CAST(sum(x2*y) AS BIGINT) AS b2
       |      FROM f $where),
       |a$sfx AS (SELECT n,
       |        CAST(n + 1 AS HUGEINT) AS a00, CAST(s1 AS HUGEINT) AS a01,
       |        CAST(s2 AS HUGEINT) AS a02, CAST(s11 + 1 AS HUGEINT) AS a11,
       |        CAST(s12 AS HUGEINT) AS a12, CAST(s22 + 1 AS HUGEINT) AS a22,
       |        CAST(b0 AS HUGEINT) AS c0, CAST(b1 AS HUGEINT) AS c1,
       |        CAST(b2 AS HUGEINT) AS c2
       |      FROM s$sfx),
       |dets$sfx AS (SELECT n,
       |    a00*(a11*a22 - a12*a12) - a01*(a01*a22 - a12*a02) + a02*(a01*a12 - a11*a02) AS det,
       |    c0*(a11*a22 - a12*a12) - a01*(c1*a22 - a12*c2) + a02*(c1*a12 - a11*c2) AS det0,
       |    a00*(c1*a22 - a12*c2) - c0*(a01*a22 - a12*a02) + a02*(a01*c2 - c1*a02) AS det1,
       |    a00*(a11*c2 - c1*a12) - a01*(a01*c2 - c1*a02) + c0*(a01*a12 - a11*a02) AS det2
       |  FROM a$sfx),
       |w$sfx AS (SELECT n,
       |        CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) AS w0,
       |        CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) AS w1,
       |        CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) AS w2
       |      FROM dets$sfx)
       |""".stripMargin

  private val probeSql: String = probeFeatSql + probeFitCtes("", "")

  val oracleSql: Map[String, String] = reg(
    "quality_probe_train" -> (probeSql +
      """SELECT CAST(n AS BIGINT) AS n_docs,
        |  CAST(floor(w0 * 1000000000.0 + 0.5) AS BIGINT) AS w0_fp,
        |  CAST(floor(w1 * 1000000000.0 + 0.5) AS BIGINT) AS w1_fp,
        |  CAST(floor(w2 * 1000000000.0 + 0.5) AS BIGINT) AS w2_fp
        |FROM w""".stripMargin),
    "quality_probe_score" -> (probeSql +
      """SELECT doc_id,
        |  CAST(floor((w0 + w1 * CAST(x1 AS DOUBLE) + w2 * CAST(x2 AS DOUBLE))
        |       * 1000000.0 + 0.5) AS BIGINT) AS score_fp,
        |  CAST(CASE WHEN w0 + w1 * CAST(x1 AS DOUBLE) + w2 * CAST(x2 AS DOUBLE) >= 0.5
        |       THEN 1 ELSE 0 END AS INTEGER) AS pred
        |FROM f CROSS JOIN w""".stripMargin),
    // two suffixed fits over the same features, then the agreement
    // aggregate and drift deltas — every term either an exact integer
    // or one fixed-order float op on exactly-derived doubles
    "quality_probe_refit" -> (probeFeatSql +
      probeFitCtes("d", "WHERE doc_id % 2 = 0").stripSuffix("\n") + ",\n" +
      probeFitCtes("fr", "WHERE doc_id % 2 = 1").stripSuffix("\n") + ",\n" +
      """ag AS (SELECT CAST(count(*) AS BIGINT) AS n_fresh,
        |  CAST(sum(CASE WHEN
        |    (wd.w0 + wd.w1 * CAST(x1 AS DOUBLE) + wd.w2 * CAST(x2 AS DOUBLE) >= 0.5)
        |    = (wfr.w0 + wfr.w1 * CAST(x1 AS DOUBLE) + wfr.w2 * CAST(x2 AS DOUBLE) >= 0.5)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_agree
        |  FROM f CROSS JOIN wd CROSS JOIN wfr WHERE doc_id % 2 = 1)
        |SELECT wd.n AS n_deployed, ag.n_fresh, ag.n_agree,
        |  CAST(ag.n_agree AS DOUBLE) / ag.n_fresh AS agree_frac,
        |  CAST(floor((wfr.w0 - wd.w0) * 1000000000.0 + 0.5) AS BIGINT) AS dw0_fp,
        |  CAST(floor((wfr.w1 - wd.w1) * 1000000000.0 + 0.5) AS BIGINT) AS dw1_fp,
        |  CAST(floor((wfr.w2 - wd.w2) * 1000000000.0 + 0.5) AS BIGINT) AS dw2_fp,
        |  CAST(CASE WHEN CAST(ag.n_agree AS DOUBLE) / ag.n_fresh < 0.98
        |       THEN 1 ELSE 0 END AS INTEGER) AS refit
        |FROM ag CROSS JOIN wd CROSS JOIN wfr""".stripMargin),
    "quality_probe_eval" -> (probeSql +
      """SELECT CAST(y AS INTEGER) AS label,
        |  CAST(CASE WHEN w0 + w1 * CAST(x1 AS DOUBLE) + w2 * CAST(x2 AS DOUBLE) >= 0.5
        |       THEN 1 ELSE 0 END AS INTEGER) AS pred,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM f CROSS JOIN w GROUP BY 1, 2""".stripMargin),
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
    "text_tokens_bpe" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '[^\p{L}\p{N}]+'), t -> length(t) > 0)) AS INTEGER) AS n_bpe_tokens
        |FROM documents""".stripMargin,
    "text_pii_scan" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS INTEGER) AS n_emails,
        |  CAST(len(regexp_extract_all(text, 'https?://[A-Za-z0-9./_%?&=-]+')) AS INTEGER) AS n_urls
        |FROM documents""".stripMargin,
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
    "text_bpe_encode" -> bpeEncodeOracle(bpeMerges),
    // the trainer replay: see QueryHelpers.bpeTrainOracle — chained
    // recursive encodes whose merge tables are COMPUTED CTEs
    "text_bpe_train" -> bpeTrainOracle(4),
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
    // interpolated-KN replay: model terms (cb/c1/n1l/n1r/T/V2) are
    // integer aggregates — identical in both engines — and the per
    // gram probability repeats the query's exact IEEE op order
    // (greatest-discount + 0.75*n1l*pcont, one division, one ln)
    "text_kn_score" -> (knScoreSql +
      """SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
        |       CAST(sum(lp) AS BIGINT) AS logprob_sum_fp
        |FROM sc GROUP BY 1""".stripMargin),
    // head/middle/tail replay: DuckDB's native ntile over the same
    // (mean desc, doc_id) total order — the query's two-phase rank +
    // closed-form boundary must land every doc in the same tertile
    // trigram replay: the bigram model CTEs verbatim + trigram
    // counts/history; P2 (the full bigram-KN formula on (w2, w3))
    // appears twice textually — same exact value both places
    "text_kn3_score" -> (knModelSql + kn3ScoreTail),
    // incremental face: merged count-delta store == from-scratch
    // model, so the replay is text_kn_score's verbatim
    "text_kn_incremental" -> (knScoreSql +
      """SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
        |       CAST(sum(lp) AS BIGINT) AS logprob_sum_fp
        |FROM sc GROUP BY 1""".stripMargin),
    // trigram incremental face: merged two-order delta store ==
    // from-scratch model — text_kn3_score's replay verbatim
    "text_kn3_incremental" -> (knModelSql +
      TextQueries.kn3ScoreTail),
    // erase face: seed(%2==0) minus erased(%4==2) == from-scratch
    // survivors(%4==0) — the same verbatim replay again; additivity
    // makes deletion exact, the positive filter makes it census-exact
    "text_kn_erase" -> (knScoreSql +
      """SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
        |       CAST(sum(lp) AS BIGINT) AS logprob_sum_fp
        |FROM sc GROUP BY 1""".stripMargin),
    "text_kn_buckets" -> (knScoreSql +
      """,d2 AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS nb,
        |            CAST(sum(lp) AS BIGINT) AS lps
        |     FROM sc GROUP BY 1),
        |rk AS (SELECT lps, nb, ntile(3) OVER (
        |         ORDER BY CAST(lps AS DOUBLE) / CAST(nb AS DOUBLE) DESC, doc_id) AS bucket
        |       FROM d2)
        |SELECT CAST(bucket AS INTEGER) AS bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(lps) AS BIGINT) AS sum_logprob_fp,
        |       CAST(sum(nb) AS BIGINT) AS sum_bigrams
        |FROM rk GROUP BY 1""".stripMargin),
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
  )
}
