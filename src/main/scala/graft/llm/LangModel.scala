package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bigram language-model fluency scoring — the CCNet-style perplexity
  * quality filter (Wenzek et al. 2020, public): score every document
  * by its mean log-probability under an n-gram model trained on a
  * trusted reference corpus (Wikipedia-class), and drop or bucket the
  * worst tail. The fluency complement of [[Dsir]]: DSIR asks "is this
  * doc shaped like the target domain", this asks "is this doc fluent
  * text at all" — gibberish, boilerplate soup, and OCR noise score
  * low under both smooth and domain-matched references.
  *
  * Model: add-1-smoothed bigram conditionals over the reference,
  * `P(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V)` with `V` the reference
  * unigram vocabulary size; a document scores
  * `Σ_bigrams ln P / n_bigrams` (bigrams via [[Dedup.shingles]] k=2,
  * so sub-2-token docs contribute their whole text as one "bigram" —
  * every doc gets a row). Unseen histories fall back to `1/(0+V)` —
  * the add-1 floor — so the score is total.
  *
  * Scale shape, the [[Dsir]] contract:
  *  - the model is TWO aggregations over the reference (bigram
  *    counts, unigram counts), each bounded by the reference's
  *    observed-gram vocabulary, not the corpus — a curated reference
  *    is Wikipedia-sized, so its gram tables broadcast or at worst
  *    shuffle as (gram, count) pairs;
  *  - scoring is one explode pass over the corpus: (doc, bigram)
  *    rows join the model tables and partially aggregate back to one
  *    row per doc — only gram strings and longs ever shuffle;
  *  - V is a 1-row aggregate broadcast (the SUMEQ shape).
  *
  * Engine-portable determinism: each bigram's log-conditional is
  * quantized to fixed point ONCE (`floor(ln(·)·fpScale + ½)` as
  * long — micro-nats at the default scale), so the per-doc score is
  * an INTEGER sum, partitioning-invariant and bit-replayable by the
  * DuckDB oracle; the only cross-engine float op is one `ln` per
  * distinct (history, word) pair.
  */
object LangModel {

  /** Per-document fluency: `n_bigrams` and the fixed-point sum of
    * add-1 bigram log-conditionals under `ref`'s model
    * (`logprob_sum_fp`, micro-nats; closer to 0 = more fluent).
    * Callers derive mean log-prob as `logprob_sum_fp / (fpScale ·
    * n_bigrams)` and perplexity as `exp(−mean)`.
    */
  def withLmScore(
      df: DataFrame,
      ref: DataFrame,
      idCol: String,
      textCol: String,
      fpScale: Double = 1e6): DataFrame = {
    val refBigrams = ref.select(explode(Dedup.shingles(textCol, 2)).as("__bg"))
      .groupBy("__bg").agg(count(lit(1)).as("__cb"))
    val refUnigrams = ref.select(explode(TextAnalysis.tokens(col(textCol))).as("__w1"))
      .groupBy("__w1").agg(count(lit(1)).as("__cu"))
    val vocab = refUnigrams.agg(count(lit(1)).as("__v"))

    // NULL text → '' → the short-doc rule's single empty gram, so
    // every doc gets a row (explode(NULL) would silently omit it,
    // breaking the documented totality)
    val docBigrams = df.select(col(idCol), explode(
        Dedup.shinglesOf(coalesce(col(textCol).cast("string"), lit("")), 2)).as("__bg"))
      .withColumn("__w1", substring_index(col("__bg"), " ", 1))
    val scored = docBigrams
      .join(refBigrams, Seq("__bg"), "left")
      .join(refUnigrams, Seq("__w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp_fp",
        floor(log((coalesce(col("__cb"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("__cu"), lit(0L)) + col("__v"))) * lit(fpScale) + lit(0.5))
          .cast("long"))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_bigrams"),
        sum("__lp_fp").as("logprob_sum_fp"))
  }
}
