package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{ParquetResolver, StudyRunner, Interpreter, PipelineContext}
import graft.io.{ConfigReader, Export, NestedStore, Standardized}
import graft.llm.{Dedup, Multimodal, Similarity, Sketch, TextAnalysis}
import graft.model._
import graft.ops.Ops

/** Shared plumbing for the per-family query registries and
  * SparkEntry's driver-contract members: table readers, scratch dirs,
  * derived frames with their oracle-side SQL twins, the memoized IVF
  * model, and the LSH/SimHash oracle builders. Everything here was
  * `private` inside SparkEntry before the round-13 registry split;
  * the object is private[graft] so nothing leaks past the library.
  */
private[graft] object QueryHelpers {

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Registry-literal constructor: a `Map(...)` literal silently
    * last-wins on a duplicated key, and ContractSpec's cross-registry
    * disjointness gate (sum-of-sizes vs merged size) cannot see a
    * duplicate WITHIN one registry's literal — the varargs pairs are
    * gone by the time the Map exists. Building from the pairs keeps
    * the literal syntax identical while asserting distinctness loudly
    * at object init, so an accidental intra-file duplicate fails every
    * test that touches the registry, with the offending name.
    */
  def reg[V](pairs: (String, V)*): Map[String, V] = {
    val dups = pairs.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"duplicate query name(s) within a registry literal: ${dups.mkString(", ")}")
    pairs.toMap
  }

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
  def scratch(name: String): String = s"$scratchRoot/$name"

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

  /** Trained BPE merge table, memoized per (data dir, listing digest)
    * — the [[ivfModel]] discipline: the bpe_fertility_trained query
    * and its Verify-time dynamic oracle must encode under the SAME
    * table (training is deterministic, but sharing the object removes
    * even that assumption), and Bench avoids re-training per rep.
    * Training itself is independently gated (text_bpe_train's DuckDB
    * replay of the full iterated argmax).
    */
  val bpeModels = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Seq[TextAnalysis.BpeMerge]]()
  def trainedBpe(s: SparkSession, d: String): Seq[TextAnalysis.BpeMerge] = {
    val key = (d, listingDigest(new java.io.File(s"$d/documents.parquet")))
    bpeModels.computeIfAbsent(key,
      _ => TextAnalysis.trainBpeMerges("text", nMerges = 12)(t(s, d, "documents")))
  }

  /** The text_bpe_encode replay parameterized by its merge table —
    * shared by the static oracle (the fixed [[bpeMerges]]) and the
    * TRAINED face's dynamic oracle, so the encode semantics can never
    * drift between them. See text_bpe_encode's comment for why the
    * recursive form is faithful to the greedy rank loop.
    */
  def bpeEncodeOracle(merges: Seq[(String, String)]): String = {
    require(merges.nonEmpty, "bpeEncodeOracle needs at least one merge")
    def esc(s: String) = s.replace("'", "''")
    s"""WITH RECURSIVE m(rank, a, b) AS (
       |  SELECT * FROM (VALUES ${merges.zipWithIndex
          .map { case ((a, b), i) => s"($i, '${esc(a)}', '${esc(b)}')" }.mkString(", ")}) v),
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
       |FROM documents d JOIN cnt c USING (doc_id)""".stripMargin
  }

  /** Independent DuckDB replay of [[TextAnalysis.trainBpeMerges]] for
    * `k` iterations: distinct-word frequency table once, then per
    * iteration a full recursive re-encode of the vocab under the
    * merges derived SO FAR (each m{t} CTE is the weighted argmax over
    * e{t}, and e{t} encodes with m1..m{t-1} — the merge table is a
    * COMPUTED CTE, not a literal, so the oracle derives the whole
    * trajectory itself). Tie-break and the freq >= 2 floor mirror the
    * trainer. Built programmatically because the chained encode CTEs
    * are mechanical.
    */
  def bpeTrainOracle(k: Int): String = {
    require(k >= 1, s"bad k=$k")
    val sb = new StringBuilder
    sb ++= """WITH RECURSIVE wc AS (
             |  SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
             |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
             |  WHERE length(w) >= 2 GROUP BY 1),
             |e1 AS (SELECT w, n,
             |         list_transform(generate_series(1, length(w)), j -> w[j]) AS p
             |       FROM wc)""".stripMargin
    def argmax(rank: Int, encName: String): String =
      s"""m${rank + 1} AS (
         |  SELECT $rank AS rank, l, r, freq FROM (
         |    SELECT p[g.j] AS l, p[g.j + 1] AS r, SUM(n) AS freq
         |    FROM $encName, LATERAL (SELECT unnest(generate_series(1, len(p) - 1)) AS j) g
         |    GROUP BY 1, 2)
         |  WHERE freq >= 2
         |  ORDER BY freq DESC, l, r LIMIT 1)""".stripMargin
    sb ++= ",\n" + argmax(0, "e1")
    (2 to k).foreach { t =>
      val mu = (1 until t).map(i => s"SELECT * FROM m$i").mkString(" UNION ALL ")
      sb ++= s""",
                |mu$t AS ($mu),
                |enc$t(w, n, p, it) AS (
                |  SELECT w, n,
                |    list_transform(generate_series(1, length(w)), j -> w[j]), 0
                |  FROM wc
                |  UNION ALL
                |  SELECT w, n,
                |    p[1:pos.j - 1] || [p[pos.j] || p[pos.j + 1]] || p[pos.j + 2:], it + 1
                |  FROM enc$t,
                |    LATERAL (SELECT l, r FROM mu$t
                |             WHERE len(list_filter(generate_series(1, len(p) - 1),
                |                                   j -> p[j] = mu$t.l AND p[j + 1] = mu$t.r)) > 0
                |             ORDER BY rank LIMIT 1) best,
                |    LATERAL (SELECT min(j) AS j
                |             FROM (SELECT unnest(generate_series(1, len(p) - 1)) AS j) tt
                |             WHERE p[j] = best.l AND p[j + 1] = best.r) pos
                |  WHERE it < 90),
                |e$t AS (SELECT w, n, p FROM (
                |  SELECT w, n, p, row_number() OVER (PARTITION BY w ORDER BY it DESC) AS rn
                |  FROM enc$t) WHERE rn = 1)""".stripMargin
      sb ++= ",\n" + argmax(t - 1, s"e$t")
    }
    sb ++= "\nSELECT CAST(rank AS INTEGER) AS rank, l AS lhs, r AS rhs, CAST(freq AS BIGINT) AS freq FROM (\n" +
      (1 to k).map(i => s"  SELECT * FROM m$i").mkString(" UNION ALL\n") + ")"
    sb.toString
  }

  /** The testdata has no physical nulls, so null-exercising ops run
    * on this frame: customer ⟕ per-customer max "big order" total —
    * `big_total` is null for customers without a >200k order.
    */
  def nullBase(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "orders")
      .filter(col("o_totalprice") > 200000)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(max(col("o_totalprice")).as("big_total"))
    t(s, dir, "customer").join(big, Seq("c_custkey"), "left")
  }

  val nullBaseSql =
    """customer LEFT JOIN (SELECT o_custkey AS c_custkey, max(o_totalprice) AS big_total
      |  FROM orders WHERE o_totalprice > 200000 GROUP BY 1) b USING (c_custkey)""".stripMargin

  /** documents ∪ shifted-id copy — gives every text exactly two ids,
    * so exact-dedup has real work to do.
    */
  def doubledDocs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.unionByName(d.withColumn("doc_id", col("doc_id") + 10000))
  }

  val doubledDocsSql =
    "(SELECT * FROM documents UNION ALL SELECT doc_id + 10000 AS doc_id, text, lang, source, n_chars FROM documents)"

  /** Shared by dedup_threshold_curve and its capped twin: the cap (16)
    * exceeds the gate corpus's hottest shingle df (7), so both gates
    * compare against the SAME uncapped SQL — the oracle hash-proves
    * capped==uncapped whenever no shingle exceeds the cap.
    */
  val thresholdCurveSql =
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
  def eventsNanos(s: SparkSession, dir: String): DataFrame = {
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
  val ivfModels = new java.util.concurrent.ConcurrentHashMap[(String, String), graft.llm.Ivf.IvfModel]()
  def listingDigest(root: java.io.File): String = {
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
  def ivfModel(s: SparkSession, d: String): graft.llm.Ivf.IvfModel = {
    val key = (d, listingDigest(new java.io.File(s"$d/embeddings.parquet")))
    ivfModels.computeIfAbsent(key, _ => graft.llm.Ivf.train(t(s, d, "embeddings"), "embedding", k = 16))
  }

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
  lazy val annPlanes = Similarity.hyperplanes(dim = 64, nPlanes = 8, seed = 42L)

  /** Sign-LSH bucket id over a DuckDB DOUBLE[] expression: bit p =
    * (v · plane_p) > 0, packed — same arithmetic as
    * [[Similarity.lshBucket]] (list_inner_product and Spark's
    * aggregate both fold ascending-index, so the signs agree exactly).
    */
  def duckBucketExpr(v: String): String =
    annPlanes.zipWithIndex.map { case (plane, p) =>
      s"(CASE WHEN list_inner_product($v, [${plane.mkString(",")}]) > 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** Multi-probe bucket list: self plus every Hamming-1 neighbour. */
  def duckProbeList(b: String): String =
    s"[$b${(0 until annPlanes.length).map(i => s", xor($b, ${1L << i})").mkString}]"

  val duckCosine = (x: String, y: String) =>
    s"list_inner_product($x, $y) / (sqrt(list_inner_product($x, $x)) * sqrt(list_inner_product($y, $y)))"

  def annTopKOracle: String =
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

  def embeddingNearDupOracle: String =
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
  def cdcChunksCte: String =
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

  def simhashPairsOracle: String = {
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

}
