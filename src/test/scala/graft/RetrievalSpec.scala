package graft

import graft.llm.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "spark spark spark row row table"),    // common term, repeated
    (2L, "needle row table scan"),              // rare term, short doc
    (3L, "needle needle row table scan merge"), // rare term, higher tf
    (4L, "row table scan merge sort hash"),     // no query term
    (5L, "spark needle")                        // both terms, shortest doc
  ).toDF("doc_id", "text")

  test("bm25 ranks rare-term docs above common-term docs (idf dominance)") {
    val out = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("needle", "spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // doc 4 matches nothing -> absent; every other doc scored
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L, 5L))
    val score = out.map(t => t._1 -> t._3).toMap
    // 'needle' (df=3) carries more idf than 'spark' (df=2)? No — with
    // N=5: idf(spark, df=2)=ln(1+3.5/2.5) > idf(needle, df=3)=ln(1+2.5/3.5).
    // The structural facts that must hold regardless of constants:
    // doc 5 matches BOTH terms in the shortest doc -> top rank
    assert(out.head._1 == 5L && out.head._2 == 2)
    // doc 3 beats doc 2: same term, higher tf, comparable length
    assert(score(3L) > score(2L))
    // every score positive, ranking strictly ordered by (score desc, id)
    assert(out.map(_._3).forall(_ > 0))
    assert(out.sameElements(out.sortBy(t => (-t._3, t._1))))
  }

  test("bm25 matches the hand-computed closed form on a 2-doc corpus") {
    val two = Seq((1L, "a b"), (2L, "a a a b c d")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(two, "doc_id", "text", Seq("a"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val (k1, b) = (1.2, 0.75)
    val avgdl = 4.0 // (2 + 6) / 2
    val idf = math.log((2 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def s(tf: Long, dl: Long): Long =
      math.floor(idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))) * 1e6 + 0.5).toLong
    assert(out == Map(1L -> s(1, 2), 2L -> s(3, 6)))
  }

  test("bm25 collapses duplicate query terms and requires a non-empty query") {
    val once = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("spark"), k = 10).collect()
    val dup = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("spark", "spark"), k = 10).collect()
    assert(once.sameElements(dup))
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(corpus, "doc_id", "text", Seq.empty, k = 10)
    }
  }

  test("hybrid RRF: both-list docs outrank single-list docs; exact reciprocal sums") {
    val docs = Seq(
      (0L, "alpha beta"),           // probe doc: no query term, sem rank 1 (self)
      (1L, "needle needle gamma"),  // lex rank 1, sem rank 2
      (2L, "needle delta"),         // lex rank 2, sem rank 4
      (3L, "plain words")           // sem rank 3 only
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.9, 0.1)),
      (2L, Array(0.0, 1.0)), (3L, Array(0.6, 0.4))
    ).toDF("doc_id", "embedding")
    val out = Retrieval.hybridTopK(docs, emb, "doc_id", "text", "embedding",
      Seq("needle"), probeId = 0L, k = 4, candidates = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    // doc 1 (in both lists) wins; doc 2 (both, lower) second; then
    // the sem-only docs by their single reciprocal
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 0L, 3L), out.mkString(","))
    assert(out(0)._2 == 1.0 / 61 + 1.0 / 62)
    assert(out(1)._2 == 1.0 / 62 + 1.0 / 64)
    assert(out(2)._2 == 1.0 / 61 && out(3)._2 == 1.0 / 63)
  }

  test("bm25 plan: term filter lands below every shuffle (postings-only exchange)") {
    // every shuffle carrying postings (a `term` column in its key)
    // must have the term filter BELOW it — i.e. only matching postings
    // are exchanged, never the full gram stream. The 1-row corpus-
    // stats exchange has no term column and is exempt by construction.
    // String-walk the tree (the AQE wrapper hides its subtree from
    // collect() until execution); subtree scope = deeper marker indent.
    val tree = Retrieval.bm25TopK(corpus, "doc_id", "text", Seq("needle"), k = 5)
      .queryExecution.executedPlan.treeString
    val lines = tree.split("\n")
    // node depth = where the node name starts, past the " :+-" tree
    // prefix (a first-':' index would misread nested branch lines)
    def depth(l: String): Int = l.indexWhere(c => !" :+-".contains(c))
    val exchangeIdxs = lines.zipWithIndex.collect {
      case (l, i) if l.contains("Exchange hashpartitioning") && l.contains("term#") => i
    }
    assert(exchangeIdxs.nonEmpty, s"expected a postings shuffle in:\n$tree")
    val offending = exchangeIdxs.filterNot { i =>
      val d = depth(lines(i))
      lines.drop(i + 1)
        .takeWhile(l => depth(l) > d)
        .exists(l => l.contains("Filter") && l.contains("needle"))
    }
    assert(offending.isEmpty,
      s"postings shuffle without the term filter below it (lines $offending):\n$tree")
  }
}
