package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bpe_encode(word, merges)` — apply a RANKED byte-pair-merge
  * table to one pretokenized word, returning its BPE token array.
  * This is the ENCODE side of BPE ([[graft.llm.TextAnalysis
  * .bpePairCounts]] is one TRAINING step): token budgets, packing
  * manifests, and mixture weights all consume token counts under the
  * production tokenizer, and a whitespace count can be off 2-5× from
  * the real number — the encode loop is what makes those numbers
  * honest.
  *
  * Algorithm (the standard greedy BPE encode, Sennrich 2016 /
  * GPT-2's bpe()): split the word into code points, then repeatedly
  * find the LOWEST-RANK merge whose pair occurs adjacently and merge
  * all its occurrences left-to-right (non-overlapping), until no
  * merge applies. Left-to-right non-overlap on repeats: encoding
  * "aaa" under merge (a,a) gives [aa, a]. The DuckDB oracle replays
  * the identical loop as a recursive CTE (separator-joined parts +
  * ordered `replace`, which is also left-to-right non-overlapping).
  *
  * `merges` must be a FOLDABLE array<array<string>> literal of
  * [a, b] pairs in rank order (rank = position) — the merge table is
  * decoded once per executor, not per row, and ships with the plan
  * exactly like the IVF centroid literals ([[NearestCentroids]],
  * same CodegenFallback trade: the per-row cost is the merge loop
  * itself, not expression dispatch). Scale shape: pure row-local
  * compute, zero shuffles, linear in input splits.
  */
case class BpeEncode(word: Expression, merges: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(word, merges)

  override def checkInputDataTypes(): TypeCheckResult =
    if (word.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string word, got ${word.dataType.simpleString}")
    else if (!merges.foldable ||
      merges.dataType != ArrayType(ArrayType(StringType, true), true) &&
      merges.dataType != ArrayType(ArrayType(StringType, false), false))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable array<array<string>> merge table, got ${merges.sql}")
    else TypeCheckResult.TypeCheckSuccess

  // rank map decoded once (lazily, off the foldable literal)
  @transient private lazy val rankOf: java.util.HashMap[(String, String), Int] = {
    val raw = merges.eval(null)
    require(raw != null, s"$prettyName merge table must not be null")
    val arr = raw.asInstanceOf[ArrayData]
    val m = new java.util.HashMap[(String, String), Int]()
    var i = 0
    while (i < arr.numElements()) {
      val pair = arr.getArray(i)
      require(pair != null && pair.numElements() == 2,
        s"$prettyName merge $i must be a non-null [a, b] pair")
      require(!pair.isNullAt(0) && !pair.isNullAt(1),
        s"$prettyName merge $i contains a null side")
      val key = (pair.getUTF8String(0).toString, pair.getUTF8String(1).toString)
      if (!m.containsKey(key)) m.put(key, i) // first occurrence wins the rank
      i += 1
    }
    m
  }

  override def eval(input: InternalRow): Any = {
    val w = word.eval(input)
    if (w == null) return null
    new GenericArrayData(
      BpeEncode.encode(w.asInstanceOf[UTF8String].toString, rankOf)
        .map(UTF8String.fromString))
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = word.nullable
  override def prettyName: String = "graft_bpe_encode"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BpeEncode =
    copy(word = newChildren(0), merges = newChildren(1))
}

object BpeEncode {
  /** The greedy merge loop, shared with tests. */
  def encode(word: String, rankOf: java.util.HashMap[(String, String), Int]): Array[String] = {
    if (word.isEmpty) return Array.empty
    var parts: Array[String] =
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var continue = parts.length > 1
    while (continue) {
      // track the winning pair DURING the scan — recovering it from
      // the rank map afterwards would walk the whole merge table
      // (50k entries for a production tokenizer) every round
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < parts.length - 1) {
        val key = (parts(i), parts(i + 1))
        val r = rankOf.getOrDefault(key, Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = key }
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        // merge every left-to-right non-overlapping occurrence
        val out = Array.newBuilder[String]
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && parts(j) == best._1 && parts(j + 1) == best._2) {
            out += parts(j) + parts(j + 1)
            j += 2
          } else {
            out += parts(j)
            j += 1
          }
        }
        parts = out.result()
        continue = parts.length > 1
      }
    }
    parts
  }
}
