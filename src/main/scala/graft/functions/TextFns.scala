package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_gram_hashes(text, k)` — the 64-bit hash of EVERY k-length
  * character window of `text`, as one `array<bigint>`, in ONE O(n)
  * rolling pass (Rabin–Karp polynomial hash, wrapping long
  * arithmetic: `h_{j+1} = (h_j − c_j·B^{k−1})·B + c_{j+k}`).
  *
  * This is the hot inner loop of the exact-substring family
  * ([[graft.llm.Dedup.kgramPositions]] feeds coverage / pairs / spans
  * / cutting): the composable form `transform(sequence, i →
  * xxhash64(substr(text, i, k)))` re-reads every character k times —
  * O(n·k) with a fresh substring copy per position, ~30× the work at
  * the default k=30. The hash VALUE is internal to the Spark side
  * (the DuckDB oracles compare gram STRINGS), so swapping xxhash64
  * for the rolling polynomial changes no oracle; cross-doc gram
  * equality is what matters, and that is position-independent by
  * construction. Collisions: fixed-base 64-bit polynomial — ~n²/2^64
  * accidental collision odds (same accepted trade as the md5/xxhash
  * keys elsewhere), not adversarial-proof, fine for dedup audits.
  *
  * Windows are CODE-POINT aligned (matching `substr`'s code-point
  * counting, so positions line up with the oracles' `substr(text, i,
  * k)` even off-ASCII). Null text → null; fewer than k code points →
  * empty array (the caller's explode then emits nothing — same
  * contract as the guarded sequence form).
  */
case class GramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${left.dataType.simpleString}")
    else if (right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a literal int gram length, got ${right.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(s: Any, kAny: Any): Any = {
    val k = kAny.asInstanceOf[Int]
    val cps = s.asInstanceOf[UTF8String].toString.codePoints().toArray
    new GenericArrayData(GramHashes.roll(cps, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cps = ctx.freshName("cps")
      val out = ctx.freshName("out")
      s"""
         |int[] $cps = $a.toString().codePoints().toArray();
         |long[] $out = graft.functions.GramHashes.roll($cps, $b);
         |${ev.value} = ${classOf[UnsafeArrayData].getName}.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramHashes =
    copy(left = newLeft, right = newRight)
}

object GramHashes {
  /** Shared by interpreted eval and generated code. */
  def roll(cps: Array[Int], k: Int): Array[Long] = {
    require(k >= 1, s"gram length must be >= 1, got $k")
    val n = cps.length - (k - 1)
    if (n <= 0) return Array.emptyLongArray
    val B = 1000003L
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk *= B; i += 1 }
    val out = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + cps(i); i += 1 }
    out(0) = h
    var j = 1
    while (j < n) {
      h = (h - cps(j - 1) * bk) * B + cps(j + k - 1)
      out(j) = h
      j += 1
    }
    out
  }
}
