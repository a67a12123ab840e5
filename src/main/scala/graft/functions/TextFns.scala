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
  * rolling pass: TWO Rabin–Karp polynomials with independent bases
  * (wrapping long arithmetic, `h_{j+1} = (h_j − c_j·B^{k−1})·B +
  * c_{j+k}` each), combined per position through a murmur-style
  * avalanche finalizer.
  *
  * This is the hot inner loop of the exact-substring family
  * ([[graft.llm.Dedup.kgramPositions]] feeds coverage / pairs / spans
  * / cutting): the composable form `transform(sequence, i →
  * xxhash64(substr(text, i, k)))` re-reads every character k times —
  * O(n·k) with a fresh substring copy per position, ~30× the work at
  * the default k=30. The hash VALUE is internal to the Spark side
  * (the DuckDB oracles compare gram STRINGS), so the hashing scheme
  * changes no oracle; cross-doc gram equality is what matters, and
  * that is position-independent by construction.
  *
  * Collisions, honestly: a SINGLE fixed-base polynomial mod 2^64 has
  * structured collisions on low-entropy/periodic text (window
  * differences that are multiples of base-power gaps cancel), so its
  * real-world odds are worse than the uniform n²/2^65 birthday bound.
  * Here a false gram match needs the combined avalanche outputs of
  * BOTH independent-base states to agree — the linear structure a
  * periodic input induces in one polynomial does not survive the
  * second base plus the bit-mixing, restoring ≈ birthday-bound odds
  * for natural text. Still not adversarial-proof (mod-2^64 rolling
  * hashes never are — anti-hash constructions defeat any base set);
  * the md5/xxhash keys elsewhere make the same trade.
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
  // Two odd bases (units mod 2^64, so the rolling subtraction is
  // exact); independence of the bases is what breaks cross-window
  // linear cancellation patterns.
  private final val B1 = 1000003L
  private final val B2 = 100000007L

  /** MurmurHash3's 64-bit finalizer — a bijection (adds no collisions
    * of its own) that avalanches every input bit across the output.
    */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  private def combine(h1: Long, h2: Long): Long =
    fmix64(h1) ^ java.lang.Long.rotateLeft(fmix64(h2), 32)

  /** Shared by interpreted eval and generated code. */
  def roll(cps: Array[Int], k: Int): Array[Long] = {
    require(k >= 1, s"gram length must be >= 1, got $k")
    val n = cps.length - (k - 1)
    if (n <= 0) return Array.emptyLongArray
    var bk1 = 1L
    var bk2 = 1L
    var i = 0
    while (i < k - 1) { bk1 *= B1; bk2 *= B2; i += 1 }
    val out = new Array[Long](n)
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i < k) { h1 = h1 * B1 + cps(i); h2 = h2 * B2 + cps(i); i += 1 }
    out(0) = combine(h1, h2)
    var j = 1
    while (j < n) {
      h1 = (h1 - cps(j - 1) * bk1) * B1 + cps(j + k - 1)
      h2 = (h2 - cps(j - 1) * bk2) * B2 + cps(j + k - 1)
      out(j) = combine(h1, h2)
      j += 1
    }
    out
  }
}
