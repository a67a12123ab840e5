package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** SimHash fingerprint as ONE TypedImperativeAggregate over
  * pre-hashed tokens: the buffer is the 64 signed bit-counters, each
  * input row costs one loop over them, and partial buffers merge by
  * element-wise addition (map-side combine works as usual). The
  * composed formulation this replaces built 64 SEPARATE sum-agg
  * columns (`sum(case when shiftright(h, j) & 1 ...)`) — 64 agg
  * buffers per group and a generated-code unit big enough to dominate
  * a cold run (measured ~40% of dedup_simhash_pairs wall-clock).
  *
  * The input is the token HASH (int64), not the token: which hash
  * family to use (xxhash64 for speed, [[graft.llm.Dedup.md5Hash60]]
  * for cross-engine-portable fingerprints) stays the caller's choice,
  * and the result is bit-identical to the composed form by
  * construction: bit j of the output is set iff
  * Σ_tokens (bit_j(hash) ? +1 : −1) > 0.
  */
case class SimHashAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buf(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { buf(j) += other(j); j += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_simhash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash requires a bigint token-hash column, got ${child.dataType.simpleString}")

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}
