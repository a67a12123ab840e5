package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — the second classic operator Spark lacks a
  * native form for. A bare `l.k = r.k AND l.t BETWEEN r.s AND r.e`
  * join gives Spark only the equi-part to hash on and leaves the
  * range as a post-filter over every same-key pair — quadratic in any
  * hot key. The scale formulation BUCKETS time: each point lands in
  * exactly one fixed-width bucket, each interval explodes to the
  * buckets it covers, and candidates meet via an equi-join on
  * (keys, bucket) before the exact range filter. A matching pair
  * meets exactly once (the point's bucket is among the interval's),
  * so no dedup pass is needed. Cost scales with interval length /
  * bucket width — pick `bucketMicros` near the typical interval span.
  */
object RangeJoin {

  /** Inner join of point rows (`leftTime`) to interval rows
    * (`[startCol, endCol]`, inclusive) on `keys` + containment.
    * Timestamp columns; `bucketMicros` is the bucket width.
    */
  def bucketedRangeJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      startCol: String,
      endCol: String,
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(shared.isEmpty,
      s"bucketedRangeJoin: both sides carry non-key columns ${shared.mkString(", ")} — " +
        "rename one side first (the raw join would emit duplicate ambiguous columns)")
    val l = left.withColumn("__bucket",
      floor(unix_micros(col(leftTime)) / bucketMicros))
    // inverted intervals (end < start — swapped columns, sentinel
    // dates) must DROP, not explode: sequence() auto-steps -1 when
    // start > stop, so one corrupt row would fan out to every bucket
    // between the two instants (a ~500k-row skew bomb at hour buckets
    // across epoch-range sentinels), all filtered out later anyway
    val r = right.where(col(startCol) <= col(endCol)).withColumn("__bucket",
      explode(sequence(
        floor(unix_micros(col(startCol)) / bucketMicros),
        floor(unix_micros(col(endCol)) / bucketMicros))))
    l.join(r, keys :+ "__bucket")
      .where(col(leftTime) >= col(startCol) && col(leftTime) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval OVERLAP join — both sides are intervals; emit every
    * pair (closed intervals, inclusive touch) that overlaps:
    * `ls <= re AND rs <= le`. The Flink/Trino "interval join",
    * bucketized the same way as [[bucketedRangeJoin]]: both sides
    * explode to covered buckets and candidates meet on the bucket
    * equi-join. A pair overlapping across several shared buckets
    * would meet once per bucket, so the match is kept ONLY in the
    * canonical bucket — the one containing `greatest(ls, rs)` (the
    * overlap's first instant, which both sides provably cover) —
    * exactly-once without a distinct pass.
    *
    * `leftCols`/`rightCols` name the payload to keep per side
    * (interval bounds are re-selected under `ls/le/rs/re`). Cost
    * scales with interval span / bucket width; a multi-day interval
    * at minute buckets is the caller's skew bug — size `bucketMicros`
    * near the typical span, as with the point form.
    */
  def overlapJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String,
      leftCols: Seq[String], rightCols: Seq[String],
      bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    def bucketsOf(s: String, e: String) =
      explode(sequence(
        floor(unix_micros(col(s)) / bucketMicros),
        floor(unix_micros(col(e)) / bucketMicros)))
    // inverted intervals: same sequence() auto-step-(-1) fan-out trap
    // as bucketedRangeJoin — drop them before the explode
    val l = left.where(col(leftStart) <= col(leftEnd)).select(
      (keys.map(col) :+ bucketsOf(leftStart, leftEnd).as("__bucket") :+
        col(leftStart).as("ls") :+ col(leftEnd).as("le")) ++ leftCols.map(col): _*)
    val r = right.where(col(rightStart) <= col(rightEnd)).select(
      (keys.map(col) :+ bucketsOf(rightStart, rightEnd).as("__bucket") :+
        col(rightStart).as("rs") :+ col(rightEnd).as("re")) ++ rightCols.map(col): _*)
    l.join(r, keys :+ "__bucket")
      .where(col("ls") <= col("re") && col("rs") <= col("le") &&
        col("__bucket") === floor(unix_micros(greatest(col("ls"), col("rs"))) / bucketMicros))
      .drop("__bucket")
  }
}
