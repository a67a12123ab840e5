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
    val l = left.withColumn("__bucket",
      floor(unix_micros(col(leftTime)) / bucketMicros))
    val r = right.withColumn("__bucket",
      explode(sequence(
        floor(unix_micros(col(startCol)) / bucketMicros),
        floor(unix_micros(col(endCol)) / bucketMicros))))
    l.join(r, keys :+ "__bucket")
      .where(col(leftTime) >= col(startCol) && col(leftTime) <= col(endCol))
      .drop("__bucket")
  }
}
