package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-dimensional file pruning.
  *
  * [[EventStore.writeTimeLayout]] clusters on ONE column: a file's
  * footer stats are tight on `ts` and useless on everything else. A
  * fact table queried by several independent dimensions (user AND
  * time; region AND key range) needs each file to cover a small
  * RECTANGLE of the key space, not a slice — that is exactly what
  * sorting by the interleaved-bit z-key gives: a contiguous z-range
  * maps to a bounded box in every input dimension, so each file's
  * per-column min/max stats are narrow in ALL interleaved columns and
  * a selective filter on ANY of them skips files. At 100 TB this is
  * the difference between one clustered dimension served and every
  * dashboard dimension served by the same copy of the data (the
  * technique behind Delta/Iceberg `ZORDER BY`, re-expressed as plain
  * `repartitionByRange` + in-file sort — no table format needed).
  *
  * The z-key interleaves the low `bits` bits of each column (column
  * i's bit b lands at global bit `b*n + i`). The expression is an
  * unrolled flat OR of shift/mask terms — pure codegen arithmetic,
  * no UDF, no shuffle beyond the one range exchange the layout write
  * itself needs. Inputs are masked to `bits` bits, so callers pass
  * raw non-negative integers; values above 2^bits wrap rather than
  * error, which preserves locality for everything in range (rank- or
  * scale-normalize upstream if a dimension overflows).
  */
object ZOrder {

  /** Interleaved-bit z-key over ≥2 integer columns. `n*bits` must fit
    * a signed long; 16 bits × 2 cols (the default) uses 32.
    */
  def zkey(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.size >= 2, "z-order needs at least two dimensions")
    require(cols.size * bits <= 63, s"${cols.size} cols × $bits bits overflows a long zkey")
    val n = cols.size
    val mask = (1L << bits) - 1
    cols.zipWithIndex.flatMap { case (c, i) =>
      val masked = c.cast("long").bitwiseAND(lit(mask))
      (0 until bits).map(b =>
        shiftleft(shiftright(masked, b).bitwiseAND(lit(1L)), b * n + i))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-clustered on `dims` into `buckets` files: range
    * exchange on the z-key (sampled, so skew still yields even
    * files) + in-file sort, same mechanics as the time layout. The
    * z-key is layout-only — it is not persisted.
    */
  def writeZOrderLayout(
      df: DataFrame,
      path: String,
      dims: Seq[String],
      buckets: Int = 32,
      bits: Int = 16): Unit = {
    val keyed = df.withColumn("__zkey", zkey(dims.map(col), bits))
    keyed.repartitionByRange(buckets, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode("overwrite").parquet(path)
  }
}
