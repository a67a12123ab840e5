package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-preceding) join — the classic time-series operator
  * Spark has no native form for. Built by COMPOSITION (the preferred
  * strategy when built-ins can express the semantics): tag and union
  * the two sides, then a single running-frame window per key carries
  * the latest right-side payload forward; each left row then holds
  * the most recent right row with rightTime <= leftTime.
  *
  * Scale shape: ONE shuffle on the partition keys and an O(n) running
  * window per key — versus the naive theta-join
  * (`l.k = r.k AND l.t >= r.t` + argmax), which Spark plans as a
  * per-key cartesian and which explodes on any hot key. This is the
  * standard large-scale formulation.
  */
object AsOf {

  /** Backward as-of left join: every left row gains the payload of
    * the LATEST right row with `right(rightTime) <= left(leftTime)`
    * for the same `keys` (null payload when no such row, like a left
    * join). A right row exactly at the left row's time matches.
    * Payload columns are emitted as `prefix + name`.
    *
    * Null semantics match a SQL ASOF join: right rows with a null
    * timestamp or a null key never match anything (they are dropped
    * before the union — a null `__t` would sort first and leak its
    * payload into every row of its partition), and a left row with a
    * null time or key gets a null payload, not a null-equals-null
    * match. The payload travels as ONE struct column so the running
    * `last(ignoreNulls)` picks every payload field from the SAME
    * right row — per-column fills would backfill a null field of the
    * matched row with a stale value from an older one.
    *
    * Ties: two right rows at the same (keys, time) are ambiguous in
    * any as-of formulation; the window keeps the later one in union
    * order. Feed de-duplicated right timestamps for full determinism.
    */
  def asofJoinBackward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, payloadCols, prefix, forward = false)

  /** Forward as-of left join: every left row gains the payload of the
    * EARLIEST right row with `right(rightTime) >= left(leftTime)` for
    * the same `keys` — the mirror of [[asofJoinBackward]], with the
    * same null semantics, the same single-shuffle running-window
    * shape, and a right row exactly at the left row's time matching.
    */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame =
    asofImpl(left, right, keys, leftTime, rightTime, payloadCols, prefix, forward = true)

  private def asofImpl(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      prefix: String,
      forward: Boolean): DataFrame = {
    require(payloadCols.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq

    // unify schemas: left rows carry a null payload struct, right rows
    // carry null left-only columns. __side places a right row where
    // the left row at the SAME time can see it: before it (0 vs 1) in
    // backward mode, after it (2 vs 1) in forward mode.
    val rightTag = if (forward) 2 else 0
    val payloadT = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
    val lPrep = left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(payloadT))
    val rBase = right
      .where(keys.foldLeft(col(rightTime).isNotNull)((p, k) => p && col(k).isNotNull))
      .select((keys.map(col) :+ col(rightTime).as("__t")) :+
        struct(payloadCols.map(c => col(c).as(c)): _*).as("__p"): _*)
      .withColumn("__side", lit(rightTag))
    val rPrep = leftCols.filterNot(keys.contains).foldLeft(rBase) {
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val unified = (leftCols ++ Seq("__t", "__side", "__p")).map(col)
    val u = lPrep.select(unified: _*).unionByName(rPrep.select(unified: _*))

    // Both modes use the RUNNING frame [unboundedPreceding, currentRow]:
    // Spark executes it as an O(n) incremental scan per key, whereas a
    // [currentRow, unboundedFollowing] frame recomputes the aggregate
    // from scratch at every row (UnboundedFollowingWindowFunctionFrame,
    // O(n²) on hot keys). Forward mode gets the running shape by
    // sorting DESCENDING — the "earliest right row at-or-after" is then
    // the nearest preceding non-null in frame order. __side desc keeps
    // a right row (tag 2) visible to a left row (tag 1) at the same
    // timestamp.
    val w0 =
      if (forward)
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__t").desc, col("__side").desc)
      else
        Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__t").asc, col("__side").asc)
    // the struct of a right row is never null (even with all-null
    // fields), so one running last(ignoreNulls) is an atomic match:
    // every payload field comes from the SAME right row.
    val filled = u.withColumn("__p", last(col("__p"), ignoreNulls = true)
      .over(w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // a left row with a null time gets a null payload in BOTH modes.
    // Backward gets this for free (nulls sort first, the preceding
    // frame holds only other null-time rows); forward sorts desc so
    // nulls land LAST and the running frame spans the whole partition
    // — the isNotNull guard below nulls the payload out.
    filled.where(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c =>
          when(col("__t").isNotNull, col("__p").getField(c)).as(s"$prefix$c")): _*)
  }
}
