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
      prefix: String = "asof_"): DataFrame = {
    require(payloadCols.nonEmpty, "asofJoinBackward needs at least one payload column")
    val leftCols = left.columns.toSeq
    val payload = payloadCols.map(c => s"__p_$c")

    // unify schemas: left rows carry null payloads, right rows carry
    // null left-only columns; __side orders right (0) before left (1)
    // at equal times so an exactly-simultaneous right row is visible.
    val lPrep = payloadCols.foldLeft(
      left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))) {
      (d, c) => d.withColumn(s"__p_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rBase = right.select(
      (keys.map(col) :+ col(rightTime).as("__t")) ++
        payloadCols.map(c => col(c).as(s"__p_$c")): _*)
      .withColumn("__side", lit(0))
    val rPrep = leftCols.filterNot(keys.contains).foldLeft(rBase) {
      (d, c) => d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val unified = (leftCols ++ Seq("__t", "__side") ++ payload).map(col)
    val u = lPrep.select(unified: _*).unionByName(rPrep.select(unified: _*))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(u)((d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))

    filled.where(col("__side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col(s"__p_$c").as(s"$prefix$c")): _*)
  }
}
