package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate-view maintenance: per-key aggregate STATE
  * that merges associatively, so a standing rollup refreshes by
  * aggregating ONLY the new partition and merging it into the stored
  * state — never by rescanning history. The reference recomputes its
  * summaries from scratch per run (`Configurable_ETL_Python.py`'s
  * GROUPBY sheets run over the full frame each time); at 100 TB the
  * recompute is the cost of reading the corpus, while the merge is
  * the cost of reading yesterday's state (key-cardinality-sized) plus
  * today's delta — the same partial-aggregate discipline Spark uses
  * INSIDE one job, lifted across jobs.
  *
  * The state carries only decomposable aggregates (count / non-null
  * count / sum / min / max); derived values (mean) are finalized from
  * the state, never stored — storing a mean makes the state
  * non-mergeable. Exactness discipline: keep summed columns
  * integer-valued (cents, token counts) so the re-associated sum is
  * bit-equal to a full recompute; floating sums reorder under merge
  * (documented trade, same as the bench oracles' integer-sum rule).
  */
object Ivm {

  private val stateCols = Seq("n_rows", "n_vals", "sum_val", "min_val", "max_val")

  /** Aggregate a batch into mergeable per-key state. */
  def state(keys: Seq[String], valueCol: String)(df: DataFrame): DataFrame = {
    require(keys.nonEmpty, "state needs at least one key column")
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      count(col(valueCol)).as("n_vals"),
      sum(col(valueCol)).as("sum_val"),
      min(col(valueCol)).as("min_val"),
      max(col(valueCol)).as("max_val"))
  }

  /** Merge any number of states: one union + one keyed aggregation
    * (sums add; min/max fold; null-valued partial sums skip exactly
    * as a direct recompute would). Associative and commutative —
    * spec-pinned against the direct recompute and across merge
    * orders.
    */
  def merge(keys: Seq[String])(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    states.foreach { s =>
      val missing = (keys ++ stateCols).filterNot(s.columns.contains)
      require(missing.isEmpty, s"state frame missing columns: ${missing.mkString(", ")}")
    }
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(
        sum("n_rows").as("n_rows"),
        sum("n_vals").as("n_vals"),
        sum("sum_val").as("sum_val"),
        min("min_val").as("min_val"),
        max("max_val").as("max_val"))
  }

  /** Finalize derived aggregates from the state (mean; null when the
    * key saw no non-null values, matching a direct `avg`).
    */
  def finalized(state: DataFrame): DataFrame =
    state.withColumn("mean_val",
      when(col("n_vals") > 0,
        col("sum_val").cast("double") / col("n_vals")))
}
