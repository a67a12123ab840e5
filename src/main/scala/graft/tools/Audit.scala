package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan audit: prints formatted physical plans for representative
  * queries so shuffle/broadcast/pushdown shape can be reviewed.
  */
object Audit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq(
      "p2_select_columns", "f1_ge_number", "j1_left_join", "a1_summarise_minmax",
      "a3_groupby_slice", "engine_study", "s1_keyed_scan", "dedup_minhash_pairs",
      "sim_cosine_topk", "sim_knn_join", "text_quality", "w1_event_windows")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      // pseudo-query: the sketch family's scale path (approxNdv without
      // the exact gate twin) is not a registered query but is the plan
      // PLANS.md showcases — no Expand, registers-only exchange
      try {
        val df =
          if (n == "sketch_scale_path")
            graft.llm.Sketch.approxNdv(Seq("lang"), "text")(
              spark.read.parquet(s"$dir/documents.parquet"))
          else graft.SparkEntry.queries(n)(spark, dir)
        println(df.queryExecution.executedPlan.toString)
      } catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
