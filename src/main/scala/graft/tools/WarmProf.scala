package graft.tools
import org.apache.spark.sql.SparkSession

/** Cold-vs-warm cost split for bench queries: runs each named query
  * twice in one JVM — the delta is codegen/JIT/planning warmup, the
  * second run is steady-state compute. Run:
  * `runMain graft.tools.WarmProf [sfDir] [query...]`.
  */
object WarmProf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("text_fingerprint", "dedup_minhash_pairs", "dedup_simhash_pairs",
        "s1_keyed_scan", "engine_study", "sim_ivf_topk", "sim_ann_topk")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse_bench")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val c = run(); val w = run(); val w2 = run()
      println(f"[warm] $n%-26s cold=$c%6.2fs warm=$w%6.2fs warm2=$w2%6.2fs")
    }
    spark.stop()
  }
}
