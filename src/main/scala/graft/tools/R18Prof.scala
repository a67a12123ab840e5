package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Round-18 scratch profiler (not part of the driver contract):
  * decomposes the allPairsJaccard audit family — the biggest
  * non-chunker block of bench seconds — into its passes, so the
  * optimization targets the measured term instead of a guess.
  * Methodology per guide §1.4: noop-style full materialization via
  * aggregate-all-columns, job descriptions set per stage.
  */
object R18Prof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Any): Unit = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime(); val n = f
      println(f"[r18prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2fs  $n")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.mode("overwrite").format("noop").save(); 0L
    }
    time("warmup")(docs.count())
    val sh0 = docs.select(col("doc_id"),
      explode(array_distinct(Dedup.shingles("text"))).as("__sh"))
    time("explode_only")(noop(sh0))
    time("explode_only_2nd")(noop(sh0))
    val kept = sh0.groupBy("__sh").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= 16).select("__sh")
    time("cap_agg")(noop(kept))
    val sh = sh0.join(kept, Seq("__sh"), "left_semi")
      .select(col("doc_id"), col("__sh"))
    time("semi_join")(noop(sh))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("__n"))
    time("sizes")(noop(sizes))
    val inter = sh.toDF("id_a", "__sh").join(sh.toDF("id_b", "__sh"), "__sh")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__i"))
    time("inter")(noop(inter))
    time("full_capped")(noop(
      Dedup.allPairsJaccard(docs, "doc_id", "text", 0.3, maxDocFreq = Some(16))))
    time("full_capped_2nd")(noop(
      Dedup.allPairsJaccard(docs, "doc_id", "text", 0.3, maxDocFreq = Some(16))))
    time("full_uncapped")(noop(
      Dedup.allPairsJaccard(docs, "doc_id", "text", 0.3)))
    spark.stop()
  }
}
