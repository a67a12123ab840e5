package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus audit: exact all-pairs jaccard distribution above 0.1 —
  * the measurement behind the banding-safety assertion (no pairs in
  * the LSH miss zone). Run: `runMain graft.tools.JaccardGap [sfDir]`.
  */
object JaccardGap {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val pairs = graft.llm.Dedup.allPairsJaccard(docs, "doc_id", "text", 0.1)
      .collect().map(_.getDouble(2)).sorted
    println(f"[gap] $dir: ${pairs.length} pairs with j>=0.1 in ${(System.nanoTime()-t0)/1e9}%.1f s")
    Seq(0.1, 0.3, 0.5, 0.8, 0.9).sliding(2).foreach { case Seq(lo, hi) =>
      println(s"[gap]   j in [$lo, $hi): ${pairs.count(j => j >= lo && j < hi)}")
    }
    println(s"[gap]   j >= 0.9: ${pairs.count(_ >= 0.9)}  min=${pairs.headOption.getOrElse(-1.0)}")
    spark.stop()
  }
}
