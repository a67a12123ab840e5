package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dedup

/** Scratch profiling main (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime()-t0)/1e9}%8.2fs  $n")
    }
    time("warmup")(docs.count())
    time("shingle_rows")(docs.select(explode(Dedup.shingles("text")).as("sh"))
      .agg(count(lit(1)), sum(length(col("sh")))).collect().toSeq)
    time("shingle_rows_distinct")(docs.select(explode(array_distinct(Dedup.shingles("text"))).as("sh"))
      .agg(count(lit(1))).collect().toSeq)
    time("hash_1perm")(docs.select(explode(array_distinct(Dedup.shingles("text"))).as("sh"))
      .agg(max(xxhash64(lit(0), col("sh")))).collect().toSeq)
    time("sig_agg")(Dedup.minhashSignatures(docs, "doc_id", "text", 64, 3)
      .agg(max(element_at(col("__sig"), 1))).collect().toSeq)
    time("sig_agg_2nd")(Dedup.minhashSignatures(docs, "doc_id", "text", 64, 3)
      .agg(max(element_at(col("__sig"), 1))).collect().toSeq)
    time("lshBands")(Dedup.lshBands(docs, "doc_id", "text", 64, 32).count())
    time("lshBands_2nd")(Dedup.lshBands(docs, "doc_id", "text", 64, 32).count())
    time("candidates")(Dedup.minhashCandidates(docs, "doc_id", "text", 64, 32).count())
    time("nearDupPairs")(Dedup.nearDupPairs(docs, "doc_id", "text", 0.5, 64, 32).count())
    spark.stop()
  }
}
