package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch: confirm AQE reuses the signature exchange in the minhash
  * self-join (visible only in the post-execution final plan).
  */
object ReuseCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val q = graft.llm.Dedup.minhashCandidates(docs, "doc_id", "text", 64, 32)
    val t0 = System.nanoTime()
    println("rows=" + q.count())
    println(f"took ${(System.nanoTime()-t0)/1e9}%.2fs")
    val fin = q.queryExecution.executedPlan.toString
    println("ReusedExchange/StageReuse occurrences: " +
      ("ReusedExchange|reused".r.findAllIn(fin).length))
    spark.stop()
  }
}
