package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Similarity
import graft.functions.ArrayFns

/** Scratch: composed vs native cosine microbenchmark + equivalence. */
object CosBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    ArrayFns.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v")).cache()
    emb.count()
    val probe = emb.where(col("vec_id") === 0).select(col("v").as("p"))
    def run(name: String, simCol: org.apache.spark.sql.Column): Unit = {
      val df = emb.crossJoin(broadcast(probe)).select(sum(simCol)).cache()
      df.count() // warm codegen
      val t0 = System.nanoTime()
      var i = 0
      var last = 0.0
      while (i < 20) {
        last = emb.crossJoin(broadcast(probe))
          .agg(sum(simCol)).collect()(0).getDouble(0)
        i += 1
      }
      println(f"[cosbench] $name%-10s ${(System.nanoTime()-t0)/1e9/20}%8.4fs/iter  sum=$last%.12f")
    }
    run("composed", Similarity.cosine(col("v"), col("p")))
    run("native", ArrayFns.cosineNative(col("v"), col("p")))
    spark.stop()
  }
}
