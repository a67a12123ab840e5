package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off profiler: where does sim_ivf_topk spend its time —
  * KMeans training vs the assign/join/rank query?
  */
object IvfProf {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.limit(1).count()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivfprof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val m1 = time("train-1")(graft.llm.Ivf.train(emb, "embedding", k = 16))
    val m2 = time("train-2")(graft.llm.Ivf.train(emb, "embedding", k = 16))
    require(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq, "nondeterministic train")
    time("query-1") {
      graft.llm.Ivf.ivfTopK(emb, emb.where(org.apache.spark.sql.functions.col("vec_id") < 5),
        "vec_id", "embedding", m1, k = 5, nProbe = 4)
        .write.mode("overwrite").format("noop").save()
    }
    time("query-2") {
      graft.llm.Ivf.ivfTopK(emb, emb.where(org.apache.spark.sql.functions.col("vec_id") < 5),
        "vec_id", "embedding", m1, k = 5, nProbe = 4)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
