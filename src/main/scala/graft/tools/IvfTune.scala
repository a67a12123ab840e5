package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Ivf

/** One-off: local sampled Lloyd's vs MLlib KMeans as IVF quantizer —
  * recall@10 AND scan fraction (candidates examined / corpus) so
  * recall is compared at equal work, not hidden cell-imbalance cost.
  */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val probes = emb.where(col("vec_id") < 50)
    val k = 10
    val n = emb.count()
    val exact = graft.llm.Similarity.knnJoin(emb, probes, "vec_id", "embedding", k)
      .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def eval(label: String, m: Ivf.IvfModel): Unit = {
      // model-dependent only — hoisted out of the nProbe loop
      val assigned = Ivf.assign(emb, "vec_id", "embedding", m)
        .groupBy("centroid_id").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      for (np <- Seq(1, 2, 4, 5, 6)) {
        val got = Ivf.ivfTopK(emb, probes, "vec_id", "embedding", m, k, np)
          .select("probe_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val rec = (exact intersect got).size.toDouble / exact.size
        val pc = probes.select(col("vec_id"), Ivf.probeCentroids(col("embedding"), m, np).as("cids")).collect()
        val scanned = pc.map(r => r.getSeq[Int](1).map(assigned.getOrElse(_, 0L)).sum).sum.toDouble / (pc.length * n)
        println(f"$label%-28s nProbe=$np  recall=$rec%.3f  scan=${scanned * 100}%.1f%%")
      }
    }
    eval("local lloyd nInit=8", Ivf.train(emb, "embedding", k = 16))
    eval("local lloyd nInit=32", Ivf.train(emb, "embedding", k = 16, nInit = 32))
    // MLlib reference (what SCALE.md r3 measured)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = emb.select(array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val mll = new KMeans().setK(16).setSeed(42L).setMaxIter(20).fit(vecs)
    eval("mllib kmeans|| iter20", Ivf.IvfModel(mll.clusterCenters.map(_.toArray)))
    spark.stop()
  }
}
