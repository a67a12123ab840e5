package graft.llm

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour: a k-means
  * coarse quantizer assigns every vector to its nearest centroid;
  * a probe only scans the `nProbe` closest centroid lists instead of
  * the corpus. The other classic ANN scale path next to sign-LSH
  * ([[Similarity.annTopK]]):
  *  - training runs once on a sample (seeded → deterministic);
  *  - assignment is a broadcast of k centroid vectors, no shuffle;
  *  - the search join is centroid_id = centroid_id — bucketed, never
  *    cartesian — and in a real deployment the corpus is written
  *    bucketed/partitioned by centroid_id so a probe prunes partitions.
  */
object Ivf {

  final case class IvfModel(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  /** Train the coarse quantizer (call on a sample at 100 TB scale).
    *
    * The input is cached for the iteration loop (KMeans rescans it
    * once per iteration — uncached, that's a parquet scan + vector
    * conversion each time). maxIter=8: a coarse quantizer needs
    * balanced-ish cells, not converged clusters — recall at
    * nProbe=4 is unchanged vs 20 iterations on this corpus
    * (tools/RecallBench), and each extra iteration is a full pass
    * over the training set.
    */
  def train(df: DataFrame, vecCol: String, k: Int, seed: Long = 42L): IvfModel = {
    val vecs = df.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val model = new KMeans().setK(k).setSeed(seed).setMaxIter(8).fit(vecs)
      IvfModel(model.clusterCenters.map(_.toArray))
    } finally vecs.unpersist(false)
  }

  /** Nearest-centroid ids for each row's vector: an array of the
    * `nProbe` closest centroid indices (position 0 = nearest). Pure
    * expressions over a broadcast-sized centroid literal.
    */
  private def nearestCentroids(vec: org.apache.spark.sql.Column, model: IvfModel, nProbe: Int) = {
    val dists: Seq[org.apache.spark.sql.Column] = model.centroids.zipWithIndex.map {
      case (c, i) =>
        val cCol = array(c.map(lit): _*)
        struct(
          aggregate(zip_with(vec, cCol, (x, y) => (x - y) * (x - y)), lit(0.0), (a, x) => a + x)
            .as("dist"),
          lit(i).as("cid"))
    }
    slice(array_sort(array(dists: _*)), 1, nProbe)
  }

  /** Assign every corpus vector to its single nearest centroid. */
  def assign(df: DataFrame, idCol: String, vecCol: String, model: IvfModel): DataFrame =
    df.select(col(idCol), col(vecCol),
      element_at(nearestCentroids(col(vecCol).cast("array<double>"), model, 1), 1)
        .getField("cid").as("centroid_id"))

  /** ANN top-k: probes fan out to their `nProbe` nearest centroid
    * lists, candidates meet on centroid_id, exact cosine ranks within.
    */
  def ivfTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      model: IvfModel,
      k: Int,
      nProbe: Int = 2): DataFrame = {
    val c = assign(corpus, idCol, vecCol, model)
      .select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("__cv"), col("centroid_id"))
    val p = probes.select(col(idCol).as("probe_id"),
      col(vecCol).cast("array<double>").as("__pv"),
      explode(nearestCentroids(col(vecCol).cast("array<double>"), model, nProbe)
        .getField("cid")).as("centroid_id"))
    val scored = c.join(p, Seq("centroid_id"))
      .withColumn("sim", Similarity.cosine(col("__cv"), col("__pv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select(col("probe_id"), col("neighbor_id"), col("sim"), col("__rn").as("rank"))
  }
}
