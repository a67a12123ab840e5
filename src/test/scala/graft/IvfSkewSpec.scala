package graft

import org.apache.spark.sql.functions._

import graft.llm.{Ivf, Similarity}
import graft.ops.Skew

class IvfSkewSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    // two clear clusters around (1,0) and (0,1)
    (0L, Array(1.0f, 0.00f)), (1L, Array(0.95f, 0.05f)), (2L, Array(0.9f, 0.1f)),
    (3L, Array(0.0f, 1.00f)), (4L, Array(0.05f, 0.95f)), (5L, Array(0.1f, 0.9f))
  ).toDF("vec_id", "embedding")

  test("IVF: assignment splits the clusters; topK finds in-cluster neighbours") {
    val model = Ivf.train(vecs, "embedding", k = 2)
    assert(model.k == 2)
    val assigned = Ivf.assign(vecs, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(assigned(0L) == assigned(1L) && assigned(1L) == assigned(2L))
    assert(assigned(3L) == assigned(4L) && assigned(4L) == assigned(5L))
    assert(assigned(0L) != assigned(3L))

    val top = Ivf.ivfTopK(vecs, vecs.where(col("vec_id") === 0L),
      "vec_id", "embedding", model, k = 3, nProbe = 1)
      .collect().map(_.getLong(1)).toSet
    assert(top == Set(0L, 1L, 2L)) // own cluster only with nProbe=1
  }

  test("IVF with nProbe=k degrades to exact: matches brute-force top-k") {
    val model = Ivf.train(vecs, "embedding", k = 2)
    val ivf = Ivf.ivfTopK(vecs, vecs.where(col("vec_id") === 0L),
      "vec_id", "embedding", model, k = 5, nProbe = 2)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    val brute = Similarity.knnJoin(vecs, vecs.where(col("vec_id") === 0L),
      "vec_id", "embedding", k = 5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(ivf == brute)
  }

  test("saltedLeftJoin returns exactly the plain left-join result") {
    val left = Seq((1, "a"), (1, "b"), (2, "c"), (3, "d")).toDF("k", "lv")
    val right = Seq((1, "X"), (2, "Y")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"), "left")
      .collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedLeftJoin(left, right, Seq("k"), buckets = 4)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq == plain.toSeq)
  }

  test("keyHistogram surfaces hot keys") {
    val df = (Seq.fill(50)(1) ++ Seq(2, 3)).toDF("k")
    val top = Skew.keyHistogram(df, "k", 1).collect().head
    assert(top.getInt(0) == 1 && top.getLong(1) == 50L)
  }
}
