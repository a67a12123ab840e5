package graft

import org.apache.spark.sql.functions._

import graft.ops.Ivm

/** Mergeable aggregate state: merge(state(parts)) must equal
  * state(whole) for ANY partitioning and merge order — the algebra
  * incremental refresh rests on.
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private val data = Seq(
    // (key, value) with nulls and a key confined to one slice
    ("a", Some(10L)), ("a", Some(20L)), ("a", None),
    ("b", Some(5L)), ("b", Some(7L)),
    ("c", None), ("c", None),
    ("d", Some(42L))
  ).toDF("k", "v")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    Ivm.finalized(df).collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("n_rows"), r.getAs[Long]("n_vals"),
        Option(r.get(r.fieldIndex("sum_val"))), Option(r.get(r.fieldIndex("min_val"))),
        Option(r.get(r.fieldIndex("max_val"))), Option(r.get(r.fieldIndex("mean_val")))))
      .toSet

  test("merge of sliced states equals the direct recompute, any slicing and order") {
    val whole = Ivm.state(Seq("k"), "v")(data)
    val slices = Seq(
      data.where(col("v").isNull || col("v") < 10),
      data.where(col("v") >= 10 && col("v") < 40),
      data.where(col("v") >= 40)
    ).map(Ivm.state(Seq("k"), "v"))
    assert(canon(Ivm.merge(Seq("k"))(slices: _*)) == canon(whole))
    // associativity: ((s0 + s1) + s2) == (s0 + (s1 + s2))
    val left = Ivm.merge(Seq("k"))(Ivm.merge(Seq("k"))(slices(0), slices(1)), slices(2))
    val right = Ivm.merge(Seq("k"))(slices(0), Ivm.merge(Seq("k"))(slices(1), slices(2)))
    assert(canon(left) == canon(right))
    // commutativity
    assert(canon(Ivm.merge(Seq("k"))(slices(2), slices(0), slices(1))) == canon(whole))
  }

  test("all-null keys finalize to null mean; empty delta is the identity") {
    val whole = Ivm.state(Seq("k"), "v")(data)
    val cRow = canon(whole).find(_._1 == "c").get
    assert(cRow._3 == 0L && cRow._4.isEmpty && cRow._7.isEmpty) // no vals, null sum/mean
    val empty = Ivm.state(Seq("k"), "v")(data.where(lit(false)))
    assert(canon(Ivm.merge(Seq("k"))(whole, empty)) == canon(whole))
  }

  test("merge is one union + one keyed aggregation — no join, no cartesian") {
    val a = Ivm.state(Seq("k"), "v")(data.where(col("v") < 10))
    val b = Ivm.state(Seq("k"), "v")(data.where(col("v") >= 10 || col("v").isNull))
    val plan = Ivm.merge(Seq("k"))(a, b).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Union"), plan)
  }

  test("merge refuses a frame that is not a state (missing columns)") {
    intercept[IllegalArgumentException] {
      Ivm.merge(Seq("k"))(data)
    }
  }
}
