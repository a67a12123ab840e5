package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Bucketing
import graft.llm.Similarity
import graft.plans.{DotProductRewrite, GraftExtensions}

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProductRewrite rewrites the composed idiom to the native expression") {
    // Array[Double] columns are containsNull=false → the rule may fire
    val df = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d"))
    val rewritten = DotProductRewrite(df.queryExecution.analyzed)
    assert(rewritten.expressions.exists(_.find {
      case _: graft.functions.DotProduct => true
      case _ => false
    }.isDefined), rewritten.toString)
  }

  test("rewrite declines on lambdas that are not a true dot product") {
    def hasDot(df: org.apache.spark.sql.DataFrame): Boolean =
      DotProductRewrite(df.queryExecution.analyzed).expressions.exists(_.find {
        case _: graft.functions.DotProduct => true
        case _ => false
      }.isDefined)
    val base = Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
    // (x, y) -> x * x: a sum of squares over a's elements, NOT a·b —
    // must survive unrewritten (the round-2 over-match bug)
    val sumSquares = base.select(
      aggregate(zip_with(col("a"), col("b"), (x, _) => x * x),
        lit(0.0), (acc, v) => acc + v).as("d"))
    assert(!hasDot(sumSquares), "sum-of-squares must not rewrite to DotProduct")
    assert(sumSquares.collect()(0).getDouble(0) == 1.0 + 4.0)
    // (acc, v) -> acc + acc: not a running sum of products
    val doubleAcc = base.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, _) => acc + acc).as("d"))
    assert(!hasDot(doubleAcc), "acc+acc must not rewrite to DotProduct")
    // the genuine idiom still fires (guards are not over-tight)
    val genuine = base.select(Similarity.dot(col("a"), col("b")).as("d"))
    assert(hasDot(genuine))
  }

  test("rewrite preserves unequal-length semantics (both forms null)") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 4.0))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d"))
    assert(df.collect()(0).isNullAt(0), "composed form must be null on unequal lengths")
    val rewritten = DotProductRewrite(df.queryExecution.analyzed)
    assert(rewritten.expressions.exists(_.find {
      case _: graft.functions.DotProduct => true
      case _ => false
    }.isDefined), "rule should fire — DotProduct now matches null-on-unequal semantics")
  }

  test("rewrite declines when array elements are nullable (null semantics differ)") {
    val df = Seq((Seq(Option(1.0)), Seq(Option(2.0)))).toDF("a", "b")
      .select(Similarity.dot(col("a"), col("b")).as("d"))
    val rewritten = DotProductRewrite(df.queryExecution.analyzed)
    assert(!rewritten.expressions.exists(_.find {
      case _: graft.functions.DotProduct => true
      case _ => false
    }.isDefined))
  }

  test("GraftExtensions injects SQL functions + rule into a new session") {
    val active = SparkSession.getActiveSession
    val default = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder().master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val v = s2.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .collect()(0).getDouble(0)
      assert(v == 11.0)
      val c = s2.sql("SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c")
        .collect()(0).getDouble(0)
      assert(math.abs(c - 1.0) < 1e-12)
      // the optimizer rule is installed: composed idiom compiles to
      // graft_dot (non-foldable input so constant folding can't
      // evaluate it away first)
      val composed = s2.range(3).select(
        Similarity.dot(
          array(col("id").cast("double"), lit(2.0)),
          array(lit(3.0), col("id").cast("double"))).as("d"))
      assert(composed.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        composed.queryExecution.optimizedPlan.toString)
      assert(composed.orderBy("d").collect()(0).getDouble(0) == 0.0 * 3.0 + 2.0 * 0.0)
    } finally {
      active.foreach(SparkSession.setActiveSession)
      default.foreach(SparkSession.setDefaultSession)
    }
  }

  test("bucketed tables join with zero exchanges") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.writeBucketed(
        (1 to 100).map(i => (i.toLong, s"l$i")).toDF("k", "lv"), "bk_left", "k", 4)
      Bucketing.writeBucketed(
        (1 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "rv"), "bk_right", "k", 4)
      val joined = Bucketing.colocatedJoin(spark, "bk_left", "bk_right", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() == 100)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
