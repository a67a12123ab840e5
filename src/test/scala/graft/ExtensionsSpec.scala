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
