package graft

import org.apache.spark.sql.functions._

import graft.functions.ArrayFns
import graft.llm.Similarity

class ArrayFnsSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = { ArrayFns.register(spark); spark }

  test("native dot/cosine match the composed zip_with form bit-exactly") {
    registered()
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2, 0.3), Array(-0.4, 0.5, 0.6))
    ).toDF("a", "b")
    val r = df.select(
      ArrayFns.dotNative(col("a"), col("b")).as("dn"),
      Similarity.dot(col("a"), col("b")).as("dc"),
      ArrayFns.cosineNative(col("a"), col("b")).as("cn"),
      Similarity.cosine(col("a"), col("b")).as("cc")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1)) // exact, not approx
      assert(row.getDouble(2) == row.getDouble(3))
    }
  }

  test("null array → null result; null elements contribute zero") {
    registered()
    val df = Seq(
      (Some(Seq(Some(1.0), None, Some(3.0))), Some(Seq(Some(2.0), Some(9.0), Some(1.0)))),
      (None, Some(Seq(Some(1.0))))
    ).toDF("a", "b")
    val r = df.select(ArrayFns.dotNative(col("a"), col("b"))).collect()
    assert(r(0).getDouble(0) == 1.0 * 2.0 + 3.0 * 1.0)
    assert(r(1).isNullAt(0))
  }

  test("mismatched lengths are null — matching the composed form's padding-null poisoning") {
    registered()
    val df = Seq((Array(1.0, 2.0, 3.0), Array(10.0))).toDF("a", "b")
    val r = df.select(
      ArrayFns.dotNative(col("a"), col("b")).as("dn"),
      Similarity.dot(col("a"), col("b")).as("dc"),
      ArrayFns.cosineNative(col("a"), col("b")).as("cn")).collect()(0)
    assert(r.isNullAt(0), "native dot should be null on length mismatch")
    assert(r.isNullAt(1), "composed dot is null on length mismatch (zip_with pads nulls)")
    assert(r.isNullAt(2), "native cosine should be null on length mismatch")
  }

  test("interpreted eval path (outside codegen) agrees") {
    import graft.functions.DotProduct
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val lit1 = Literal.create(ArrayData.toArrayData(Array(1.0, 2.0)), ArrayType(DoubleType))
    val lit2 = Literal.create(ArrayData.toArrayData(Array(3.0, 4.0)), ArrayType(DoubleType))
    assert(DotProduct(lit1, lit2).eval(null) == 11.0)
  }

  test("wrong input types fail analysis with a clear message") {
    registered()
    val df = Seq(("x", "y")).toDF("a", "b")
    val e = intercept[Exception](df.select(ArrayFns.dotNative(col("a"), col("b"))).schema)
    assert(e.getMessage.toLowerCase.contains("graft_dot") ||
      e.getMessage.toLowerCase.contains("array"), e.getMessage)
  }
}
