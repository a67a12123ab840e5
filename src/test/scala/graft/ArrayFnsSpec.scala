package graft

import org.apache.spark.sql.functions._

import graft.functions.ArrayFns
import graft.llm.Similarity

class ArrayFnsSpec extends SparkSpec {
  import spark.implicits._

  private def registered() = { ArrayFns.register(spark); spark }

  test("graft_gram_hashes: rolling == direct per-window hash; shared substrings collide exactly") {
    registered()
    def hashes(s: String, k: Int): Seq[Long] =
      Seq(Tuple1(s)).toDF("t")
        .select(call_function("graft_gram_hashes", col("t"), lit(k)).as("h"))
        .collect().head.getSeq[Long](0)
    // The rolling update must reproduce the non-rolling path: roll()
    // computes its FIRST window by direct accumulation, so hashing
    // each k-window in isolation is an independent reference for
    // every rolled position (no pinned literals — the scheme, not the
    // constants, is the contract).
    def direct(s: String, k: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      cps.sliding(k).filter(_.length == k).toSeq
        .map(w => graft.functions.GramHashes.roll(w, k).head)
    }
    for ((s, k) <- Seq(("abcdef", 3), ("aaaaaaaaaa", 4), ("déjàvu déjà", 3)))
      assert(hashes(s, k) == direct(s, k), s"rolling != direct for ($s, $k)")
    assert(hashes("ab", 3).isEmpty)         // shorter than k → empty, not error
    // the property the dedup family rests on: equal substrings hash
    // equal at ANY position (position-independent by construction)
    val h1 = hashes("xxHELLOWORLDyy", 5)
    val h2 = hashes("qqqHELLOWORLDzz", 5)
    assert((2 until 8).map(h1) == (3 until 9).map(h2))
    // distinct windows of periodic text must NOT collide (the
    // structured-collision class a single fixed-base polynomial is
    // weak to): all distinct 6-grams of a period-3 string hash apart
    val periodic = "abcabcabcabcabcabc"
    val hp = hashes(periodic, 6)
    val windows = periodic.sliding(6).toSeq
    assert(windows.zip(hp).toMap.values.toSet.size == windows.distinct.size)
    // code-point alignment (substr semantics), not byte alignment
    assert(hashes("déjàvu", 3).length == 4)
  }

  test("gram-hash registration is scoped: kgramPositions leaves no temp functions behind") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val fresh = spark.newSession()
    val reg = fresh.sessionState.functionRegistry
    assert(!reg.functionExists(FunctionIdentifier("graft_gram_hashes")))
    import fresh.implicits._
    val df = Seq((1L, "hello world hello"), (2L, "hello world again")).toDF("id", "text")
    val pos = graft.llm.Dedup.kgramPositions("id", "text", 5)(df)
    assert(!reg.functionExists(FunctionIdentifier("graft_gram_hashes")),
      "library operator must not install temp functions in the caller's session")
    assert(pos.count() > 0) // the resolved plan still executes after the drop
  }

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
