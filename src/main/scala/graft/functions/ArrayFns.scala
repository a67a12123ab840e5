package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

private[functions] trait DoubleArrayInputs { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall { c => c.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }}
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
}

/** Native Catalyst expressions for the embedding hot path.
  *
  * The composable form (`zip_with` + `aggregate`) materializes an
  * intermediate products array per row and walks two higher-order
  * function frames; these fuse the whole thing into one codegen'd
  * loop over the unsafe array data — the only place in this codebase
  * where a custom Expression beats the built-ins (SURVEY §7.3's
  * predicted exception). Bit-compatible with the composed form:
  * identical ascending-index double accumulation.
  */

/** dot(a, b) = Σ a[i]·b[i]; null when the arrays have different
  * lengths (matching the composed zip_with+aggregate form, where the
  * padding nulls poison the sum); null elements contribute 0.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with DoubleArrayInputs {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // may return null on length mismatch even for non-null inputs
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |      $s += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot/(‖a‖·‖b‖), all three accumulators in ONE pass.
  * Evaluates to exactly `dot / (sqrt(na) * sqrt(nb))` — bit-identical
  * to the composed form so DuckDB oracles keep matching. Null when
  * array lengths differ, like [[DotProduct]].
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with DoubleArrayInputs {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      val yv = if (y.isNullAt(i)) 0.0 else y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xv = $a.isNullAt($i) ? 0.0 : $a.getDouble($i);
         |    double $yv = $b.isNullAt($i) ? 0.0 : $b.getDouble($i);
         |    $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object ArrayFns {

  /** Register graft_dot / graft_cosine on the session's function
    * registry (Column construction from a raw Expression is
    * private[sql]; call_function over a registered builder is the
    * public route). Idempotent.
    *
    * Two lifecycles exist deliberately: COLUMN-returning APIs
    * (dotNative, Ivf.probeCentroids) resolve at the CALLER's later
    * analysis, so they need this persistent registration; a
    * DataFrame-returning operator analyzes its own plan eagerly and
    * should use [[scoped]] instead, leaving the caller's session
    * unchanged.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine",
      exprs => CosineSim(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash",
      MinHashSigAgg.fromExprs, "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      exprs => SimHashAgg(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_ivf_cells",
      exprs => NearestCentroids(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_image_meta",
      exprs => ImageMeta(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_audio_meta",
      exprs => AudioMeta(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_video_meta",
      exprs => VideoMeta(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_byte_stats",
      exprs => ByteStats(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_byte_hist",
      exprs => ByteHist(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_bloom",
      BloomBuildAgg.fromExprs, "built-in")
    reg.createOrReplaceTempFunction("graft_bloom_contains",
      BloomMightContain.fromExprs, "built-in")
    reg.createOrReplaceTempFunction("graft_cms_estimate",
      CmsEstimate.fromExprs, "built-in")
    reg.createOrReplaceTempFunction("graft_gram_hashes",
      exprs => GramHashes(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_nfc",
      exprs => NfcNormalize(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("graft_bpe_encode",
      exprs => BpeEncode(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_cdc_gear",
      exprs => CdcGearChunks(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_cdc_md5",
      exprs => CdcMd5Chunks(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_bands",
      exprs => MinHashBands(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("graft_shingles",
      exprs => WordShingles(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_gopher",
      exprs => GopherSignals(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_quality",
      exprs => QualityScores(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_cdc_words",
      exprs => CdcWordChunks(exprs(0), exprs(1)), "built-in")
  }

  private val registeredNames = Seq(
    "graft_dot", "graft_cosine", "graft_minhash", "graft_simhash",
    "graft_ivf_cells", "graft_image_meta", "graft_audio_meta",
    "graft_video_meta", "graft_byte_stats", "graft_byte_hist",
    "graft_bloom", "graft_bloom_contains", "graft_cms_estimate",
    "graft_gram_hashes", "graft_nfc", "graft_bpe_encode", "graft_cdc_gear",
    "graft_cdc_md5", "graft_minhash_bands", "graft_shingles", "graft_gopher",
    "graft_quality", "graft_cdc_words")

  /** Run `body` with the graft functions registered, then drop any
    * that were NOT already present — a library operator resolving its
    * own native expressions must not permanently install temp
    * functions in the caller's session (the registry is only needed
    * at ANALYSIS time, which is eager at Dataset construction; the
    * resolved plan keeps the expression objects, so dropping after
    * `body` returns is safe). Functions the caller registered
    * explicitly stay. Not re-entrancy-safe against a concurrent
    * thread analyzing graft plans on the SAME session mid-body — the
    * same caveat any temp-function lifecycle has.
    */
  def scoped[T](spark: SparkSession)(body: => T): T = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    val pre = registeredNames.filter(n => reg.functionExists(FunctionIdentifier(n))).toSet
    register(spark)
    try body
    finally registeredNames.filterNot(pre).foreach(n =>
      reg.dropFunction(FunctionIdentifier(n)))
  }

  /** Fused native dot product — [[register]] the session first;
    * arguments must already be array<double>. */
  def dotNative(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Fused native cosine similarity — [[register]] the session first. */
  def cosineNative(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
}
