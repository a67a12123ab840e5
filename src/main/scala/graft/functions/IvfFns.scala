package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_ivf_cells(vec, centroids, nProbe)` — the nProbe nearest
  * centroid ids for a vector, nearest first; ties break to the lower
  * centroid id (the exact order `array_sort` over struct(dist, cid)
  * produced in the composed form this replaces, so the DuckDB oracle
  * replication is unchanged).
  *
  * The composed form built one `aggregate(zip_with(...))`
  * higher-order-function tree PER centroid — 16 interpreted
  * closure-allocating evaluations per row and a plan large enough to
  * dominate cold-run codegen (measured: sim_ivf_topk ~3.9s cold, most
  * of it planning/eval overhead at sf0.1 sizes). Here the centroid
  * matrix is decoded once from its literal into a primitive
  * Array[Array[Double]] and each row costs one tight
  * k·dim multiply-add loop with a k-sized selection — the form a
  * native engine would emit, while staying a pure deterministic
  * expression Catalyst can reason about.
  */
case class NearestCentroids(vec: Expression, centroids: Expression, nProbe: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(vec, centroids, nProbe)

  // centroids/nProbe must be foldable: decode once, not per row
  @transient private lazy val cents: Array[Array[Double]] = {
    val arr = centroids.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      arr.getArray(i).toDoubleArray()
    }
  }
  @transient private lazy val np: Int = nProbe.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val x = v.asInstanceOf[ArrayData].toDoubleArray()
    val k = cents.length
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cents(c)
      var s = 0.0
      var i = 0
      val n = math.min(x.length, cv.length)
      while (i < n) { val d = x(i) - cv(i); s += d * d; i += 1 }
      dists(c) = s
      c += 1
    }
    val m = math.min(np, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1
      var bestD = Double.MaxValue
      c = 0
      while (c < k) {
        if (!taken(c) && (dists(c) < bestD || (dists(c) == bestD && best == -1))) {
          best = c; bestD = dists(c)
        }
        c += 1
      }
      // all remaining distances NaN (degraded vector): fall back to
      // the lowest untaken id — the order array_sort's NaN-last
      // semantics produced in the composed form, instead of crashing
      if (best == -1) {
        c = 0
        while (best == -1 && c < k) { if (!taken(c)) best = c; c += 1 }
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = vec.nullable
  override def prettyName: String = "graft_ivf_cells"

  override def checkInputDataTypes(): TypeCheckResult = {
    def isDoubleArray(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (!isDoubleArray(vec.dataType))
      TypeCheckResult.TypeCheckFailure(s"vec must be array<double>, got ${vec.dataType.simpleString}")
    else if (!(centroids.foldable && (centroids.dataType match {
      case ArrayType(t, _) => isDoubleArray(t)
      case _ => false
    })))
      TypeCheckResult.TypeCheckFailure("centroids must be a foldable array<array<double>> literal")
    else if (!(nProbe.foldable && nProbe.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure("nProbe must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): NearestCentroids =
    copy(vec = newChildren(0), centroids = newChildren(1), nProbe = newChildren(2))
}
