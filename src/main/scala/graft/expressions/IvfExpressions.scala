package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** IVF cell-assignment / probe-selection kernels — centroids as plan DATA
  * (reference objects) instead of literal expression trees.
  *
  * Same motivation as [[PqKernels]]: the literal `nearestCell` when-chain
  * (k centroids × dim multiply terms, then `least` + k CASE branches)
  * costs driver tree-construction time on EVERY query build and grows
  * linearly in k×dim, while a reference-object loop is constant-size.
  * Arithmetic is bit-identical to the literal form it replaces — dists
  * accumulate `selfDot(c) − 2·(nv·c)` with the same left-assoc order
  * ([[VecKernels.dot]]); ties keep the FIRST index achieving the minimum
  * (the when-chain's first-match rule); all-NaN dists yield −1 (the
  * chain's fall-through) — so every oracle CASE chain replays unchanged.
  */
object IvfKernels {

  /** Nearest-centroid id by (dist², id), or −1 when no dist is comparable
    * (NaN input — the literal chain's fall-through value). */
  def nearestCell(nv: ArrayData, centers: Array[Double], selfDots: Array[Double],
      k: Int, dim: Int): Int = {
    if (nv.numElements() != dim) return -1
    var bestJ = -1
    var bestDist = 0.0
    var j = 0
    while (j < k) {
      var dot = 0.0
      var i = 0
      while (i < dim) {
        if (nv.isNullAt(i)) return -1
        dot += nv.getDouble(i) * centers(j * dim + i)
        i += 1
      }
      val dist = selfDots(j) - 2.0 * dot
      // NaN never wins (mirrors `least` + `d === min` both rejecting NaN)
      if (!java.lang.Double.isNaN(dist) && (bestJ < 0 || dist < bestDist)) {
        bestJ = j; bestDist = dist
      }
      j += 1
    }
    bestJ
  }

  /** The `nprobe` nearest cell ids in (dist², id) ascending order — the
    * probe set the window form selected with ROW_NUMBER OVER (ORDER BY
    * dist2, bucket). NaN dists sort last with ties by id, exactly like
    * Spark's double ordering (primitive `<`/`==` give the same -0.0==0.0
    * tie semantics). */
  def probes(nv: ArrayData, centers: Array[Double], selfDots: Array[Double],
      k: Int, dim: Int, nprobe: Int): ArrayData = {
    val n = math.min(nprobe, k)
    val dists = new Array[Double](k)
    var j = 0
    while (j < k) {
      var dot = 0.0
      var i = 0
      var ok = true
      while (ok && i < dim) {
        if (nv.isNullAt(i)) ok = false
        else { dot += nv.getDouble(i) * centers(j * dim + i); i += 1 }
      }
      dists(j) = if (ok && nv.numElements() == dim) selfDots(j) - 2.0 * dot else Double.NaN
      j += 1
    }
    // (dist, id) selection sort of the top n — k is small (cells, not rows)
    def less(a: Int, b: Int): Boolean = {
      val da = dists(a); val db = dists(b)
      val na = java.lang.Double.isNaN(da); val nb = java.lang.Double.isNaN(db)
      if (na && nb) a < b // NaN ties break by id, like ORDER BY dist2, bucket
      else if (na) false // NaN sorts last
      else if (nb) true
      else if (da < db) true
      else if (da == db) a < b
      else false
    }
    val sel = new Array[Any](n)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < n) {
      var best = -1
      var c = 0
      while (c < k) {
        if (!used(c) && (best < 0 || less(c, best))) best = c
        c += 1
      }
      used(best) = true
      sel(r) = best
      r += 1
    }
    new GenericArrayData(sel)
  }
}

/** Shared centroid-matrix plumbing (flatten + kernel-order self-dots). */
trait IvfCentersExpr { self: UnaryExpression =>
  def centers: Seq[Seq[Double]]

  @transient protected lazy val k: Int = centers.size
  @transient protected lazy val dim: Int = centers.head.size
  @transient protected lazy val flat: Array[Double] = centers.flatten.toArray
  @transient protected lazy val selfDots: Array[Double] =
    centers.map(_.foldLeft(0.0)((a, x) => a + x * x)).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    VecExpressions.requireDoubleArray(child, prettyName)
}

/** Nearest-cell id of a unit-vector column against a pinned centroid
  * matrix carried as plan data. Never null: degenerate input yields −1,
  * like the literal when-chain's fall-through. */
case class NearestCellExpr(child: Expression, centers: Seq[Seq[Double]])
    extends UnaryExpression with IvfCentersExpr {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "ivf_cell"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) -1
    else IvfKernels.nearestCell(v.asInstanceOf[ArrayData], flat, selfDots, k, dim)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCenters", flat, "double[]")
    val sdRef = ctx.addReferenceObj("ivfSelfDots", selfDots, "double[]")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        int ${ev.value} = -1;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.expressions.IvfKernels.nearestCell(
            ${childGen.value}, $cRef, $sdRef, $k, $dim);
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCellExpr =
    copy(child = newChild)
}

/** The `nprobe` nearest cell ids (array<int>, (dist², id) order) of a
  * query unit-vector against a pinned centroid matrix carried as plan
  * data — replaces the explode-all-cells + window probe selection. */
case class IvfProbesExpr(child: Expression, centers: Seq[Seq[Double]], nprobe: Int)
    extends UnaryExpression with IvfCentersExpr {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_probes"

  override protected def nullSafeEval(input: Any): Any =
    IvfKernels.probes(input.asInstanceOf[ArrayData], flat, selfDots, k, dim, nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("ivfCenters", flat, "double[]")
    val sdRef = ctx.addReferenceObj("ivfSelfDots", selfDots, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.expressions.IvfKernels.probes($v, $cRef, $sdRef, $k, $dim, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): IvfProbesExpr =
    copy(child = newChild)
}
