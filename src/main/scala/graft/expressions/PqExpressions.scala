package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels — codebook-as-DATA replacements for the
  * round-6 literal-expression PQ encode/LUT (SURVEY.md §2.11 R58).
  *
  * The literal recipe hit two hard ceilings at production codebook sizes
  * (8-16 subspaces × 256 centroids): a per-subspace argmin unrolled over k
  * centroids blows janino's 64 KB per-method limit (already at k=16 it
  * forced staged projections), and building the 2·m·k-node expression tree
  * cost ~0.76s of driver time per query. Here the codebook rides the
  * serialized plan as a reference object (the broadcast-variable pattern:
  * ~128 KB for 8×256×8 doubles, shipped once per executor) and the
  * generated code is a constant-size LOOP over it — expression size is
  * independent of k, and whole-stage codegen keeps the argmin in the same
  * fused stage as the rest of the projection.
  *
  * IEEE parity with the DuckDB oracle (which reads the same codebook rows
  * from parquet): every dot accumulates left-to-right like
  * [[VecKernels.dot]]; centroid self-dots accumulate in the same order as
  * the SQL's `c[1]*c[1] + … + c[8]*c[8]` chain; argmin keeps the FIRST
  * index achieving the minimum (strict `<`), matching
  * `ROW_NUMBER() OVER (ORDER BY dist, j)`.
  */
object PqKernels {

  /** dist(s,j) = |c|² − 2·(nv[s·d..]·c) for the flat [s][j][i] codebook;
    * returns the per-subspace argmin codes, or null on a degenerate
    * vector (size mismatch / null element) — mirroring the null-poisoning
    * of the dot-product form it replaces. */
  def encode(nv: ArrayData, sub: Array[Double], selfDots: Array[Double],
      m: Int, ksub: Int, d: Int): ArrayData = {
    if (nv.numElements() != m * d) return null
    val codes = new Array[Any](m)
    var s = 0
    while (s < m) {
      var bestJ = -1
      var bestDist = 0.0
      var j = 0
      while (j < ksub) {
        var dot = 0.0
        var i = 0
        while (i < d) {
          if (nv.isNullAt(s * d + i)) return null
          dot += nv.getDouble(s * d + i) * sub((s * ksub + j) * d + i)
          i += 1
        }
        val dist = selfDots(s * ksub + j) - 2.0 * dot
        if (bestJ < 0 || dist < bestDist) { bestJ = j; bestDist = dist }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** RESIDUAL encode (IVFADC): codes of `nv − c(bucket)` against the
    * residual codebook — per subspace s, centroid j:
    * `dist = |c|² − 2·Σᵢ (nv[s·d+i] − cc[bucket·dim + s·d+i])·c[i]`,
    * same left-assoc accumulation and first-index-wins argmin as
    * [[encode]]. `cc` is the flat IVF centroid matrix. Null on
    * degenerate input or an out-of-range bucket. */
  def encodeResidual(nv: ArrayData, bucket: Int, cc: Array[Double],
      sub: Array[Double], selfDots: Array[Double], m: Int, ksub: Int, d: Int): ArrayData = {
    val dim = m * d
    if (nv.numElements() != dim || bucket < 0 || (bucket + 1) * dim > cc.length) return null
    val cbase = bucket * dim
    val codes = new Array[Any](m)
    var s = 0
    while (s < m) {
      var bestJ = -1
      var bestDist = 0.0
      var j = 0
      while (j < ksub) {
        var dot = 0.0
        var i = 0
        while (i < d) {
          if (nv.isNullAt(s * d + i)) return null
          dot += (nv.getDouble(s * d + i) - cc(cbase + s * d + i)) * sub((s * ksub + j) * d + i)
          i += 1
        }
        val dist = selfDots(s * ksub + j) - 2.0 * dot
        if (bestJ < 0 || dist < bestDist) { bestJ = j; bestDist = dist }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new GenericArrayData(codes)
  }

  /** lut[s·ksub + j] = nv[s·d..]·c(s,j) — the query-side ADC lookup
    * table, one dot per codebook entry, computed once per query row. */
  def lut(nv: ArrayData, sub: Array[Double], m: Int, ksub: Int, d: Int): ArrayData = {
    if (nv.numElements() != m * d) return null
    val out = new Array[Any](m * ksub)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ksub) {
        var dot = 0.0
        var i = 0
        while (i < d) {
          if (nv.isNullAt(s * d + i)) return null
          dot += nv.getDouble(s * d + i) * sub((s * ksub + j) * d + i)
          i += 1
        }
        out(s * ksub + j) = dot
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** Shared plumbing: flatten the codebook once per expression instance and
  * precompute centroid self-dots in kernel accumulation order. */
trait PqCodebookExpr { self: UnaryExpression =>
  def sub: Seq[Seq[Seq[Double]]]

  @transient protected lazy val m: Int = sub.size
  @transient protected lazy val ksub: Int = sub.head.size
  @transient protected lazy val d: Int = sub.head.head.size
  @transient protected lazy val subFlat: Array[Double] =
    sub.flatten.flatten.toArray
  @transient protected lazy val selfDots: Array[Double] =
    sub.flatten.map(_.foldLeft(0.0)((a, x) => a + x * x)).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    VecExpressions.requireDoubleArray(child, prettyName)
  override def nullable: Boolean = true
}

/** Per-subspace PQ codes (array<int> of size m) of a unit-vector column
  * against a pinned codebook carried as plan data. */
case class PqEncodeExpr(child: Expression, sub: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqCodebookExpr {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], subFlat, selfDots, m, ksub, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val subRef = ctx.addReferenceObj("pqSub", subFlat, "double[]")
    val sdRef = ctx.addReferenceObj("pqSelfDots", selfDots, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val tmp = ctx.freshName("codes")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $tmp =
          graft.expressions.PqKernels.encode($v, $subRef, $sdRef, $m, $ksub, $d);
        if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** Residual PQ codes (IVFADC): per-subspace codes of `nv − c(bucket)`
  * against a pinned residual codebook, both matrices carried as plan
  * data. Children: (unit vector, assigned cell id). */
case class PqEncodeResidualExpr(left: Expression, right: Expression,
    centers: Seq[Seq[Double]], sub: Seq[Seq[Seq[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  @transient private lazy val m: Int = sub.size
  @transient private lazy val ksub: Int = sub.head.size
  @transient private lazy val d: Int = sub.head.head.size
  @transient private lazy val subFlat: Array[Double] = sub.flatten.flatten.toArray
  @transient private lazy val selfDots: Array[Double] =
    sub.flatten.map(_.foldLeft(0.0)((a, x) => a + x * x)).toArray
  @transient private lazy val ccFlat: Array[Double] = centers.flatten.toArray

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecExpressions.requireDoubleArray(left, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else if (right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an int cell id, got ${right.dataType.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_residual"

  override def nullSafeEval(nv: Any, bucket: Any): Any =
    PqKernels.encodeResidual(nv.asInstanceOf[ArrayData], bucket.asInstanceOf[Int],
      ccFlat, subFlat, selfDots, m, ksub, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ccRef = ctx.addReferenceObj("ivfCenters", ccFlat, "double[]")
    val subRef = ctx.addReferenceObj("pqSub", subFlat, "double[]")
    val sdRef = ctx.addReferenceObj("pqSelfDots", selfDots, "double[]")
    nullSafeCodeGen(ctx, ev, (nv, b) => {
      val tmp = ctx.freshName("codes")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $tmp =
          graft.expressions.PqKernels.encodeResidual($nv, $b, $ccRef, $subRef, $sdRef, $m, $ksub, $d);
        if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqEncodeResidualExpr =
    copy(left = newLeft, right = newRight)
}

/** Query-side ADC lookup table (array<double> of size m·ksub) of a
  * unit-vector column against a pinned codebook carried as plan data. */
case class PqLutExpr(child: Expression, sub: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with PqCodebookExpr {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.lut(input.asInstanceOf[ArrayData], subFlat, m, ksub, d)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val subRef = ctx.addReferenceObj("pqSub", subFlat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val tmp = ctx.freshName("lut")
      s"""
        org.apache.spark.sql.catalyst.util.ArrayData $tmp =
          graft.expressions.PqKernels.lut($v, $subRef, $m, $ksub, $d);
        if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLutExpr =
    copy(child = newChild)
}
