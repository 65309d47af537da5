package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dense-vector kernels (SURVEY.md §2.11 X3).
  *
  * Round 1 computed dot products with `aggregate(zip_with(...))` — Spark's
  * higher-order functions are `CodegenFallback`: every pair evaluation left
  * whole-stage codegen, allocated a zipped intermediate array, and invoked
  * an interpreted lambda per element. On pair-heavy shapes (x6 all-pairs,
  * x9 scored join) that interpreted per-pair cost dominated the round-1
  * bench tail. These expressions keep the identical left-to-right IEEE
  * accumulation order — so every oracle-matched result is bit-identical —
  * but run as a tight primitive loop inside the enclosing codegen stage.
  *
  * Null semantics mirror the HOF forms exactly: null array → null, length
  * mismatch → null (zip_with pads with null, poisoning the sum), any null
  * element → null.
  */
/** Java-callable kernels used by generated code. TOP-LEVEL object on
  * purpose: scalac emits static forwarders only for top-level objects, and
  * janino resolves `VecKernels.dot(...)` through them — a nested
  * `Outer.Inner.f(...)` reference is NOT resolvable from generated Java and
  * silently drops the whole expression tree to interpreted mode.
  *
  * Boxed return: null means SQL NULL (mismatched length / null element);
  * one box per *vector* op, vs one per element in the HOF form. */
object VecKernels {
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Element-wise division by a scalar — identical per-element ops to
    * `transform(a, x => x / d)` (independent divisions, no accumulation),
    * but codegen'd and evaluating the divisor ONCE instead of per element
    * (the HOF form re-evaluated an embedded l2Norm per element: O(dim²)
    * interpreted work per row). Null element → null element, like the
    * HOF. */
  def scale(a: ArrayData, d: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) out(i) = a.getDouble(i) / d
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** sqrt of the in-order sum of squares — identical accumulation to
    * `sqrt(aggregate(transform(a, x*x), 0.0, +))`. */
  def norm(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      s += x * x
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }
}

/** Java-callable sign-random-projection kernel — TOP-LEVEL for the same
  * static-forwarder reason as [[VecKernels]]. */
object LshKernels {
  /** Hyperplane bucket id: fold over planes with plane 0 as the MOST
    * significant bit (`acc*2 + bit`), bit = (v·plane > 0). Identical bit
    * order and per-plane dot accumulation (left-to-right `s += v[i]*p[i]`)
    * to the HOF form it replaces, so x7's oracle replays unchanged. A
    * degenerate dot (length mismatch / null element) contributes bit 0,
    * exactly like `when(null > 0, 1).otherwise(0)` did. */
  def bucket(v: ArrayData, planes: Array[Array[Double]]): Int = {
    var acc = 0
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var bit = 0
      if (v.numElements() == pl.length) {
        var s = 0.0
        var i = 0
        var ok = true
        while (ok && i < pl.length) {
          if (v.isNullAt(i)) ok = false
          else { s += v.getDouble(i) * pl(i); i += 1 }
        }
        if (ok && s > 0) bit = 1
      }
      acc = acc * 2 + bit
      p += 1
    }
    acc
  }
}

object VecExpressions {

  private[expressions] def requireDoubleArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double> input, got ${other.simpleString}")
    }
}

/** Σ aᵢ·bᵢ over two `array<double>` columns — codegen'd, allocation-free. */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecExpressions.requireDoubleArray(left, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecExpressions.requireDoubleArray(right, prettyName)
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dot")
      s"""
        java.lang.Double $tmp = graft.expressions.VecKernels.dot($a, $b);
        if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Sign-random-projection bucket id of an `array<double>` column against a
  * literal hyperplane matrix — codegen'd replacement for the last
  * interpreted HOF in the similarity family (`aggregate` over a plane
  * sequence was CodegenFallback: O(rows×bits) interpreted lambdas with a
  * boxed accumulator). The plane matrix rides along as a codegen reference
  * object; the whole fold is one tight primitive loop. */
case class LshBucketExpr(child: Expression, planes: Seq[Seq[Double]]) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExpressions.requireDoubleArray(child, prettyName)
  override def dataType: DataType = IntegerType
  // a NULL vector yields bucket 0, exactly like the HOF fold it replaced
  // (every per-plane `when(null_dot > 0, 1).otherwise(0)` bit was 0) —
  // so the expression never returns null
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_bucket"

  @transient private lazy val planesArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else LshKernels.bucket(v.asInstanceOf[ArrayData], planesArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planesArr, "double[][]")
    val childGen = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${childGen.code}
        int ${ev.value} = 0;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.expressions.LshKernels.bucket(${childGen.value}, $ref);
        }
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

/** `a / d` element-wise over an `array<double>` and a double scalar —
  * codegen'd; the divisor is evaluated once per row (vs per element in
  * the `transform` HOF form it replaces). */
case class VecScaleExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecExpressions.requireDoubleArray(left, prettyName)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else if (right.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double divisor, got ${right.dataType.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_scale"

  override def nullSafeEval(a: Any, d: Any): Any =
    VecKernels.scale(a.asInstanceOf[ArrayData], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, d) =>
      s"${ev.value} = graft.expressions.VecKernels.scale($a, $d);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecScaleExpr =
    copy(left = newLeft, right = newRight)
}

/** √(Σ aᵢ²) of an `array<double>` column — codegen'd, allocation-free. */
case class L2NormExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecExpressions.requireDoubleArray(child, prettyName)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(input: Any): Any =
    VecKernels.norm(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val tmp = ctx.freshName("norm")
      s"""
        java.lang.Double $tmp = graft.expressions.VecKernels.norm($a);
        if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): L2NormExpr =
    copy(child = newChild)
}
