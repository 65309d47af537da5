package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Java-callable kernel for generated code (top-level object: static
  * forwarders, see [[NetKernels]]). */
object ArrKernels {
  /** Count of common elements of two ASCENDING-sorted long arrays, each
    * element counted once (linear merge walk, zero allocation). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        c += 1
        val v = x
        // skip duplicates on both sides: each common VALUE counts once
        while (i < na && a.getLong(i) == v) i += 1
        while (j < nb && b.getLong(j) == v) j += 1
      }
    }
    c
  }
}

/** |A ∩ B| of two ascending-sorted `array<bigint>` columns — the per-pair
  * kernel of hashed-set Jaccard (SURVEY.md §2.11 X2). `array_intersect` on
  * string arrays builds a per-row hash table of UTF8Strings (hundreds of
  * allocations per pair); on pre-hashed, pre-sorted longs the same count is
  * a branchy primitive loop. Sortedness is the caller's contract (produce
  * the arrays with `sort_array(transform(grams, xxhash64))` — per *doc*,
  * not per pair). Null elements are not supported (hashes of non-null
  * strings); null arrays yield null. */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> inputs, got ${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrKernels.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.ArrKernels.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
