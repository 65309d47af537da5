package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Java-callable kernel for generated code (top-level object: static
  * forwarders, see [[NetKernels]]). */
object ArrKernels {

  private val SPACE = UTF8String.fromString(" ")

  /** Distinct word n-grams of a token array, first-occurrence order —
    * semantics identical to
    * `array_distinct(transform(sequence(...), i => concat_ws(" ", slice(toks, i, n))))`
    * (null tokens skipped like concat_ws; < n tokens → empty array), but
    * one kernel call per DOC instead of an interpreted lambda + slice
    * allocation per GRAM (HOFs are CodegenFallback — this was the dominant
    * per-row cost of the whole dedup family). */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    // materialize tokens ONCE: each getUTF8String on UnsafeArrayData
    // allocates a wrapper, and the sliding window would otherwise re-read
    // every token n times
    val ts = new Array[UTF8String](cnt)
    var p = 0
    while (p < cnt) {
      ts(p) = if (toks.isNullAt(p)) null else toks.getUTF8String(p)
      p += 1
    }
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= cnt - n) {
      var j = 0
      var m = 0
      while (j < n) {
        val t = ts(i + j)
        if (t != null) { parts(m) = t; m += 1 } // concat_ws skips nulls
        j += 1
      }
      seen.add(UTF8String.concatWs(SPACE, java.util.Arrays.copyOf(parts, m): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]].asInstanceOf[Array[Any]])
  }
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

/** Distinct word n-gram shingles of an `array<string>` token column —
  * codegen'd kernel form of the HOF pipeline (see [[ArrKernels.shingles]]).
  * Null input array → null (callers coalesce to empty, preserving the
  * `when(size >= n, ...)` semantics of the HOF form). */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "shingle size must be positive")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingles"

  override protected def nullSafeEval(input: Any): Any =
    ArrKernels.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ArrKernels.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}
