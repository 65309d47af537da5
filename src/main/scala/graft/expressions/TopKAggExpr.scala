package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable bounded top-k buffer: parallel primitive arrays kept sorted
  * (score desc, id asc), binary-search insert with an O(k) shift. For the
  * small k of top-k queries this is allocation-free per input row — the
  * round-1 typed `Aggregator` rebuilt an immutable Vector per row and paid
  * an encoder round-trip per group, which made the "scale path" 45× slower
  * than the window it was meant to beat. */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val ids: Array[Long] = new Array[Long](k)
  val scores: Array[Double] = new Array[Double](k)

  @inline private def better(s: Double, i: Long, s2: Double, i2: Long): Boolean =
    s > s2 || (s == s2 && i < i2)

  def insert(id: Long, score: Double): Unit = {
    // at capacity, only a STRICTLY better element displaces the floor — a
    // duplicate of the floor must not grow the buffer to k+1
    if (n == k && !better(score, id, scores(n - 1), ids(n - 1))) return
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (better(score, id, scores(mid), ids(mid))) hi = mid else lo = mid + 1
    }
    val pos = lo
    val newN = math.min(n + 1, k)
    var i = newN - 1
    while (i > pos) {
      ids(i) = ids(i - 1); scores(i) = scores(i - 1); i -= 1
    }
    if (pos < newN) { ids(pos) = id; scores(pos) = score }
    n = newN
  }

  def absorb(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.ids(i), o.scores(i)); i += 1 }
  }
}

/** Exact distributed top-k as a native `TypedImperativeAggregate`
  * (SURVEY.md §2.11 X3's custom-aggregate piece): each partition folds its
  * rows into a bounded k-element [[TopKBuffer]], partial buffers merge
  * associatively map-side (ObjectHashAggregate partial → final), and only
  * O(k) rows per (group × partition) cross the shuffle.
  *
  * Contrast with the `row_number()` window top-k ([[graft.operators
  * .Similarity.bruteTopK]]): the window must materialize and sort EVERY
  * candidate row of a group on one partition; this aggregate's shuffle
  * volume is k·partitions rows per group regardless of candidate count —
  * the difference between O(N log N) on a hot partition and O(N) map-side
  * work at 100 TB.
  *
  * Ordering: score desc, id asc (deterministic tie-break, matching the
  * harness oracle's `ORDER BY score DESC, id`). Null id/score inputs are
  * skipped (degenerate zero-norm vectors produce null cosine).
  */
case class TopKAggExpr(
    idExpr: Expression,
    scoreExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, "top-k requires k > 0")

  override def left: Expression = idExpr
  override def right: Expression = scoreExpr
  override def prettyName: String = "topk_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (idExpr.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName id must be bigint, got ${idExpr.dataType.simpleString}")
    else if (scoreExpr.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName score must be double, got ${scoreExpr.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idExpr.eval(input)
    val score = scoreExpr.eval(input)
    if (id != null && score != null) {
      val s = score.asInstanceOf[Double]
      // NaN must not enter the buffer: better(x, NaN) is false for every x,
      // so a NaN at the floor would permanently block all later inserts
      // (silent, partition-order-dependent corruption). Degenerate scores
      // (null/NaN) are excluded from top-k by contract — the callers filter
      // them from the window paths identically.
      if (!java.lang.Double.isNaN(s)) buffer.insert(id.asInstanceOf[Long], s)
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val out = new Array[Any](buffer.n)
    var i = 0
    while (i < buffer.n) {
      out(i) = InternalRow(buffer.ids(i), buffer.scores(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.n * 16)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      bb.putLong(buffer.ids(i)); bb.putDouble(buffer.scores(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    // stored pre-sorted and n <= k: direct copy, no re-insert
    var i = 0
    while (i < n) {
      buf.ids(i) = bb.getLong; buf.scores(i) = bb.getDouble; i += 1
    }
    buf.n = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): TopKAggExpr =
    copy(idExpr = newLeft, scoreExpr = newRight)
}
