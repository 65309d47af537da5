package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequency summary: at most `k` counters. Classic update
  * (hit: +1; room: insert; full: decrement ALL, drop zeros) and the
  * MERGEABLE-SUMMARIES combine rule (add counts, then subtract the
  * (k+1)-th largest and drop non-positive) — so partial buffers fold
  * map-side like any algebraic aggregate and the deterministic error
  * bound survives merging: for every item,
  * `trueCount − n/(k+1) ≤ estimate ≤ trueCount`, hence every item with
  * frequency above n/(k+1) is guaranteed PRESENT. */
final class FreqBuffer(val k: Int) {
  val m: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(s: String): Unit =
    m.get(s) match {
      case Some(c) => m.update(s, c + 1)
      case None if m.size < k => m.update(s, 1L)
      case None =>
        // decrement-all: amortized O(1) per stream item (each decrement
        // pays back an earlier increment), O(k) worst case per call
        val dead = mutable.ArrayBuffer.empty[String]
        m.foreach { case (key, c) =>
          if (c == 1L) dead += key else m.update(key, c - 1)
        }
        dead.foreach(m.remove)
    }

  /** Weighted update (`topKWeighted`): a weight-w arrival is w unit
    * arrivals collapsed into O(k): on a full summary subtract
    * `d = min(w, min counter)` from every counter (and from w), drop
    * zeros — at least one zero frees a slot whenever w exceeds the
    * floor — and insert the remainder. Same invariant as unit MG over
    * the weighted stream: `trueW − W/(k+1) ≤ estimate ≤ trueW`. */
  def addW(s: String, w: Long): Unit = {
    require(w >= 0, s"negative weight $w")
    if (w == 0L) return
    m.get(s) match {
      case Some(c) => m.update(s, c + w)
      case None if m.size < k => m.update(s, w)
      case None =>
        val floor = m.values.min
        val d = Math.min(w, floor)
        val dead = mutable.ArrayBuffer.empty[String]
        m.foreach { case (key, c) =>
          if (c <= d) dead += key else m.update(key, c - d)
        }
        dead.foreach(m.remove)
        if (w > d) m.update(s, w - d)
    }
  }

  def absorb(o: FreqBuffer): Unit = {
    o.m.foreach { case (s, c) => m.update(s, m.getOrElse(s, 0L) + c) }
    if (m.size > k) {
      val counts = m.values.toArray
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - 1 - k) // (k+1)-th largest
      val keep = m.iterator.map { case (s, c) => (s, c - sub) }
        .filter(_._2 > 0L).toList
      m.clear()
      keep.foreach { case (s, c) => m.update(s, c) }
    }
  }
}

/** Approximate heavy hitters over a string column as a native
  * `TypedImperativeAggregate` — the frequent-items member of the sketch
  * family (KMV = distinct, HLL = distinct, t-digest = quantiles, THIS =
  * top frequencies): O(k) state per group regardless of cardinality,
  * partial merge map-side, only k counters per (group × partition) cross
  * the shuffle. A 100 TB "most frequent tokens/domains" pass costs one
  * aggregation with KB-sized reducer state, where an exact groupBy
  * shuffles every distinct item.
  *
  * Like HLL (x8) the result depends on partition/merge order, so it is
  * NOT oracle-hashable; its guarantees are pinned against exact counts
  * in SketchAccuracySpec (presence above n/(k+1), two-sided estimate
  * bound). Output sorted (estimate desc, item asc) for stable display. */
case class FreqAggExpr(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer] with UnaryLike[Expression] {

  require(k > 0, "heavy-hitters requires k > 0")

  override def prettyName: String = "freq_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(k)

  override def update(buffer: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: FreqBuffer): Any = {
    val sorted = buffer.m.toArray.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c): Any
    })
  }

  override def serialize(buffer: FreqBuffer): Array[Byte] = {
    val entries = buffer.m.toArray
    val payload = entries.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val size = 4 + payload.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(payload(i).length)
      bb.put(payload(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new FreqBuffer(k)
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.m.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqAggExpr =
    copy(child = newChild)
}

/** `topKWeighted` — the weighted Misra-Gries variant over (item, weight)
  * pairs: same O(k) buffer, same mergeable combine (absorb is
  * weight-agnostic), the update collapsing a weight-w arrival into one
  * O(k) pass ([[FreqBuffer.addW]]). Guarantees vs TOTAL weight W:
  * `trueW − W/(k+1) ≤ estimate ≤ trueW`, every item with weight share
  * above W/(k+1) present. EXACT (and oracle-hashable) whenever the
  * group's vocabulary fits the k counters — the x110 harness shape;
  * adversarial vocabularies are pinned in SketchAccuracySpec. */
case class WeightedFreqAggExpr(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 0, "weighted heavy-hitters requires k > 0")

  override def prettyName: String = "freq_agg_weighted"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, bigint) input, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(k)

  override def update(buffer: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = left.eval(input)
    val w = right.eval(input)
    if (v != null && w != null)
      buffer.addW(v.asInstanceOf[UTF8String].toString, w.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: FreqBuffer): Any = {
    val sorted = buffer.m.toArray.sortBy { case (s, c) => (-c, s) }
    new GenericArrayData(sorted.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c): Any
    })
  }

  // identical wire format to FreqAggExpr: (count, [len, utf8, weight]*)
  override def serialize(buffer: FreqBuffer): Array[Byte] = {
    val entries = buffer.m.toArray
    val payload = entries.map { case (s, _) => s.getBytes(StandardCharsets.UTF_8) }
    val size = 4 + payload.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(payload(i).length)
      bb.put(payload(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new FreqBuffer(k)
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.m.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): WeightedFreqAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): WeightedFreqAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WeightedFreqAggExpr =
    copy(left = newLeft, right = newRight)
}
