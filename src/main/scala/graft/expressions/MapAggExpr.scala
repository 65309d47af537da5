package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Key-wise map aggregation — the reference engine family's
  * `sumMap` / `minMap` / `maxMap` surface (ClickHouse's map combinators,
  * used all over its summary-table idiom to keep per-key counters in ONE
  * row): each input contributes `(key, value)`, the group's result is
  * every key's fold under `op`, emitted as entries SORTED BY KEY — the
  * same convention as ClickHouse's sorted keys/values arrays, and the
  * property that makes the result deterministic and oracle-hashable
  * (sum/min/max are commutative folds, so partition order cannot show).
  *
  * Why a native aggregate instead of explode + two-level groupBy: ONE
  * hash aggregation keyed by the group — partial maps combine map-side
  * and only distinct-key maps per (group × partition) cross the shuffle,
  * vs a shuffle row per (group, key) pair. The right trade for the
  * summary-table shape this mirrors: small maps (rcodes, qtypes, event
  * types) over huge streams. For maps with very large key sets per
  * group, prefer the relational explode path — buffer size is the
  * classic in-memory-agg bound. */
final class MapAggBuffer {
  val m: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def add(k: String, v: Long, op: Int): Unit =
    m.get(k) match {
      case None => m.update(k, v)
      case Some(c) => m.update(k, MapAggExpr.fold(op, c, v))
    }

  def absorb(o: MapAggBuffer, op: Int): Unit =
    o.m.foreach { case (k, v) => add(k, v, op) }
}

object MapAggExpr {
  val Sum = 0; val Min = 1; val Max = 2

  def fold(op: Int, a: Long, b: Long): Long = op match {
    case Sum => Math.addExact(a, b) // ANSI-faithful: overflow throws, never wraps
    case Min => Math.min(a, b)
    case Max => Math.max(a, b)
  }

  def opOf(name: String): Int = name match {
    case "sum" => Sum
    case "min" => Min
    case "max" => Max
    case other => throw new IllegalArgumentException(
      s"map_agg op must be sum|min|max, got $other")
  }
}

/** See [[MapAggBuffer]] docs. `left` is the string key, `right` the long
  * value; rows with a null key or value are ignored (an absent
  * observation, matching aggregate null semantics). */
case class MapAggExpr(
    left: Expression,
    right: Expression,
    op: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MapAggBuffer] with BinaryLike[Expression] {

  override def prettyName: String = "map_agg"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("val", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, long) input, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def createAggregationBuffer(): MapAggBuffer = new MapAggBuffer

  override def update(buffer: MapAggBuffer, input: InternalRow): MapAggBuffer = {
    val k = left.eval(input)
    val v = right.eval(input)
    if (k != null && v != null)
      buffer.add(k.asInstanceOf[UTF8String].toString, v.asInstanceOf[Long], op)
    buffer
  }

  override def merge(buffer: MapAggBuffer, other: MapAggBuffer): MapAggBuffer = {
    buffer.absorb(other, op)
    buffer
  }

  override def eval(buffer: MapAggBuffer): Any = {
    val sorted = buffer.m.toArray.sortBy(_._1)
    new GenericArrayData(sorted.map { case (k, v) =>
      InternalRow(UTF8String.fromString(k), v): Any
    })
  }

  override def serialize(buffer: MapAggBuffer): Array[Byte] = {
    val entries = buffer.m.toArray
    val payload = entries.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + payload.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.indices.foreach { i =>
      bb.putInt(payload(i).length)
      bb.put(payload(i))
      bb.putLong(entries(i)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MapAggBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MapAggBuffer
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.m.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MapAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MapAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MapAggExpr =
    copy(left = newLeft, right = newRight)
}
