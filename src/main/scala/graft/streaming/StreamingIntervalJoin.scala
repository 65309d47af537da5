package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the STREAMING counterpart of
  * [[graft.operators.AsOfJoin.intervalJoin]], built on Spark's native
  * watermarked stream-stream inner join (the one streaming surface the
  * reference's single-stream design never needs, exercised here because
  * the extension operators do): left events joined to right events with
  * equal keys and `rightTs ∈ [leftTs, leftTs + length)`.
  *
  * State bounding is Spark's own: both sides carry watermarks, and the
  * time-range condition lets the engine expire left rows once
  * `watermark > leftTs + length` and right rows once `watermark >
  * rightTs` — exactly the bounded-state contract a 100 TB continuous
  * join needs (an unconstrained stream-stream join would buffer both
  * streams forever).
  *
  * Timestamps are microsecond TimestampType on both sides (cast from
  * the epoch-µs longs the batch operator compares), so the half-open
  * bound is expressed as `>= left AND < left + length`. */
object StreamingIntervalJoin {

  /** Build the joined streaming DataFrame.
    * @param left     streaming frame with `keys`, `leftTsUs` (epoch µs long)
    * @param right    streaming frame with `keys`, `rightTsUs`
    * @param lengthUs window length in µs
    * @param delayUs  watermark delay in µs (late-data tolerance) */
  def joined(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsUs: String, rightTsUs: String, lengthUs: Long,
      delayUs: Long): DataFrame = {
    val delaySec = math.max(1L, delayUs / 1000000L)
    val l = left
      .withColumn("_lts", timestamp_micros(col(leftTsUs)))
      .withWatermark("_lts", s"$delaySec seconds")
    val r = right
      .withColumn("_rts", timestamp_micros(col(rightTsUs)))
      .withWatermark("_rts", s"$delaySec seconds")
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val rKeyCols = keys.map(r(_))
    l.join(r, keyCond &&
        col("_rts") >= col("_lts") &&
        col("_rts") < col("_lts") + expr(s"INTERVAL ${lengthUs} MICROSECONDS"))
      .drop("_lts", "_rts")
      .drop(rKeyCols.head, rKeyCols.tail: _*)
  }
}
