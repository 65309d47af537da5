package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{bucketStartSecFromNanos, pround4}

/** Time-series anomaly detection over the event stream (SURVEY.md §2.11
  * extension family): per-(type, time-bucket) counts scored against the
  * type's own count distribution — the spike-detection pass an operator of
  * the reference system would run over `stats2`-style bucketed summaries
  * (cf. `/root/reference/README.md:103-129`, the 10-minute `stats2` MV this
  * operator consumes the moral equivalent of).
  *
  * Cross-engine determinism: the flag thresholds are EXACT int64
  * arithmetic. With per-type bucket count `n`, sum `s`, sum-of-squares
  * `ss` (all int64) and a bucket's count `cnt`,
  *
  *   z = (cnt − s/n) / sqrt(var),  var = (n·ss − s²)/n²
  *     = dev / sqrt(varNum),       dev = cnt·n − s, varNum = n·ss − s²
  *
  * so `z > t  ⇔  dev > 0 ∧ dev² > t²·varNum` — pure integer compares, no
  * IEEE in the decision. The reported `max_z4` does one double division +
  * correctly-rounded sqrt with pround4, the established parity form.
  * Overflow headroom: dev ≤ cnt·n and varNum ≤ n·ss stay below ~1e15 for
  * millions of buckets of thousands of events; int64 holds to 9.2e18.
  *
  * 100 TB design: two shuffles, both on aggregated data — the bucket
  * aggregation shuffles O(types × buckets) counted rows (map-side partial
  * combine does the heavy lifting on the raw scan), and the per-type stats
  * (one row per type) broadcast back onto the buckets. The raw stream is
  * scanned exactly once.
  */
object TimeSeries {

  /** Per-(typeCol, bucket) counts from an epoch-nanos Long timestamp. */
  def bucketCounts(events: DataFrame, typeCol: String, tsNanosCol: String,
      minutes: Int): DataFrame =
    events
      .groupBy(col(typeCol), bucketStartSecFromNanos(tsNanosCol, minutes).as("bucket_start"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-type spike summary: bucket population, z>2 / z>3 spike counts
    * (exact integer decisions), and the maximum z-score (pround4). */
  def spikeStats(events: DataFrame, typeCol: String, tsNanosCol: String,
      minutes: Int): DataFrame = {
    val b = bucketCounts(events, typeCol, tsNanosCol, minutes)
      .transform(Caching.persisted)
    val stats = b.groupBy(typeCol).agg(
      count(lit(1)).as("n"),
      sum("cnt").as("s"),
      sum(col("cnt") * col("cnt")).as("ss"))
    val dev = col("cnt") * col("n") - col("s")
    val varNum = col("n") * col("ss") - col("s") * col("s")
    b.join(broadcast(stats), typeCol)
      .select(col(typeCol), col("n"), col("s"),
        dev.as("dev"), varNum.as("varnum"))
      .groupBy(typeCol)
      .agg(
        max("n").as("n_buckets"),
        max("s").as("total_events"),
        sum(when(col("dev") > 0 && col("dev") * col("dev") > lit(4L) * col("varnum"), 1L)
          .otherwise(0L)).as("z2_cnt"),
        sum(when(col("dev") > 0 && col("dev") * col("dev") > lit(9L) * col("varnum"), 1L)
          .otherwise(0L)).as("z3_cnt"),
        max(when(col("varnum") > 0,
          pround4(col("dev").cast("double") / sqrt(col("varnum").cast("double")))))
          .as("max_z4"))
  }
}
