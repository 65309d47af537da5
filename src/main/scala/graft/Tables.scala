package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test corpus (`/root/repo/TESTDATA.md`).
  *
  * LOGICAL CONTRACT: `events.ts` is epoch-NANOSECOND Longs to every
  * downstream site (exact integer arithmetic — converting to double or
  * dividing with `/` would lose precision above 2^53 ns; all bucketing uses
  * integer `DIV`, matching DuckDB `epoch_us`). The PHYSICAL parquet type is
  * a property of whoever wrote the corpus and has already changed once
  * (TIMESTAMP(NANOS) through round 7, timestamp[us] from round 8), so
  * [[events]] normalizes every supported physical form to the logical
  * contract in ONE place instead of letting 50+ query sites assume a type:
  *   - INT64 TIMESTAMP(NANOS) + `spark.sql.legacy.parquet.nanosAsLong`
  *     → arrives as LongType epoch-nanos already: passthrough.
  *   - timestamp[us] (TIMESTAMP or TIMESTAMP_NTZ under the UTC session tz
  *     every entrypoint pins) → `unix_micros(ts) * 1000L`: exact, since µs
  *     data carries no sub-µs information.
  * Anything else fails loudly at load, not as 50 per-query analysis errors.
  * Trade-off, documented for the 100 TB case: the µs path turns `ts` into a
  * projection, so parquet min/max range pushdown on raw `ts` is lost; none
  * of the engine's queries range-scan events by raw `ts` (they bucket), and
  * a lake deployment would partition events by date, which prunes by
  * directory rather than row-group stats. */
object Tables {

  private def conf(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** The corpus is static for a session, so the analyzed frame (schema +
    * file listing, NOT data) is memoized per (session, path): every
    * `spark.read.parquet` call re-lists the directory and re-reads the
    * parquet footer on the driver, ~90 ms of per-query build time that
    * repeats identically across the 80-query harness. Keyed on the
    * session too, so tests with their own sessions never share plans.
    *
    * CONTRACT: a memoized path's directory must be immutable for the
    * session — the entry pins the analyzed FILE LISTING, so a rewrite of
    * the directory mid-session would silently serve the old files. Tools
    * that regenerate a dataset must call [[invalidate]] on it. Entries
    * whose session's context has stopped are purged on every access, so
    * suites that stop their sessions don't accumulate dead plans in one
    * long-lived JVM. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    conf(spark)
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    cache.computeIfAbsent((spark, s"$dir/$name.parquet"),
      key => spark.read.parquet(key._2))
  }

  /** Drop every memoized frame for `path` (any session) — required after
    * rewriting a dataset directory in place; see the cache contract. */
  def invalidate(path: String): Unit =
    cache.keySet.removeIf(k => k._2 == path || k._2.startsWith(s"$path/"))

  /** Drop all memoized frames (test/tool hygiene). */
  def clearCache(): Unit = cache.clear()

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** `ts` normalized to LongType epoch nanoseconds regardless of the
    * corpus's physical parquet type (see object doc). The normalizing
    * projection is built per call over the memoized base frame — a
    * `withColumn` on an already-analyzed plan, so the ~90 ms footer-read
    * the cache exists to save is still saved. */
  def events(s: SparkSession, d: String): DataFrame = {
    val base = table(s, d, "events")
    base.schema("ts").dataType match {
      case LongType => base // legacy TIMESTAMP(NANOS) + nanosAsLong corpus
      case TimestampType | TimestampNTZType =>
        // NTZ → Timestamp cast is exact under the UTC session timezone the
        // entrypoints pin; * 1000L restores the epoch-nanos Long contract.
        // Guard, not assume: under any other session tz the cast would
        // silently SHIFT every epoch — fail loudly here instead. The
        // no-fallback get resolves the conf's EFFECTIVE value (the JVM
        // default timezone when unset), so an unset session tz on a
        // non-UTC JVM fails here instead of slipping past a fallback.
        require(s.conf.get("spark.sql.session.timeZone") == "UTC",
          "events.ts normalization requires spark.sql.session.timeZone=UTC " +
            "(the NTZ cast is session-tz-sensitive); set it in the builder")
        base.withColumn(
          "ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other in $d — expected " +
            "epoch-nanos INT64 (legacy) or timestamp[us]; extend " +
            "Tables.events if the corpus writer changed again")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
