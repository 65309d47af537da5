package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.Querylog
import graft.streaming.MvPipeline
import graft.views.Summaries

/** The user-facing surface of the engine — everything a user of the
  * reference system does today, as one facade:
  *
  *   - ingest AdGuard Home querylog files (batch backfill or streaming tail)
  *   - maintain the 8 summary tables (`/root/reference/README.md:24-189`)
  *   - run the implied read-side queries (top-N blocked/visited domains,
  *     per-client stats, per-type/rcode/TLD/upstream counts, 10-minute
  *     time series) without touching raw SQL
  *
  * Reads go against the *summary* state (O(summary) not O(log), the whole
  * point of the reference's MV design, SURVEY.md §3.3); `log2` itself stays
  * available for ad-hoc work.
  */
final class AdGuardAnalytics(spark: SparkSession, stateDir: String) {

  /** Batch-ingest querylog JSON lines and fold them into the summaries —
    * the backfill path; equivalent to replaying the collector
    * (collector.py:54-75) over an existing file. */
  def ingestBatch(querylogPath: String): Unit = {
    val lines = spark.read.text(querylogPath)
    MvPipeline.processBatch(lines, stateDir)
  }

  /** Tail a directory of querylog files continuously — the collector
    * daemon. `availableNow=true` processes the backlog and stops. */
  def startStreaming(
      inputDir: String,
      checkpointDir: String,
      availableNow: Boolean = false,
      intervalMs: Long = 1000L
  ): StreamingQuery =
    MvPipeline.start(spark, inputDir, stateDir, checkpointDir,
      if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime(intervalMs))

  /** Parse querylog lines to a `log2` DataFrame without touching state —
    * the ad-hoc/analytical entry. */
  def parse(querylogPath: String): DataFrame =
    Querylog.parse(spark.read.text(querylogPath))

  // ------------------------------------------------------------- reads ----

  private def state(view: String): DataFrame = MvPipeline.readState(spark, stateDir, view)

  def blockedDomains: DataFrame = state("blocked_domains")
  def visitedDomains: DataFrame = state("visited_domains")
  def clientStats: DataFrame    = state("clients_stats")
  def qtStats: DataFrame        = state("qt_stats")
  def rcodeStats: DataFrame     = state("rcode_stats")
  def tldStats: DataFrame       = state("tld_stats")
  def upstreamStats: DataFrame  = state("upstream_stats")

  /** The reference's headline dashboards: top-N most blocked / visited
    * domains (`ORDER BY count DESC LIMIT n` over the summaries — planned as
    * TakeOrderedAndProject, no full sort). */
  def topBlocked(n: Int): DataFrame =
    blockedDomains.orderBy(col("count").desc, col("QH")).limit(n)
  def topVisited(n: Int): DataFrame =
    visitedDomains.orderBy(col("count").desc, col("QH")).limit(n)

  /** 10-minute per-client time series (stats2); optionally one client. */
  def timeSeries(ip: Option[String] = None): DataFrame = {
    val s = state("stats2")
    ip.fold(s)(v => s.filter(col("IP") === v)).orderBy("IP", "bucket_start")
  }

  /** Per-client traffic spike detection over the MAINTAINED stats2 state —
    * the reference-MV → extension-analytics loop closed at the user API:
    * each client's 10-minute total (blocked + visited) is scored against
    * that client's own bucket distribution with the exact-int64 z
    * decisions of [[graft.operators.TimeSeries.spikeStatsFromCounts]].
    * Runs on O(summary) state rows — the raw log is never rescanned. */
  def trafficSpikes: DataFrame =
    graft.operators.TimeSeries.spikeStatsFromCounts(
      state("stats2").select(col("IP"),
        col("bucket_start"), (col("blocked") + col("visited")).as("cnt")),
      "IP")

  /** Blocked ratio per client — the canonical ad-hoc join the reference's
    * users run across summaries. */
  def clientBlockedRatio: DataFrame =
    clientStats.withColumn(
      "blocked_ratio",
      round(col("blocked") / when(col("blocked") + col("visited") === 0, lit(null))
        .otherwise(col("blocked") + col("visited")), 4))

  /** Release every cached intermediate the dedup/similarity operators
    * persisted internally. Call after consuming their results in a
    * long-lived session; otherwise cached blocks accumulate across
    * invocations until executor storage fills. */
  def releaseCached(): Unit = graft.operators.Caching.releaseAll()
}
