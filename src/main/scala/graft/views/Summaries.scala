package graft.views

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{bucketStartSec, tld, tldEligible}

/** The reference's 8 materialized views as pure `DataFrame => DataFrame`
  * transforms over `log2` (`/root/reference/README.md:24-189`).
  *
  * Semantics note (SURVEY.md §3.3): ClickHouse stores *partial* per-insert
  * increments in SummingMergeTree tables and folds them lazily, so a correct
  * read there is `SELECT key, sum(count) GROUP BY key`. Our transforms
  * produce that post-GROUP-BY state directly — exact and eager, the view a
  * ClickHouse reader actually observes.
  *
  * Each is a single `groupBy(...).agg(sum)` — Catalyst plans partial+final
  * hash aggregation automatically, so the shuffle moves only one partial row
  * per (task × key): at 100 TB the shuffle volume is bounded by key
  * cardinality (domains / clients / qtypes), not row count. The only skew
  * risk is a hot key (popular domain, NATed client IP); AQE skew handling +
  * two-level aggregation via the partial-agg split already covers it because
  * sums are associative.
  */
object Summaries {

  /** blocked_domains (README.md:25-41): per-domain filtered-query count. */
  def blockedDomains(log2: DataFrame): DataFrame =
    log2.filter(col("IsFiltered"))
      .groupBy("QH")
      .agg(count(lit(1)).as("count"))

  /** visited_domains (README.md:171-189): per-domain non-filtered count. */
  def visitedDomains(log2: DataFrame): DataFrame =
    log2.filter(!col("IsFiltered"))
      .groupBy("QH")
      .agg(count(lit(1)).as("count"))

  /** clients_stats (README.md:43-63): per-client visited/blocked in one
    * pass — two conditional sums, one shuffle. */
  def clientsStats(log2: DataFrame): DataFrame =
    log2.groupBy("IP").agg(
      sum(when(col("IsFiltered"), 0L).otherwise(1L)).as("visited"),
      sum(when(col("IsFiltered"), 1L).otherwise(0L)).as("blocked")
    )

  /** qt_stats (README.md:65-82): count per query type. */
  def qtStats(log2: DataFrame): DataFrame =
    log2.groupBy("QT").agg(count(lit(1)).as("count"))

  /** rcode_stats (README.md:84-101): count per DNS response code. */
  def rcodeStats(log2: DataFrame): DataFrame =
    log2.groupBy("rcode").agg(count(lit(1)).as("count"))

  /** stats2 (README.md:103-129): per (client, 10-minute bucket) blocked and
    * visited counts. Bucket = epoch-second start of the tumbling window
    * (`toStartOfInterval(date_time, toIntervalMinute(10))`, README.md:122). */
  def stats2(log2: DataFrame): DataFrame =
    log2.groupBy(
      col("IP"),
      bucketStartSec(col("date_time"), 10).as("bucket_start")
    ).agg(
      sum(when(col("IsFiltered"), 1L).otherwise(0L)).as("blocked"),
      sum(when(col("IsFiltered"), 0L).otherwise(1L)).as("visited")
    )

  /** tld_stats (README.md:131-149): count per TLD of QH, only for
    * multi-label non-IP-literal hostnames (README.md:148). */
  def tldStats(log2: DataFrame): DataFrame =
    log2.filter(tldEligible(col("QH")))
      .groupBy(tld(col("QH")).as("tld"))
      .agg(count(lit(1)).as("count"))

  /** upstream_stats: count per upstream resolver. The reference's MV body
    * (README.md:159-168) is a copy-paste of tld_stats_mv; the target table
    * DDL (README.md:152-158, `Upstream ... ORDER BY Upstream`) fixes the
    * intent, which we implement (SURVEY.md §2.5 A9 — documented divergence). */
  def upstreamStats(log2: DataFrame): DataFrame =
    log2.groupBy("Upstream").agg(count(lit(1)).as("count"))

  /** All 8 views, keyed by their reference table name — the fan-out set for
    * the streaming pipeline (SURVEY.md §3.2 design b). */
  val all: Map[String, DataFrame => DataFrame] = Map(
    "blocked_domains" -> blockedDomains,
    "visited_domains" -> visitedDomains,
    "clients_stats"   -> clientsStats,
    "qt_stats"        -> qtStats,
    "rcode_stats"     -> rcodeStats,
    "stats2"          -> stats2,
    "tld_stats"       -> tldStats,
    "upstream_stats"  -> upstreamStats
  )

  /** Key columns of each summary table (its SummingMergeTree ORDER BY). */
  val keys: Map[String, Seq[String]] = Map(
    "blocked_domains" -> Seq("QH"),
    "visited_domains" -> Seq("QH"),
    "clients_stats"   -> Seq("IP"),
    "qt_stats"        -> Seq("QT"),
    "rcode_stats"     -> Seq("rcode"),
    "stats2"          -> Seq("IP", "bucket_start"),
    "tld_stats"       -> Seq("tld"),
    "upstream_stats"  -> Seq("Upstream")
  )
}
