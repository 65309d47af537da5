package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{is_ipv4, is_ipv6, lastToken}

/** The reference's 8 materialized-view semantics (SURVEY.md §2.5 A2-A9)
  * recast over the driver's test corpus, per SURVEY.md §7.1 step 6:
  * `events.ts→date_time`, `user_id→IP`, `event_type='error'→IsFiltered`,
  * `props→nested JSON`, `part.p_name→QH` for the TLD logic,
  * `orders.o_orderpriority→Upstream`.
  *
  * `events.ts` arrives as epoch-nanosecond Long (see [[graft.Tables]]); all
  * time math uses integer `DIV` so Spark and the DuckDB oracle truncate
  * identically.
  *
  * Scale notes: every query is a single partial+final hash aggregation —
  * shuffle volume is O(distinct keys), not O(rows). At 100 TB the only added
  * concern is key skew (a hot client/domain), which AQE skew-join handling
  * and the map-side partial agg already absorb because all measures are
  * associative sums.
  */
object MvQueries {

  private val err = col("event_type") === "error"

  /** blocked_domains (A2): per-key count of "filtered" rows. */
  def blockedDomains(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(err)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .orderBy("user_id")

  /** visited_domains (A3). */
  def visitedDomains(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).filter(!err)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .orderBy("user_id")

  /** clients_stats (A4): two conditional sums, one shuffle
    * (`/root/reference/README.md:60-61`). */
  def clientsStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id")
      .agg(
        sum(when(err, 0L).otherwise(1L)).as("visited"),
        sum(when(err, 1L).otherwise(0L)).as("blocked")
      )
      .orderBy("user_id")

  /** qt_stats (A5): count per type. */
  def qtStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .orderBy("event_type")

  /** rcode_stats (A6) over the nested-JSON field (F12,
    * `/root/reference/src/collector.py:24`): group by `props.k`. */
  def rcodeStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(get_json_object(col("props"), "$.k").cast("int").as("k"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("k")

  /** stats2 (A7): per (client, 10-minute tumbling bucket) blocked/visited
    * (`/root/reference/README.md:103-129`). Bucket start in epoch seconds. */
  def stats2(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        col("user_id"),
        expr("(ts DIV 600000000000) * 600").cast("long").as("bucket_start")
      )
      .agg(
        sum(when(err, 1L).otherwise(0L)).as("blocked"),
        sum(when(err, 0L).otherwise(1L)).as("visited")
      )
      .orderBy("user_id", "bucket_start")

  /** tld_stats (A8): last label of a multi-token, non-IP-literal name
    * (`/root/reference/README.md:145-148`), recast over `part.p_name` with
    * a space separator. */
  def tldStats(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(
        size(split(col("p_name"), " ", -1)) > 1 &&
          !is_ipv4(col("p_name")) && !is_ipv6(col("p_name"))
      )
      .groupBy(lastToken(col("p_name"), " ").as("tld"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("tld")

  /** upstream_stats (A9, intended semantics — see SURVEY.md §2.5 on the
    * README copy-paste bug): count per upstream, recast over
    * `orders.o_orderpriority`. */
  def upstreamStats(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
      .orderBy("o_orderpriority")

  /** IPv4-octet regex for the DuckDB oracle's `isIPv4String` equivalent. */
  private val v4 = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
  private val ipv4Re = s"^$v4(\\.$v4){3}$$"
  // crude-but-sufficient IPv6 *shape* (strings with spaces can never match;
  // our UDF is the strict implementation, tested in NetFunctionsSpec)
  private val ipv6Re = "^[0-9a-fA-F:]*:[0-9a-fA-F:.]*$"

  val oracles: Map[String, String] = Map(
    "mv_blocked_domains" ->
      "SELECT user_id, count(*) AS cnt FROM events WHERE event_type = 'error' GROUP BY user_id ORDER BY user_id",
    "mv_visited_domains" ->
      "SELECT user_id, count(*) AS cnt FROM events WHERE event_type <> 'error' GROUP BY user_id ORDER BY user_id",
    "mv_clients_stats" ->
      """SELECT user_id,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END) AS BIGINT) AS visited,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS blocked
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "mv_qt_stats" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type ORDER BY event_type",
    "mv_rcode_stats" ->
      "SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS cnt FROM events GROUP BY 1 ORDER BY k",
    "mv_stats2" ->
      """SELECT user_id,
        | (epoch_us(CAST(ts AS TIMESTAMP)) // 600000000) * 600 AS bucket_start,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS blocked,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END) AS BIGINT) AS visited
        |FROM events GROUP BY 1, 2 ORDER BY user_id, bucket_start""".stripMargin,
    "mv_tld_stats" ->
      s"""SELECT (string_split(p_name, ' '))[-1] AS tld, count(*) AS cnt
         |FROM part
         |WHERE len(string_split(p_name, ' ')) > 1
         |  AND NOT regexp_full_match(p_name, '$ipv4Re')
         |  AND NOT regexp_full_match(p_name, '$ipv6Re')
         |GROUP BY 1 ORDER BY tld""".stripMargin,
    "mv_upstream_stats" ->
      "SELECT o_orderpriority, count(*) AS cnt FROM orders GROUP BY 1 ORDER BY o_orderpriority"
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mv_blocked_domains" -> blockedDomains,
    "mv_visited_domains" -> visitedDomains,
    "mv_clients_stats"   -> clientsStats,
    "mv_qt_stats"        -> qtStats,
    "mv_rcode_stats"     -> rcodeStats,
    "mv_stats2"          -> stats2,
    "mv_tld_stats"       -> tldStats,
    "mv_upstream_stats"  -> upstreamStats
  )
}
