package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{cents, centsSql, pround4}

/** Relational demonstration queries over the star schema — joins, windows,
  * top-k (SURVEY.md §2.4, §2.6-2.7; the reference has none of these in code,
  * they are the implied read-side workload).
  *
  * Parity rules (FIXTURES.md "Oracle-parity notes"): money columns are
  * converted to BIGINT integer cents at the leaf ([[graft.functions.cents]])
  * and summed exactly — NO double→DECIMAL cast appears in any oracle-checked
  * query (the driver's DuckDB casts boundary doubles differently from both
  * Spark and local DuckDB 1.0, so that cast class is un-fixable by parity
  * tuning). Every result has a total ORDER BY on a unique key set.
  *
  * Scale notes per query are on each method: dimension sides are broadcast
  * (`broadcast()` hint, no shuffle of the fact table), aggregations are
  * partial+final, and top-k uses `TakeOrderedAndProject`/window-rank rather
  * than global sorts.
  */
object RelQueries {

  /** Money → exact BIGINT cents ([[graft.functions.cents]]); discount
    * products become cents × (100 − discount-percent) in units of 10⁻⁴
    * dollars (`_e4` columns). Everything after the single identical IEEE
    * floor is exact int64 on both engines. */
  private def c2(name: String) = cents(col(name))
  /** `100 − discount` as an exact integer percent (discount ∈ [0,1]). */
  private def pctRemain(name: String) = lit(100L) - cents(col(name))
  private def pctRemainSql(x: String) = s"(100 - ${centsSql(x)})"

  /** TPC-H Q1-style pricing summary: one scan + one hash agg of lineitem.
    * At 100 TB: shuffle is 4 groups × partials — negligible; the scan
    * dominates and prunes to the 7 referenced columns. */
  def q1Pricing(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(c2("l_quantity")).as("sum_qty_cents"),
        sum(c2("l_extendedprice")).as("sum_base_price_cents"),
        sum(c2("l_extendedprice") * pctRemain("l_discount")).as("sum_disc_price_e4"),
        count(lit(1)).as("count_order")
      )
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: revenue of unshipped orders for one segment.
    * customer is the small side → broadcast into orders, then the result
    * (still small) broadcasts into lineitem: zero fact-table shuffles before
    * the aggregation. */
  def q3Shipping(s: SparkSession, dir: String): DataFrame = {
    val cut = lit("1997-06-30").cast("timestamp")
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < cut)
    val l = Tables.lineitem(s, dir).filter(col("l_shipdate") > cut)
    l.join(broadcast(o.join(broadcast(c), col("o_custkey") === col("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"))
      .agg(sum(c2("l_extendedprice") * pctRemain("l_discount")).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: revenue per nation for one region + year. All four
    * dimension tables broadcast; lineitem (the 100 TB side) is shuffled
    * exactly once, by the final group key. */
  def q5Region(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir).join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val c = Tables.customer(s, dir).join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val su = Tables.supplier(s, dir)
    Tables.lineitem(s, dir)
      .join(broadcast(o.join(broadcast(c), col("o_custkey") === col("c_custkey"))),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(su),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(sum(c2("l_extendedprice") * pctRemain("l_discount")).as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("n_name"))
  }

  /** Left-anti join: parts with no lineitem shipped after 2001-06-01. The
    * right side is aggregated to distinct keys *before* the join, so at
    * scale it collapses to a broadcast of the key set rather than a shuffle
    * of the raw fact table. */
  def joinAntiParts(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .join(
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > lit("2001-06-01").cast("timestamp"))
          .select(col("l_partkey")).distinct(),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey")
      .orderBy("p_partkey")

  /** Left-semi join: customers that placed at least one urgent order. */
  def joinSemiUrgent(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey")
      .orderBy("c_custkey")

  /** Top-3 customers by balance per market segment — window rank
    * (SURVEY.md §2.6). Per-partition heap, no global sort. */
  def topkPerSegment(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("c_mktsegment"), col("rn").cast("long").as("rn"), col("c_custkey"))
      .orderBy("c_mktsegment", "rn")
  }

  /** Global top-25 orders by price — Spark plans TakeOrderedAndProject:
    * per-partition top-k then a single merge, never a full sort (O2/O3). */
  def topnOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), c2("o_totalprice").as("price_cents"))
      .orderBy(col("price_cents").desc, col("o_orderkey"))
      .limit(25)

  /** Per-user inter-event gap (lag window) in exact microseconds. */
  def windowUserDeltas(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    Tables.events(s, dir)
      .withColumn("us", expr("ts DIV 1000"))
      .withColumn("delta_us", col("us") - lag("us", 1).over(w))
      .select("event_id", "user_id", "delta_us")
      .orderBy("event_id")
  }

  /** Set operations (SURVEY.md §2.8 — absent in the reference, exercised
    * here): (urgent ∩ building) ∪ (building ∖ urgent) over customer keys. */
  def setOpsCustomers(s: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey")
    val building = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    urgent.intersect(building)
      .union(building.except(urgent))
      .orderBy("c_custkey")
  }

  /** Event-time tumbling window via the `window()` operator (F11/T4) —
    * the streaming-native form of the 10-minute bucketing; bucket start
    * re-expressed as epoch seconds for oracle parity. */
  def winTumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("ts2", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(window(col("ts2"), "10 minutes").as("w"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("errors"))
      .select(unix_timestamp(col("w.start")).as("bucket_start"), col("cnt"), col("errors"))
      .orderBy("bucket_start")

  /** The blocked-domains aggregation via explicit salted two-level sums
    * (Skew operator) — identical results to the plain groupBy, proven by
    * sharing its oracle; the technique is for hot final-stage keys at
    * 100 TB (SURVEY.md §7.1 step 9). */
  def saltedBlocked(s: SparkSession, dir: String): DataFrame =
    graft.operators.Skew.saltedCount(
      Tables.events(s, dir).filter(col("event_type") === "error"),
      keys = Seq("user_id"))
      .orderBy("user_id")

  /** Shared breakdown body of [[rollupPricing]]/[[cubePricing]] (one
    * source of truth for the agg list and parity treatment): group
    * columns coalesced to 'ALL' so both engines order the subtotal rows
    * identically (Spark sorts NULLS FIRST, DuckDB NULLS LAST). */
  private def pricingBreakdown(
      grouped: org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
    grouped
      .agg(sum(c2("l_quantity")).as("sum_qty_cents"), count(lit(1)).as("cnt"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("sum_qty_cents"), col("cnt"))
      .orderBy("flag", "status")

  /** The matching oracle template — `kw` ∈ ROLLUP/CUBE. */
  private def pricingBreakdownSql(kw: String): String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
       | CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_cents, count(*) AS cnt
       |FROM lineitem GROUP BY $kw(l_returnflag, l_linestatus)
       |ORDER BY flag, status""".stripMargin

  /** ROLLUP over (returnflag, linestatus): per-group, per-flag subtotal and
    * grand total in one pass (§2.5 breadth; absent in the reference). */
  def rollupPricing(s: SparkSession, dir: String): DataFrame =
    pricingBreakdown(Tables.lineitem(s, dir).rollup("l_returnflag", "l_linestatus"))

  /** Exact percentiles (linear interpolation — Spark `percentile` and
    * DuckDB `quantile_cont` share the definition) of event values per type.
    * At 100 TB exact percentiles need a full sort per group — swap to
    * `approx_percentile` (t-digest) there; this entry pins the exact
    * semantics. */
  def pctValue(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        pround4(percentile(col("value"), lit(0.5))).as("p50"),
        pround4(percentile(col("value"), lit(0.95))).as("p95"))
      .orderBy("event_type")

  /** Batch gap-based sessionization (30-min inactivity gap) — the
    * declarative window-function counterpart of the streaming
    * [[graft.streaming.Sessionize]] operator (same semantics over sorted
    * complete data): session break when the per-user gap exceeds the
    * threshold, session index = running sum of breaks, one summary row per
    * session. At 100 TB: one shuffle by user_id, per-user sort inside the
    * window — the same shape as any per-entity history pass; the
    * streaming operator replaces it when data arrives unbounded. */
  def sessionizeEvents(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    Tables.events(s, dir)
      .withColumn("us", expr("ts DIV 1000"))
      .withColumn("brk",
        when(col("us") - lag("us", 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(min("us").as("session_start_us"), max("us").as("session_end_us"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id", "session_idx")
  }

  /** Native `session_window` sessionization — the built-in counterpart
    * of [[sessionizeEvents]]'s window-function form (same 30-min gap;
    * the built-in's boundary differs by design: a gap EXACTLY equal to
    * the threshold breaks here, and `end` = last event + gap — the
    * oracle mirrors both). In streaming this same expression is the
    * watermark-native session aggregation; in batch it plans as one
    * shuffle + per-user merge, like the manual form minus the window
    * sort. */
  def sessionWindowEvents(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("t", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"))
      .orderBy("user_id", "session_start_us")

  /** TPC-H Q22-style: customers with above-segment-average balance and no
    * URGENT orders (§2.4 depth — an aggregate-derived predicate plus an
    * anti-join, the decorrelated form of a correlated subquery; the
    * urgent restriction because this corpus gives every customer at
    * least one order). Balance compared in exact cents; `avg(BIGINT)` is
    * the same exact-int-sum ÷ count double division on both engines. The
    * per-segment averages broadcast; the anti-join probe side is
    * pre-aggregated to distinct keys. */
  def q22RichIdle(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val avgBySeg = c.groupBy("c_mktsegment").agg(avg(c2("c_acctbal")).as("avg_cents"))
    c.join(broadcast(avgBySeg), "c_mktsegment")
      .filter(c2("c_acctbal") > col("avg_cents"))
      .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
          .select("o_custkey").distinct(),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_mktsegment"), col("c_custkey"), c2("c_acctbal").as("acctbal_cents"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  /** Trailing 10-minute moving window per user — a RANGE frame (peers by
    * time VALUE, not row position; §2.6 breadth beyond the rows-frame
    * queries). Sums are exact BIGINT cents so the frame aggregation is
    * order-insensitive on both engines; consumers derive the moving
    * average as win_sum_cents / win_cnt. */
  def movingValue(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us")
      .rangeBetween(-600000000L, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("us", expr("ts DIV 1000"))
      .select(col("event_id"), col("user_id"), col("us"),
        sum(cents(col("value"))).over(w).as("win_sum_cents"),
        count(lit(1)).over(w).as("win_cnt"))
      .orderBy("event_id")
  }

  /** CUBE over (returnflag, linestatus): all four grouping combinations in
    * one pass (§2.5 breadth next to [[rollupPricing]]'s ROLLUP — one
    * shared breakdown body, only the grouping operator differs). */
  def cubePricing(s: SparkSession, dir: String): DataFrame =
    pricingBreakdown(Tables.lineitem(s, dir).cube("l_returnflag", "l_linestatus"))

  /** Explicit GROUPING SETS ((flag, status), (flag)) — the third member
    * of the grouping-operator family (ROLLUP/CUBE/SETS) through the same
    * shared breakdown body; Spark 4's `Dataset.groupingSets` plans it as
    * one Expand + aggregation like the other two. */
  def groupingSetsPricing(s: SparkSession, dir: String): DataFrame =
    pricingBreakdown(Tables.lineitem(s, dir).groupingSets(
      Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag"))),
      col("l_returnflag"), col("l_linestatus")))

  /** Backward as-of join demo ([[graft.operators.AsOfJoin]]): each error
    * event joined to the user's latest click at-or-before it, plus the
    * gap. The right side is pre-aggregated to one row per (user, ts) —
    * the operator's determinism requirement. Oracle: DuckDB's native
    * ASOF LEFT JOIN, so the sort-merge carry-forward implementation is
    * checked against an independent engine's as-of semantics. */
  def asofClicks(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("us", expr("ts DIV 1000"))
    val errors = ev.filter(col("event_type") === "error")
      .select("user_id", "event_id", "us")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "us")
      .agg(max("event_id").as("click_event_id"))
      .withColumnRenamed("us", "click_us")
    graft.operators.AsOfJoin.asOfBackward(errors, clicks, Seq("user_id"), "us", "click_us")
      .withColumn("gap_us", col("us") - col("click_us"))
      .orderBy("event_id")
  }

  /** Per-type value stats: count, exact distinct users, exact cents sum. */
  def aggValueStats(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("cnt"),
        countDistinct(col("user_id")).as("users"),
        sum(c2("value")).as("total_value_cents")
      )
      .orderBy("event_type")

  val oracles: Map[String, String] = Map(
    "q1_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
        | CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_cents,
        | CAST(sum(${centsSql("l_extendedprice")}) AS BIGINT) AS sum_base_price_cents,
        | CAST(sum(${centsSql("l_extendedprice")} * ${pctRemainSql("l_discount")}) AS BIGINT) AS sum_disc_price_e4,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
        | CAST(sum(${centsSql("l_extendedprice")} * ${pctRemainSql("l_discount")}) AS BIGINT) AS revenue_e4
        |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-06-30' AND l_shipdate > TIMESTAMP '1997-06-30'
        |GROUP BY l_orderkey, 2 ORDER BY revenue_e4 DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      s"""SELECT n_name,
        | CAST(sum(${centsSql("l_extendedprice")} * ${pctRemainSql("l_discount")}) AS BIGINT) AS revenue_e4
        |FROM region JOIN nation ON n_regionkey = r_regionkey
        | JOIN customer ON c_nationkey = n_nationkey
        | JOIN orders ON o_custkey = c_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        |WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name ORDER BY revenue_e4 DESC, n_name""".stripMargin,
    "join_anti_parts" ->
      """SELECT p_partkey FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey AND l_shipdate > TIMESTAMP '2001-06-01')
        |ORDER BY p_partkey""".stripMargin,
    "join_semi_urgent" ->
      """SELECT c_custkey FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "topk_per_segment" ->
      """SELECT c_mktsegment, rn, c_custkey FROM (
        | SELECT c_mktsegment, c_custkey,
        |  ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
        | FROM customer) t
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "topn_orders" ->
      s"""SELECT o_orderkey, ${centsSql("o_totalprice")} AS price_cents FROM orders
        |ORDER BY price_cents DESC, o_orderkey LIMIT 25""".stripMargin,
    "window_user_deltas" ->
      """SELECT event_id, user_id,
        | epoch_us(CAST(ts AS TIMESTAMP)) - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS delta_us
        |FROM events ORDER BY event_id""".stripMargin,
    "agg_value_stats" ->
      s"""SELECT event_type, count(*) AS cnt, count(DISTINCT user_id) AS users,
        | CAST(sum(${centsSql("value")}) AS BIGINT) AS total_value_cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "set_ops_customers" ->
      """SELECT c_custkey FROM (
        | (SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |  INTERSECT
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        | UNION
        | (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'))
        |) ORDER BY c_custkey""".stripMargin,
    "win_tumbling" ->
      """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 600000000) * 600 AS bucket_start,
        | count(*) AS cnt,
        | CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS errors
        |FROM events GROUP BY 1 ORDER BY bucket_start""".stripMargin,
    "salted_blocked" ->
      "SELECT user_id, count(*) AS cnt FROM events WHERE event_type = 'error' GROUP BY user_id ORDER BY user_id",
    "session_window_events" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |),
        |b AS (
        |  SELECT user_id, us,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) >= 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e
        |),
        |x AS (
        |  SELECT user_id, us,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM b
        |)
        |SELECT user_id, min(us) AS session_start_us,
        |  max(us) + 1800000000 AS session_end_us, count(*) AS n_events
        |FROM x GROUP BY user_id, session_idx ORDER BY user_id, session_start_us""".stripMargin,
    "sessionize_events" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
        |),
        |b AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS brk
        |  FROM e
        |),
        |x AS (
        |  SELECT user_id, us,
        |    CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM b
        |)
        |SELECT user_id, session_idx, min(us) AS session_start_us, max(us) AS session_end_us, count(*) AS n_events
        |FROM x GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,
    "q22_rich_idle" ->
      s"""WITH a AS (
        |  SELECT c_mktsegment, avg(${centsSql("c_acctbal")}) AS avg_cents
        |  FROM customer GROUP BY c_mktsegment
        |)
        |SELECT c.c_mktsegment, c.c_custkey, ${centsSql("c.c_acctbal")} AS acctbal_cents
        |FROM customer c JOIN a USING (c_mktsegment)
        |WHERE ${centsSql("c.c_acctbal")} > a.avg_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "moving_value" ->
      s"""WITH e AS (
        |  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    ${centsSql("value")} AS vc
        |  FROM events
        |)
        |SELECT event_id, user_id, us,
        |  CAST(sum(vc) OVER (PARTITION BY user_id ORDER BY us RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS win_sum_cents,
        |  count(*) OVER (PARTITION BY user_id ORDER BY us RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS win_cnt
        |FROM e ORDER BY event_id""".stripMargin,
    "cube_pricing" -> pricingBreakdownSql("CUBE"),
    "gsets_pricing" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS flag, coalesce(l_linestatus, 'ALL') AS status,
         | CAST(sum(${centsSql("l_quantity")}) AS BIGINT) AS sum_qty_cents, count(*) AS cnt
         |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag))
         |ORDER BY flag, status""".stripMargin,
    "asof_clicks" ->
      """WITH l AS (
        |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events WHERE event_type = 'error'
        |),
        |r AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS click_us, max(event_id) AS click_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |)
        |SELECT l.user_id, l.event_id, l.us, r.click_us, r.click_event_id, l.us - r.click_us AS gap_us
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us >= r.click_us
        |ORDER BY l.event_id""".stripMargin,
    "pct_value" ->
      """SELECT event_type, floor((quantile_cont(value, 0.5)) * 10000.0 + 0.5) / 10000.0 AS p50,
        | floor((quantile_cont(value, 0.95)) * 10000.0 + 0.5) / 10000.0 AS p95
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "rollup_pricing" -> pricingBreakdownSql("ROLLUP")
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing"         -> q1Pricing,
    "q3_shipping"        -> q3Shipping,
    "q5_region_revenue"  -> q5Region,
    "join_anti_parts"    -> joinAntiParts,
    "join_semi_urgent"   -> joinSemiUrgent,
    "topk_per_segment"   -> topkPerSegment,
    "topn_orders"        -> topnOrders,
    "window_user_deltas" -> windowUserDeltas,
    "agg_value_stats"    -> aggValueStats,
    "set_ops_customers"  -> setOpsCustomers,
    "win_tumbling"       -> winTumbling,
    "salted_blocked"     -> saltedBlocked,
    "sessionize_events"  -> sessionizeEvents,
    "asof_clicks"        -> asofClicks,
    "moving_value"       -> movingValue,
    "cube_pricing"       -> cubePricing,
    "gsets_pricing"      -> groupingSetsPricing,
    "session_window_events" -> sessionWindowEvents,
    "q22_rich_idle"      -> q22RichIdle,
    "pct_value"          -> pctValue,
    "rollup_pricing"     -> rollupPricing
  )
}
