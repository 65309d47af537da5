package graft.api

import java.nio.file.{Files, Paths}

import graft.SparkTestBase
import graft.dns.DnsFixtures

/** Facade spec: the reference user's end-to-end day — backfill a querylog,
  * read the dashboards. */
class AdGuardAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private val aB64 = DnsFixtures.b64(DnsFixtures.aAnswerCompressed)
  private def line(t: String, qh: String, ip: String, f: Boolean): String =
    s"""{"T":"$t","QH":"$qh","QT":"A","QC":"IN","CP":"","IP":"$ip","Elapsed":1,""" +
      s""""Result":{"IsFiltered":$f},"Answer":"$aB64"}"""

  test("batch backfill then dashboard reads") {
    val in = tmpDir("api-in")
    val state = tmpDir("api-state")
    Files.write(Paths.get(in, "log.jsonl"), Seq(
      line("2024-01-01T00:01:00Z", "ads.example.com", "10.0.0.1", f = true),
      line("2024-01-01T00:02:00Z", "ads.example.com", "10.0.0.2", f = true),
      line("2024-01-01T00:03:00Z", "tracker.example.net", "10.0.0.1", f = true),
      line("2024-01-01T00:04:00Z", "good.example.org", "10.0.0.1", f = false)
    ).mkString("\n").getBytes)

    val api = new AdGuardAnalytics(spark, state)
    api.ingestBatch(s"$in/log.jsonl")

    val top = api.topBlocked(1).as[(String, Long)].collect()
    assert(top.toSeq == Seq(("ads.example.com", 2L)))

    val ratio = api.clientBlockedRatio
      .select("IP", "blocked_ratio").as[(String, Double)].collect().toMap
    assert(ratio("10.0.0.1") == 0.6667)
    assert(ratio("10.0.0.2") == 1.0)

    val ts = api.timeSeries(Some("10.0.0.1")).as[(String, Long, Long, Long)].collect()
    assert(ts.length == 1 && ts.head._3 == 2L && ts.head._4 == 1L) // blocked=2 visited=1

    // second backfill merges (incremental contract at the API level)
    val in2 = tmpDir("api-in2")
    Files.write(Paths.get(in2, "log.jsonl"),
      Seq(line("2024-01-01T00:05:00Z", "ads.example.com", "10.0.0.1", f = true)).mkString.getBytes)
    api.ingestBatch(s"$in2/log.jsonl")
    assert(api.topBlocked(1).as[(String, Long)].collect().head == (("ads.example.com", 3L)))

    // spike detection over the maintained stats2 state: same decisions as
    // the batch operator fed the equivalent bucket counts directly
    val fromState = api.trafficSpikes.orderBy("IP")
      .as[(String, Long, Long, Long, Long, Option[Double])].collect().toSeq
    import org.apache.spark.sql.functions.col
    val direct = graft.operators.TimeSeries.spikeStatsFromCounts(
      api.timeSeries().select(col("IP"), col("bucket_start"),
        (col("blocked") + col("visited")).as("cnt")), "IP")
      .orderBy("IP").as[(String, Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(fromState === direct)
    assert(fromState.map(_._1) == Seq("10.0.0.1", "10.0.0.2"))
    graft.operators.Caching.releaseAll()
  }
}
