package graft.sinks

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Integration tests of the JDBC sink (K1) against in-memory Derby — the
  * only JDBC endpoint available offline. Everything exercised here is
  * scheme-agnostic standard JDBC (Spark dialect + prepared-statement
  * batching), i.e. the machinery a ClickHouse URL would use; only the
  * SQL type names differ per dialect. */
class SinksSpec extends SparkTestBase {
  import spark.implicits._

  private def derbyUrl(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def readBack(db: String, table: String) =
    spark.read.format("jdbc")
      .option("url", derbyUrl(db))
      .option("dbtable", table)
      .load()

  private lazy val summaryRows = Seq(
    ("dns.example.com", 42L, true, 0.75, Timestamp.valueOf("2024-01-01 00:00:00")),
    ("ads.tracker.net", 7L, false, 0.5, Timestamp.valueOf("2024-01-01 00:10:00"))
  ).toDF("QH", "count", "blocked", "ratio", "bucket_start")

  test("JDBC sink maps string/long/bool/double/timestamp and appends") {
    val sink = new JdbcClickHouseSink(derbyUrl("sink1"), "app", "")
    sink.write(summaryRows, "blocked_domains")
    val got1 = readBack("sink1", "blocked_domains")
    assert(got1.count() == 2)
    // type mapping survives the round trip (filter client-side: Derby maps
    // StringType to CLOB and rejects pushed-down CLOB = CHAR comparisons)
    val r = got1.collect().find(_.getAs[String]("QH") == "dns.example.com").get
    assert(r.getAs[Long]("count") == 42L)
    assert(r.getAs[Boolean]("blocked"))
    assert(r.getAs[Double]("ratio") == 0.75)
    assert(r.getAs[Timestamp]("bucket_start") == Timestamp.valueOf("2024-01-01 00:00:00"))
    // append (not upsert): the SummingMergeTree contract — second write adds rows
    sink.write(summaryRows, "blocked_domains")
    assert(readBack("sink1", "blocked_domains").count() == 4)
  }

  test("raw array columns fail loudly; arraysAsLiterals makes them writable") {
    val withArrays = Seq(
      (1L, Seq("1.2.3.4", "5.6.7.8"), Seq("it's", "a\\b")),
      (2L, Seq.empty[String], Seq("plain")),
      (3L, Seq("1.2.3.4", null), Seq("x")) // null ELEMENT must not vanish
    ).toDF("id", "rdatas", "cnames")
    val sink = new JdbcClickHouseSink(derbyUrl("sink2"), "app", "")
    // unmapped ArrayType must be an error, not silent data loss
    assertThrows[Exception](sink.write(withArrays, "log2_raw"))
    val encoded = SinkCodecs.arraysAsLiterals(withArrays)
    sink.write(encoded, "log2")
    val got = readBack("sink2", "log2").orderBy("id")
      .as[(Long, String, String)].collect()
    assert(got(0)._2 == "['1.2.3.4','5.6.7.8']")
    assert(got(0)._3 == "['it\\'s','a\\\\b']") // quote and backslash escaped
    assert(got(1)._2 == "[]")
    assert(got(2)._2 == "['1.2.3.4',NULL]") // null element kept as CH NULL literal
  }

  test("ParquetSink appends per write") {
    val dir = tmpDir("pq-sink")
    val sink = new ParquetSink(dir)
    sink.write(summaryRows, "t")
    sink.write(summaryRows, "t")
    assert(spark.read.parquet(s"$dir/t").count() == 4)
  }
}
