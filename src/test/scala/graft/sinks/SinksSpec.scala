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

  test("golden ClickHouse INSERT wire shape: log2 rows render to the exact statements CH parses") {
    // one "batch" shaped exactly like the reference's log2 insert
    // (collector.py:73-75): full column tuple, array columns, and the
    // hostile payloads — quotes, backslashes, newline, NULL array
    // element — every statement below is hand-written CH-valid SQL
    // UTC-anchored instants (NOT Timestamp.valueOf, which parses in the
    // JVM default zone and would shift the golden literals on a
    // non-UTC host — the renderer formats in UTC)
    def utc(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val rows = Seq(
      (utc("2024-01-01T00:00:00Z"), "dns.example.com", "A", "IN",
        "doh", "8.8.8.8:53", "192.168.1.10", false, 12345L, true, 0,
        Seq("1.2.3.4", "5.6.7.8"), Seq.empty[String], Seq.empty[String]),
      (utc("2024-01-01T00:10:30Z"), "it's.a\\test.net", "AAAA", "IN",
        "", "", "10.0.0.2", true, 999L, false, 3,
        Seq.empty[String], Seq("::1", null), Seq("cn1.example", "line1\nline2"))
    ).toDF("date_time", "QH", "QT", "QC", "CP", "Upstream", "IP",
      "IsFiltered", "Elapsed", "Cached", "rcode", "rdatas", "rdatas6", "cnames")

    val got = ChInsertRender.statements(rows.coalesce(1), "log2").collect()
    assert(got.length === 1, "one partition, under maxRows: one multi-row INSERT")
    val expected =
      "INSERT INTO log2 (`date_time`,`QH`,`QT`,`QC`,`CP`,`Upstream`,`IP`," +
        "`IsFiltered`,`Elapsed`,`Cached`,`rcode`,`rdatas`,`rdatas6`,`cnames`) VALUES " +
        "('2024-01-01 00:00:00','dns.example.com','A','IN','doh','8.8.8.8:53'," +
        "'192.168.1.10',false,12345,true,0,['1.2.3.4','5.6.7.8'],[],[])," +
        "('2024-01-01 00:10:30','it\\'s.a\\\\test.net','AAAA','IN','','','10.0.0.2'," +
        "true,999,false,3,[],['::1',NULL],['cn1.example','line1\\nline2'])"
    assert(got.head === expected)

    // batching: maxRowsPerInsert splits into several statements, every
    // one carrying the full prefix, rows in partition order
    val batched = ChInsertRender.statements(rows.coalesce(1), "log2",
      maxRowsPerInsert = 1).collect()
    assert(batched.length === 2)
    assert(batched.forall(_.startsWith("INSERT INTO log2 (")))
    assert(batched(0).contains("dns.example.com") &&
      batched(1).contains("AAAA"))
    assert(expected ===
      batched(0) + "," + batched(1).stripPrefix(batched(1).take(
        batched(1).indexOf(" VALUES ") + " VALUES ".length)))

    // the driver-streamed sink posts the same statements in order
    val posted = scala.collection.mutable.ArrayBuffer[String]()
    new ChStatementSink(posted += _).write(rows.coalesce(1), "log2")
    assert(posted.toSeq === Seq(expected))

    // sub-second instants render micros — a seconds-only pattern would
    // silently zero them (DateTime64 parses this form)
    assert(ChInsertRender.renderValue(utc("2024-01-01T00:00:00.123Z"),
      org.apache.spark.sql.types.TimestampType) === "'2024-01-01 00:00:00.123000'")

    // null scalars and unsupported types fail loudly, never render wrong
    val withNullScalar = Seq((Some(1L), Option.empty[String]))
      .toDF("a", "b")
    assert(ChInsertRender.statements(withNullScalar, "t").collect()
      .head.endsWith("(1,NULL)"))
    val unsupported = Seq((1L, BigDecimal(1.5))).toDF("a", "b")
    assertThrows[Exception](
      ChInsertRender.statements(unsupported, "t").collect())

    // non-finite floats: JVM toString spells NaN/Infinity, which CH's
    // parser rejects — the renderer maps them to CH's nan/inf/-inf
    // literals instead of emitting an unparseable INSERT (ADVICE r15)
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    assert(ChInsertRender.renderValue(Double.NaN, DoubleType) === "nan")
    assert(ChInsertRender.renderValue(Double.PositiveInfinity, DoubleType) === "inf")
    assert(ChInsertRender.renderValue(Double.NegativeInfinity, DoubleType) === "-inf")
    assert(ChInsertRender.renderValue(Float.NaN, FloatType) === "nan")
    assert(ChInsertRender.renderValue(Float.PositiveInfinity, FloatType) === "inf")
    assert(ChInsertRender.renderValue(Float.NegativeInfinity, FloatType) === "-inf")
    assert(ChInsertRender.renderValue(1.5, DoubleType) === "1.5")
    assert(ChInsertRender.renderValue(-0.25f, FloatType) === "-0.25")
  }

  test("ParquetSink appends per write") {
    val dir = tmpDir("pq-sink")
    val sink = new ParquetSink(dir)
    sink.write(summaryRows, "t")
    sink.write(summaryRows, "t")
    assert(spark.read.parquet(s"$dir/t").count() == 4)
  }
}
