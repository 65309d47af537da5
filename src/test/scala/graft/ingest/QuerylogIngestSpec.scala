package graft.ingest

import graft.SparkTestBase
import graft.dns.DnsFixtures

/** Ingest pipeline spec: querylog JSON lines → log2 rows + corrupt channel
  * (reference semantics: /root/reference/src/collector.py:15-41,76-78). */
class QuerylogIngestSpec extends SparkTestBase {
  import spark.implicits._

  private val aB64 = DnsFixtures.b64(DnsFixtures.aAnswerCompressed)
  private val nxB64 = DnsFixtures.b64(DnsFixtures.nxdomain)

  def line(
      t: String = "2024-01-01T03:00:00.123456+03:00",
      qh: String = "example.com",
      qt: String = "A",
      ip: String = "192.168.1.10",
      answer: String = aB64,
      extra: String = ""
  ): String =
    s"""{"T":"$t","QH":"$qh","QT":"$qt","QC":"IN","CP":"","IP":"$ip","Elapsed":1234567,"Answer":"$answer"$extra}"""

  test("full row: required fields, answer arrays, tz normalized to UTC") {
    val df = Querylog.parse(Seq(
      line(extra = ""","Upstream":"1.1.1.1:53","Cached":true,"Result":{"IsFiltered":true}""")
    ).toDF("value"))
    val r = df.collect().head
    assert(r.getAs[java.sql.Timestamp]("date_time").toString == "2024-01-01 00:00:00.123456")
    assert(r.getAs[String]("QH") == "example.com")
    assert(r.getAs[String]("Upstream") == "1.1.1.1:53")
    assert(r.getAs[Boolean]("IsFiltered"))
    assert(r.getAs[Boolean]("Cached"))
    assert(r.getAs[Long]("Elapsed") == 1234567L)
    assert(r.getAs[Int]("rcode") == 0)
    assert(r.getAs[scala.collection.Seq[String]]("rdatas").toSeq == Seq("93.184.216.34"))
    assert(r.getAs[scala.collection.Seq[String]]("rdatas6").isEmpty)
  }

  test("optional fields default: Upstream '', Cached false, IsFiltered false") {
    val r = Querylog.parse(Seq(line()).toDF("value")).collect().head
    assert(r.getAs[String]("Upstream") == "")
    assert(!r.getAs[Boolean]("Cached"))
    assert(!r.getAs[Boolean]("IsFiltered"))
  }

  test("NXDOMAIN answer: rcode 3, empty arrays") {
    val r = Querylog.parse(Seq(line(answer = nxB64)).toDF("value")).collect().head
    assert(r.getAs[Int]("rcode") == 3)
    assert(r.getAs[scala.collection.Seq[String]]("rdatas").isEmpty)
    assert(r.getAs[scala.collection.Seq[String]]("cnames").isEmpty)
  }

  test("corrupt channel: malformed json, missing required key, bad base64/dns") {
    val lines = Seq(
      "not json at all{{{",
      """{"QH":"missing-t.com","QT":"A","QC":"IN","CP":"","IP":"1.2.3.4","Elapsed":1,"Answer":"AAAA"}""",
      line(answer = "!!!not-base64!!!"),
      line(answer = DnsFixtures.b64(DnsFixtures.truncated)),
      line() // the one good row
    ).toDF("value")
    assert(Querylog.parse(lines).count() == 1)
    val bad = Querylog.corrupt(lines).collect().map(r => r.getAs[String]("reason"))
    assert(bad.length == 4)
    assert(bad.contains("malformed json"))
    assert(bad.contains("missing required field"))
    assert(bad.count(_ == "unparseable dns answer") == 2)
  }

  test("optional-field type mismatch: dropped with 'unparseable field value'") {
    val lines = Seq(line(extra = ""","Cached":"yes"""")).toDF("value")
    assert(Querylog.parse(lines).count() == 0)
    val r = Querylog.corrupt(lines).collect().head
    assert(r.getAs[String]("reason") == "unparseable field value")
  }

  test("pointer-loop answer is rejected, not hung") {
    val lines = Seq(line(answer = DnsFixtures.b64(DnsFixtures.pointerLoop))).toDF("value")
    assert(Querylog.parse(lines).count() == 0)
    assert(Querylog.corrupt(lines).count() == 1)
  }
}
