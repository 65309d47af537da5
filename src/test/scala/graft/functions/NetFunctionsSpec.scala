package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.{functions => F}

/** Column-level function surface: TLD expression + IP predicates as used by
  * tld_stats (/root/reference/README.md:145-148). */
class NetFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("tld + tldEligible mirror the reference's compound filter") {
    val df = Seq(
      "ads.example.com", "example.org", "localhost",
      "192.168.0.1", "2001:db8::1", "a.b.c.d.e.co.uk"
    ).toDF("QH")
    val got = df
      .filter(F.tldEligible(col("QH")))
      .select(col("QH"), F.tld(col("QH")))
      .as[(String, String)].collect().toMap
    assert(got == Map(
      "ads.example.com" -> "com",
      "example.org" -> "org",
      "a.b.c.d.e.co.uk" -> "uk"
    ))
  }

  test("is_ipv4 / is_ipv6 registered for SQL use") {
    F.registerAll(spark)
    val r = spark.sql(
      "SELECT is_ipv4('10.0.0.1'), is_ipv4('300.0.0.1'), is_ipv6('::1'), is_ipv6('nope')"
    ).collect().head
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getBoolean(2) && !r.getBoolean(3))
  }

  test("vector helpers: dot, norm, cosine on known values") {
    val df = Seq((Array(1.0, 2.0, 2.0), Array(2.0, 4.0, 4.0))).toDF("a", "b")
    val r = df.select(
      F.dotProduct(col("a"), col("b")),
      F.l2Norm(col("a")),
      F.cosineSim(col("a"), col("b"))
    ).collect().head
    assert(r.getDouble(0) == 18.0)
    assert(r.getDouble(1) == 3.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("bucketStartSecFromNanos uses exact integer math") {
    val df = Seq(
      1704067799999999999L, // 1ns before :10:00 boundary (2024-01-01 00:09:59.999...)
      1704067800000000000L  // exactly 00:10:00
    ).toDF("ts")
    val got = df.select(F.bucketStartSecFromNanos("ts", 10)).as[Long].collect().toSeq
    assert(got == Seq(1704067200L, 1704067800L))
  }

  test("ipv4Num + cidrString: numeric quad and network-block rendering") {
    val df = Seq("1.2.3.4", "10.63.2.250", "255.255.255.255").toDF("ip")
    val got = df.select(col("ip"),
        F.ipv4Num(col("ip")).as("n"),
        F.cidrString(F.ipv4Num(col("ip")), 24).as("s24"),
        F.cidrString(F.ipv4Num(col("ip")), 16).as("s16"),
        F.cidrString(F.ipv4Num(col("ip")), 32).as("s32"))
      .as[(String, Long, String, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("1.2.3.4") == ((16909060L, "1.2.3.0/24", "1.2.0.0/16", "1.2.3.4/32")))
    assert(got("10.63.2.250")._2 == "10.63.2.0/24")
    assert(got("255.255.255.255") ==
      ((4294967295L, "255.255.255.0/24", "255.255.0.0/16", "255.255.255.255/32")))
  }

  test("ipv4Num: malformed input yields NULL under ANSI, never throws") {
    val df = Seq("1.2.3", "a.b.c.d", "", "1.2.3.x", "999.1.2.three").toDF("ip")
    val got = df.select(F.ipv4Num(col("ip")).as("n"))
      .as[Option[Long]].collect().toSeq
    assert(got.forall(_.isEmpty), s"expected all NULL, got $got")
  }
}
