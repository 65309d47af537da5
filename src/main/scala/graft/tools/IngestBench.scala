package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Querylog
import graft.views.Summaries

/** Ingest-path throughput measurement (not part of the driver contract).
  *
  * The reference's entire ingest is a single-threaded Python loop —
  * json.loads + dnslib parse + per-row HTTP insert
  * (/root/reference/src/collector.py:54-75). This main measures our
  * equivalent: querylog line → full log2 row (JSON parse, base64 decode,
  * RFC-1035 parse, classification) plus the 8-view maintenance pass,
  * on synthetic lines generated on the fly.
  */
object IngestBench {

  /** Deterministic synthetic querylog lines: a realistic A-answer wire
    * message (header + question + compressed-name A answer),
    * hostnames/IPs/flags varied per row. Shared with
    * [[StreamBench]]'s replay input. */
  def syntheticLines(spark: SparkSession, rows: Long): org.apache.spark.sql.DataFrame = {
    val wire: Array[Byte] = {
      def u16(v: Int) = Array((v >> 8).toByte, (v & 0xff).toByte)
      val name = Array[Byte](7) ++ "example".getBytes ++ Array[Byte](3) ++ "com".getBytes :+ 0.toByte
      u16(0x1234) ++ Array(0x81.toByte, 0x80.toByte) ++ u16(1) ++ u16(1) ++ u16(0) ++ u16(0) ++
        name ++ u16(1) ++ u16(1) ++
        Array(0xc0.toByte, 12.toByte) ++ u16(1) ++ u16(1) ++ Array[Byte](0, 0, 1, 44) ++ u16(4) ++
        Array(93.toByte, 184.toByte, 216.toByte, 34.toByte)
    }
    val aB64 = java.util.Base64.getEncoder.encodeToString(wire)
    spark.range(rows).select(concat(
      lit("""{"T":"2024-01-01T"""),
      lpad(pmod(col("id"), lit(24)).cast("string"), 2, "0"), lit(":"),
      lpad(pmod(floor(col("id") / 24), lit(60)).cast("string"), 2, "0"), lit(""":00.123456+03:00","QH":"host"""),
      pmod(col("id"), lit(50000)).cast("string"),
      lit(""".example.com","QT":"A","QC":"IN","CP":"","IP":"10."""),
      pmod(floor(col("id") / 65536), lit(256)).cast("string"), lit("."),
      pmod(floor(col("id") / 256), lit(256)).cast("string"), lit("."),
      pmod(col("id"), lit(256)).cast("string"),
      lit(s"""","Elapsed":1234567,"Result":{"IsFiltered":"""),
      (pmod(col("id"), lit(5)) === 0).cast("string"),
      lit(s"""},"Answer":"$aB64"}""")
    ).as("value"))
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lines = syntheticLines(spark, rows)

    val t0 = System.nanoTime()
    val parsed = Querylog.parse(lines)
    val n = parsed.count()
    val tParse = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val log2 = Querylog.parse(lines).persist()
    val viewRows = Summaries.all.values.map(v => v(log2).count()).sum
    val tViews = (System.nanoTime() - t1) / 1e9
    log2.unpersist()

    println(f"""{"rows":$n,"parse_sec":$tParse%.2f,"parse_rows_per_sec":${(n / tParse).toLong},"views_sec":$tViews%.2f,"view_rows":$viewRows,"cpus":$cpus}""")
    spark.stop()
  }
}