package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Querylog

/** Oracle coverage for the INGEST surface itself: a deterministic querylog
  * corpus is generated from `range(n)` inside the query, pushed through the
  * full parse pipeline (JSON → required/optional fields → base64 → RFC-1035
  * parse → classification), and aggregated. The DuckDB oracle computes the
  * expected aggregate in closed form from the same id arithmetic — any
  * divergence anywhere in the pipeline (a dropped row, a wrong default, a
  * mis-parsed answer) breaks the hash match.
  *
  * Row i: QH = host(i%1000).example.com; Result omitted entirely when
  * i%3==0 (exercises the nested-optional default, collector.py:24-26),
  * else IsFiltered = (i%5==0); Answer = a fixed valid one-A-record message,
  * so every parsed row must have rcode=0 and exactly one rdata.
  */
object IngestQueries {

  private val rows = 100000L

  /** Base64 of a header+question+compressed-name A answer for
    * 93.184.216.<lastOctet>. */
  private def aRecordB64(lastOctet: Int): String = {
    def u16(v: Int) = Array((v >> 8).toByte, (v & 0xff).toByte)
    val name = Array[Byte](4) ++ "host".getBytes ++ Array[Byte](7) ++ "example".getBytes ++
      Array[Byte](3) ++ "com".getBytes :+ 0.toByte
    val wire = u16(0x1234) ++ Array(0x81.toByte, 0x80.toByte) ++ u16(1) ++ u16(1) ++ u16(0) ++ u16(0) ++
      name ++ u16(1) ++ u16(1) ++
      Array(0xc0.toByte, 12.toByte) ++ u16(1) ++ u16(1) ++ Array[Byte](0, 0, 1, 44) ++ u16(4) ++
      Array(93.toByte, 184.toByte, 216.toByte, lastOctet.toByte)
    java.util.Base64.getEncoder.encodeToString(wire)
  }

  private[queries] val aB64: String = aRecordB64(34)

  def ingestPipeline(s: SparkSession, dir: String): DataFrame = {
    val lines = s.range(rows).select(concat(
      lit("""{"T":"2024-01-01T00:00:00.123456+03:00","QH":"host"""),
      pmod(col("id"), lit(1000)).cast("string"),
      lit(""".example.com","QT":"A","QC":"IN","CP":"","IP":"10.0.0."""),
      pmod(col("id"), lit(256)).cast("string"),
      lit("""","Elapsed":1234567"""),
      when(pmod(col("id"), lit(3)) === 0, lit("")) // Result omitted: default false
        .otherwise(concat(lit(""","Result":{"IsFiltered":"""),
          (pmod(col("id"), lit(5)) === 0).cast("string"), lit("}"))),
      lit(s""","Answer":"$aB64"}""")
    ).as("value"))
    Querylog.parse(lines)
      .filter(col("IsFiltered"))
      .groupBy("QH")
      .agg(
        count(lit(1)).as("cnt"),
        sum(size(col("rdatas"))).as("n_rdatas"), // 1 per row iff DNS parse is right
        max(col("rcode")).as("max_rcode"))
      .orderBy("QH")
  }

  /** Four distinct A-answers (last octet 10/20/30/40) rotated per row. */
  private[queries] val rotatingB64: Seq[String] = Seq(10, 20, 30, 40).map(aRecordB64)

  /** DNS-answer analytics over the parsed arrays: explode `rdatas` of a
    * corpus whose Answer rotates over 4 known A records — per-address
    * resolution counts must equal the rotation arithmetic. Exercises the
    * ArrayType surface (explode of parser output) end-to-end. */
  def ingestRdatas(s: SparkSession, dir: String): DataFrame = {
    val answer = element_at(
      array(rotatingB64.map(lit): _*), (pmod(col("id"), lit(4)) + 1).cast("int"))
    val lines = s.range(rows).select(concat(
      lit("""{"T":"2024-01-01T00:00:00Z","QH":"h.example.com","QT":"A","QC":"IN","CP":"","IP":"10.0.0.1","Elapsed":1,"Answer":""""),
      answer, lit("\"}")
    ).as("value"))
    Querylog.parse(lines)
      .select(explode(col("rdatas")).as("rdata"))
      .groupBy("rdata")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("rdata")
  }

  val oracles: Map[String, String] = Map(
    "ingest_rdatas" ->
      s"""SELECT '93.184.216.' || CAST(10 + 10 * (id % 4) AS VARCHAR) AS rdata, count(*) AS cnt
         |FROM range($rows) t(id)
         |GROUP BY 1 ORDER BY rdata""".stripMargin,
    "ingest_pipeline" ->
      s"""SELECT 'host' || CAST(id % 1000 AS VARCHAR) || '.example.com' AS QH,
         | count(*) AS cnt,
         | count(*) AS n_rdatas,
         | 0 AS max_rcode
         |FROM range($rows) t(id)
         |WHERE id % 5 = 0 AND id % 3 <> 0
         |GROUP BY 1 ORDER BY QH""".stripMargin
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ingest_pipeline" -> ingestPipeline,
    "ingest_rdatas"   -> ingestRdatas
  )
}
