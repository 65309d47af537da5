package graft.schema

import org.apache.spark.sql.types._

import java.sql.Timestamp

/** Typed row of the `log2` fact table — one DNS query
  * (`/root/reference/README.md:4-22`). Arrays keep answer-record order. */
final case class DnsQuery(
    date_time: Timestamp,
    QH: String,
    QT: String,
    QC: String,
    CP: String,
    Upstream: String,
    IP: String,
    IsFiltered: Boolean,
    Elapsed: Long,
    Cached: Boolean,
    rcode: Int,
    rdatas: Seq[String],
    rdatas6: Seq[String],
    cnames: Seq[String]
)

/** Explicit schema constants — never inferred, for oracle determinism
  * (SURVEY.md §1.4). */
object Schemas {

  /** Wire schema of one AdGuard Home querylog JSON line
    * (`/root/reference/src/collector.py:16-30`). All fields nullable so
    * PERMISSIVE `from_json` can represent partial records; required-field
    * enforcement happens in the ingest filter, mirroring the collector's
    * KeyError → drop behavior (collector.py:76-78). */
  val querylogJson: StructType = StructType(Seq(
    StructField("T", StringType),
    StructField("QH", StringType),
    StructField("QT", StringType),
    StructField("QC", StringType),
    StructField("CP", StringType),
    StructField("Upstream", StringType),
    StructField("IP", StringType),
    StructField("Elapsed", LongType),
    StructField("Cached", BooleanType),
    StructField("Result", StructType(Seq(
      StructField("IsFiltered", BooleanType)
    ))),
    StructField("Answer", StringType),
    // populated by the PERMISSIVE parser with the raw line iff the JSON
    // itself is unparseable — distinguishes "malformed json" from a valid
    // object that merely lacks required fields
    StructField("_corrupt_record", StringType)
  ))

  /** `log2` fact-table schema (`/root/reference/README.md:4-22`), Spark types
    * per SURVEY.md §1.3. IPs are canonical strings (Spark has no inet type). */
  val log2: StructType = StructType(Seq(
    StructField("date_time", TimestampType, nullable = false),
    StructField("QH", StringType, nullable = false),
    StructField("QT", StringType, nullable = false),
    StructField("QC", StringType, nullable = false),
    StructField("CP", StringType, nullable = false),
    StructField("Upstream", StringType, nullable = false),
    StructField("IP", StringType, nullable = false),
    StructField("IsFiltered", BooleanType, nullable = false),
    StructField("Elapsed", LongType, nullable = false),
    StructField("Cached", BooleanType, nullable = false),
    StructField("rcode", IntegerType, nullable = false),
    StructField("rdatas", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("rdatas6", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("cnames", ArrayType(StringType, containsNull = false), nullable = false)
  ))
}
