package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Pluggable batch sinks for the ingest/MV pipelines. The streaming code
  * writes through this interface so tests run on parquet while production
  * points the same pipeline at ClickHouse (the reference's sink,
  * `/root/reference/src/collector.py:50-52`). */
trait GraftSink {
  def write(df: DataFrame, table: String): Unit
}

/** Parquet-directory sink (tests, local state). */
final class ParquetSink(baseDir: String, mode: SaveMode = SaveMode.Append) extends GraftSink {
  override def write(df: DataFrame, table: String): Unit =
    df.write.mode(mode).parquet(s"$baseDir/$table")
}

/** Column codecs applied before a generic JDBC sink. */
object SinkCodecs {

  /** One array<string> column → a ClickHouse array-literal string
    * (`['a','b']`, backslash-escaping `\` and `'`) — CH parses this form in
    * INSERT values, which is how array columns (log2's rdatas/cnames)
    * travel through a plain JDBC dialect that has no ARRAY mapping.
    * Null ELEMENTS render as unquoted `NULL` (the CH Nullable literal) —
    * `array_join` alone would silently drop them, shortening the array. */
  def chArrayLiteral(c: Column): Column = {
    val esc = (e: Column) =>
      regexp_replace(regexp_replace(e, "\\\\", "\\\\\\\\"), "'", "\\\\'")
    concat(lit("["),
      array_join(
        transform(c, e =>
          when(e.isNull, lit("NULL")).otherwise(concat(lit("'"), esc(e), lit("'")))),
        ","),
      lit("]"))
  }

  /** Rewrite every array<string> column of `df` as its CH literal string.
    * A JDBC write of a raw ArrayType fails loudly (tested) — call this
    * first when the target dialect lacks ARRAY support. */
  def arraysAsLiterals(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case ArrayType(StringType, _) =>
          acc.withColumn(f.name, chArrayLiteral(col(f.name)))
        case _ => acc
      }
    }
}

/** JDBC sink for ClickHouse-compatible endpoints. Equivalent of the
  * collector's HTTP inserts with server-side async batching
  * (collector.py:50-52, `async_insert=1`): each micro-batch arrives as one
  * multi-row insert per partition; ClickHouse's SummingMergeTree then folds
  * summary rows at merge time, so appends (not upserts) are the correct
  * contract for the 8 summary tables (SURVEY.md §3.3).
  *
  * No ClickHouse driver exists in this offline container; the sink is
  * integration-tested against in-memory Derby (SinksSpec) — scheme-agnostic
  * standard JDBC: type mapping of Bool/Long/Double/Timestamp columns,
  * append semantics across writes, and loud failure on unmapped ArrayType
  * (use [[SinkCodecs.arraysAsLiterals]] upstream).
  */
final class JdbcClickHouseSink(
    url: String, // e.g. jdbc:clickhouse://host:8123/AdGuardHome
    user: String,
    password: String,
    batchSize: Int = 100000
) extends GraftSink {
  override def write(df: DataFrame, table: String): Unit =
    df.write
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
      .option("batchsize", batchSize.toString)
      .mode(SaveMode.Append)
      .save()
}
