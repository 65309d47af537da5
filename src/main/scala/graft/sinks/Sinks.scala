package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

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

/** JDBC sink for ClickHouse-compatible endpoints. Equivalent of the
  * collector's HTTP inserts with server-side async batching
  * (collector.py:50-52, `async_insert=1`): each micro-batch arrives as one
  * multi-row insert per partition; ClickHouse's SummingMergeTree then folds
  * summary rows at merge time, so appends (not upserts) are the correct
  * contract for the 8 summary tables (SURVEY.md §3.3).
  *
  * Untestable in this offline container (no ClickHouse, no JDBC driver
  * jar) — kept deliberately thin: all query logic lives upstream of the
  * sink boundary.
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
