package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.IncrementalJoinAgg

/** The shipped changelog must let an append-only external table converge
  * to the maintained view: per-group sums over the shipped rows equal
  * the served aggregate after every ship, retractions travel as signed
  * rows, the watermark makes re-ships a no-op, and a crash between the
  * sink append and the watermark advance (simulated by rolling the
  * marker back) re-ships byte-identical blocks that a (batch, key)
  * dedup read removes — the documented at-least-once + dedup =
  * exactly-once composition. */
class ChangelogShipSpec extends SparkTestBase {
  import spark.implicits._

  private def derbyUrl(db: String) = s"jdbc:derby:memory:$db;create=true"

  private def readBack(db: String, table: String) =
    spark.read.format("jdbc")
      .option("url", derbyUrl(db)).option("dbtable", table).load()

  /** Downstream fold: dedup identical re-shipped blocks by (batch, g),
    * then integrate — what ReplacingMergeTree + sum does in ClickHouse. */
  private def folded(db: String, table: String): Map[String, (Long, Long)] =
    readBack(db, table).distinct()
      .groupBy("g").agg(sum("dtotal").as("t"), sum("dpairs").as("p"))
      .filter(col("p") > 0)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  private def served(state: String): Map[String, (Long, Long)] =
    IncrementalJoinAgg.view(spark, state)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("shipped signed increments converge an append-only JDBC table to the view") {
    val state = tmpDir("cs1")
    val db = "changelog1"
    val sink = new JdbcClickHouseSink(derbyUrl(db), "app", "")
    def fold(fb: Seq[(Long, Long, Long)], db2: Seq[(Long, String)], id: Long): Unit =
      IncrementalJoinAgg.processBatch(fb.toDF("jk", "id", "m"), "jk", "id", "m",
        db2.toDF("jk", "g"), "jk", "g", state, id, numBuckets = 4)
    def shipNow(): Long = ChangelogShip.ship(
      IncrementalJoinAgg.changelog(spark, state), "batch", sink, "agg_cl", state)

    // batch 0 + ship
    fold(Seq((10L, 1L, 100L), (20L, 2L, 30L)), Seq((10L, "A"), (20L, "A")), 0L)
    assert(shipNow() > 0)
    assert(folded(db, "agg_cl") === served(state))
    assert(ChangelogShip.watermark(spark, state, "agg_cl") === 0L)

    // batch 1 RETRACTS (re-key A→B): the −1 rows travel; external folds
    fold(Nil, Seq((10L, "B")), 1L)
    assert(shipNow() > 0)
    assert(folded(db, "agg_cl") === served(state))
    assert(served(state) === Map("A" -> (30L, 1L), "B" -> (100L, 1L)))

    // nothing pending: re-ship is a no-op (watermark)
    assert(shipNow() === 0L)
    assert(folded(db, "agg_cl") === served(state))

    // crash between append and watermark advance: roll the marker back
    // by hand — the re-ship appends DUPLICATE blocks; the dedup read
    // still folds to the view, and raw rows prove the duplicates exist
    val rawBefore = readBack(db, "agg_cl").count()
    val fs = new org.apache.hadoop.fs.Path(state)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$state/_shipped_agg_cl")
    fs.delete(marker, true)
    val out = fs.create(marker, true)
    try out.write("0".getBytes("UTF-8")) finally out.close()
    assert(shipNow() > 0) // re-ships batch 1
    assert(readBack(db, "agg_cl").count() > rawBefore, "duplicates must exist raw")
    assert(folded(db, "agg_cl") === served(state), "dedup fold removes them")
    assert(ChangelogShip.watermark(spark, state, "agg_cl") === 1L)

    // compaction BELOW the watermark never re-ships folded history
    IncrementalJoinAgg.compactChangelog(spark, state, 1L)
    assert(shipNow() === 0L)
    fold(Seq((20L, 3L, 7L)), Nil, 2L)
    assert(shipNow() > 0)
    assert(folded(db, "agg_cl") === served(state))
  }

  test("parquet sink: the same contract over files") {
    val state = tmpDir("cs2"); val out = tmpDir("cs2out")
    val sink = new ParquetSink(out)
    IncrementalJoinAgg.processBatch(
      Seq((10L, 1L, 100L)).toDF("jk", "id", "m"), "jk", "id", "m",
      Seq((10L, "A")).toDF("jk", "g"), "jk", "g", state, 0L, numBuckets = 4)
    assert(ChangelogShip.ship(
      IncrementalJoinAgg.changelog(spark, state), "batch", sink, "cl", state) === 1L)
    val ext = spark.read.parquet(s"$out/cl").distinct()
      .groupBy("g").agg(sum("dtotal").as("t"), sum("dpairs").as("p"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(ext === served(state))
  }
}
