package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.AsOfJoin

/** The watermarked stream-stream interval join must produce exactly the
  * batch [[AsOfJoin.intervalJoin]] pairs over the same data — including
  * matches that span the two micro-batches (a right row arriving one
  * batch after its left partner, within the watermark). */
class StreamingIntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val lSchema = StructType(Seq(
    StructField("k", StringType), StructField("ltag", StringType),
    StructField("lus", LongType)))
  private val rSchema = StructType(Seq(
    StructField("k", StringType), StructField("rtag", StringType),
    StructField("rus", LongType)))

  // windows of 10s (1e7 µs); cross-batch pair: p2's match r-late arrives
  // in batch 2
  private val leftRows = Seq(
    ("u1", "p1", 1000000L), ("u1", "p2", 30000000L), ("u2", "p3", 1000000L))
  private val rightB1 = Seq(
    ("u1", "r-in", 2000000L),    // p1 window
    ("u1", "r-out", 20000000L),  // between windows
    ("u2", "r-k2", 5000000L))    // p3 window
  private val rightB2 = Seq(
    ("u1", "r-late", 35000000L)) // p2 window, arrives in batch 2

  test("streaming (2 micro-batches) == batch intervalJoin, incl. cross-batch pair") {
    val lin = tmpDir("sij-l"); val rin = tmpDir("sij-r")
    val out = tmpDir("sij-out"); val ckpt = tmpDir("sij-ckpt")
    def lJson(t: (String, String, Long)) =
      s"""{"k":"${t._1}","ltag":"${t._2}","lus":${t._3}}"""
    def rJson(t: (String, String, Long)) =
      s"""{"k":"${t._1}","rtag":"${t._2}","rus":${t._3}}"""

    val left = spark.readStream.schema(lSchema).json(lin)
    val right = spark.readStream.schema(rSchema).json(rin)
    val j = StreamingIntervalJoin.joined(left, right, Seq("k"),
      "lus", "rus", lengthUs = 10000000L, delayUs = 3600000000L)

    def drain(): Unit = {
      val q = j.writeStream
        .format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Files.write(Paths.get(lin, "l1.jsonl"), leftRows.map(lJson).mkString("\n").getBytes)
    Files.write(Paths.get(rin, "r1.jsonl"), rightB1.map(rJson).mkString("\n").getBytes)
    drain()
    Files.write(Paths.get(rin, "r2.jsonl"), rightB2.map(rJson).mkString("\n").getBytes)
    drain()

    val streaming = spark.read.parquet(out)
      .select("ltag", "rtag").as[(String, String)].collect().toSet
    val batch = AsOfJoin.intervalJoin(
      leftRows.toDF("k", "ltag", "lus"),
      (rightB1 ++ rightB2).toDF("k", "rtag", "rus"),
      Seq("k"), "lus", "rus", length = 10000000L)
      .select("ltag", "rtag").as[(String, String)].collect().toSet
    assert(streaming === batch)
    assert(streaming === Set(("p1", "r-in"), ("p2", "r-late"), ("p3", "r-k2")))
  }
}
