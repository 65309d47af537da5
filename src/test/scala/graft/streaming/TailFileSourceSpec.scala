package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

/** The single-growing-file tail (S1, reference collector.py:45): complete
  * lines stream out as they are appended; a half-written line waits for
  * its newline; byte-offset checkpointing resumes mid-file on restart. */
class TailFileSourceSpec extends SparkTestBase {
  import spark.implicits._

  private def drain(file: String, ckpt: String): Seq[String] = {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = spark.readStream
      .format(classOf[TailFileProvider].getName)
      .load(file)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        seen ++= batch.as[String].collect(); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    seen.toSeq
  }

  test("emits only complete lines; appends resume from the checkpointed byte offset") {
    val dir = tmpDir("tail")
    val file = s"$dir/querylog.json"
    val ckpt = s"$dir/ckpt"
    // two complete lines + one partial (no trailing newline yet)
    Files.write(Paths.get(file), "alpha\nbeta\npart".getBytes)
    assert(drain(file, ckpt) == Seq("alpha", "beta"))
    // the writer finishes the partial line and appends another (CRLF mixed in)
    Files.write(Paths.get(file), "ial\ngamma\r\n".getBytes, StandardOpenOption.APPEND)
    // same checkpoint -> resumes at byte 11, re-emitting nothing
    assert(drain(file, ckpt) == Seq("partial", "gamma"))
    // nothing new: an idle drain emits nothing
    assert(drain(file, ckpt) == Seq.empty)
  }

  test("completeEnd: boundary of complete-line data") {
    val dir = tmpDir("tail-ce")
    val f = s"$dir/f"
    assert(TailFileSource.completeEnd(f) == 0L) // missing file
    Files.write(Paths.get(f), "no newline yet".getBytes)
    assert(TailFileSource.completeEnd(f) == 0L)
    Files.write(Paths.get(f), "a\nbc".getBytes)
    assert(TailFileSource.completeEnd(f) == 2L)
  }

  test("tail drives the full MV pipeline end-to-end") {
    val aB64 = graft.dns.DnsFixtures.b64(graft.dns.DnsFixtures.aAnswerCompressed)
    def line(qh: String, filtered: Boolean): String =
      s"""{"T":"2024-01-01T00:01:00Z","QH":"$qh","QT":"A","QC":"IN","CP":"","IP":"10.0.0.1","Elapsed":1,""" +
        s""""Result":{"IsFiltered":$filtered},"Answer":"$aB64"}"""
    val dir = tmpDir("tail-mv")
    val file = s"$dir/querylog.json"
    Files.write(Paths.get(file),
      (line("ads.example.com", filtered = true) + "\n" +
        line("good.example.org", filtered = false) + "\n").getBytes)
    val q = MvPipeline.startTailFile(spark, file, s"$dir/state", s"$dir/ckpt")
    q.awaitTermination()
    val blocked = MvPipeline.readState(spark, s"$dir/state", "blocked_domains")
      .as[(String, Long)].collect().toMap
    assert(blocked == Map("ads.example.com" -> 1L))
  }
}
