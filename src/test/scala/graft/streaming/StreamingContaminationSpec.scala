package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.Sampling

/** Streaming == batch for decontamination: train hashes maintained
  * incrementally across micro-batches must yield the exact per-group
  * contamination counts the batch [[Sampling.contaminationStats]]
  * computes over the same split — including a duplicate-text train pair
  * (counts merge, membership unchanged) and replayed batch ids. */
class StreamingContaminationSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("text", StringType)))

  test("incremental train-hash state (2 micro-batches) == batch contaminationStats") {
    val docs = (0L until 300L).map(i => (i, s"doc text $i", "en"))
      .toDF("doc_id", "text", "lang")
    // plant one test doc with a train doc's text, as the batch spec does
    val bySplit = Sampling.assignSplit(docs, "doc_id", 0.8, 0.1)
      .select("doc_id", "split").as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val trainId = bySplit("train").head
    val testId = bySplit("test").head
    val planted = Sampling.assignSplit(
      docs.withColumn("text",
        when(col("doc_id") === testId, lit(s"doc text $trainId"))
          .otherwise(col("text"))),
      "doc_id", 0.8, 0.1).persist()

    val trainTexts = planted.filter(col("split") === "train")
      .select("text").as[String].collect().toSeq
    val (c1, c2) = trainTexts.splitAt(trainTexts.size / 2)

    val in = tmpDir("ct-in"); val state = tmpDir("ct-state"); val ckpt = tmpDir("ct-ckpt")
    def runAvailable(): Unit =
      StreamingContamination.start(spark, in, schema, state, ckpt).awaitTermination()
    def lines(ts: Seq[String]): String =
      ts.map(t => s"""{"text":"$t"}""").mkString("\n")
    Files.write(Paths.get(in, "c1.jsonl"), lines(c1).getBytes)
    runAvailable()
    Files.write(Paths.get(in, "c2.jsonl"), lines(c2).getBytes)
    runAvailable()

    val streaming = StreamingContamination.probe(
      planted.filter(col("split") === "test").select("lang", "text"),
      "text", "lang", state)
      .orderBy("lang").as[(String, Long, Long)].collect().toSeq
    val batch = Sampling.contaminationStats(
      planted.drop("split"), "doc_id", "text", "lang", 0.8, 0.1)
      .orderBy("lang").as[(String, Long, Long)].collect().toSeq
    assert(streaming === batch)
    assert(streaming.head._3 === 1L) // the planted overlap, found via state
    graft.operators.Caching.releaseAll()
    planted.unpersist()
  }

  test("replayed batch id folds exactly once; duplicate texts merge counts") {
    val state = tmpDir("ct-idem")
    val train = Seq("alpha", "alpha", "beta").toDF("text")
    StreamingContamination.processBatch(train, "text", state, batchId = 3L)
    StreamingContamination.processBatch(train, "text", state, batchId = 3L) // replay
    val st = MvPipeline.readState(spark, state, "train_hashes")
      .as[(String, Long)].collect().toMap
    assert(st.size === 2 && st.values.toSeq.sorted === Seq(1L, 2L))
    val probe = StreamingContamination.probe(
      Seq(("g", "alpha"), ("g", "gamma")).toDF("lang", "text"), "text", "lang", state)
      .as[(String, Long, Long)].collect().head
    assert(probe === (("g", 2L, 1L)))
  }
}
