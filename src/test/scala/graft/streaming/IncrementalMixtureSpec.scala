package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.Sampling

/** Incremental == batch for the mixture weights: per-source counts
  * maintained across micro-batches must yield the exact ppm weights the
  * one-shot batch computes — including a source that appears only in the
  * second batch (new key joins state) and a null text (0 tokens). */
class IncrementalMixtureSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("source", StringType), StructField("text", StringType)))

  private val chunk1 = Seq(("web", "a b c d"), ("web", "e f"), ("books", "g h i"))
  private val chunk2 = Seq(("web", "j"), ("code", "k l m n o"), ("books", null))

  private def jsonLine(t: (String, String)): String = {
    val text = Option(t._2).map(s => s""""$s"""").getOrElse("null")
    s"""{"source":"${t._1}","text":$text}"""
  }

  test("incremental (2 micro-batches, new key + null text) == batch") {
    val in = tmpDir("mx-in"); val state = tmpDir("mx-state"); val ckpt = tmpDir("mx-ckpt")
    def runAvailable(): Unit =
      IncrementalMixture.start(spark, in, schema, state, ckpt).awaitTermination()

    Files.write(Paths.get(in, "c1.jsonl"), chunk1.map(jsonLine).mkString("\n").getBytes)
    runAvailable()
    Files.write(Paths.get(in, "c2.jsonl"), chunk2.map(jsonLine).mkString("\n").getBytes)
    runAvailable()

    val batch = Sampling.mixtureWeights(
      (chunk1 ++ chunk2).toDF("source", "text"), "source", "text")
      .orderBy("source").as[(String, Long, Long, Long)].collect().toSeq
    val streaming = IncrementalMixture.weights(spark, state)
      .orderBy("source").as[(String, Long, Long, Long)].collect().toSeq
    assert(streaming === batch)
    // shape sanity: web 3 docs / 7 tokens, books null text counted as 0
    val m = streaming.map(r => r._1 -> r).toMap
    assert(m("web")._2 == 3L && m("web")._3 == 7L)
    assert(m("books")._2 == 2L && m("books")._3 == 3L)
  }
}
