package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.Sketches

/** Streaming KMV must equal the batch sketch EXACTLY (the k-smallest
  * union rule is order-free), including re-seen values across batches
  * (distinct semantics) and groups under/over k. */
class IncrementalKmvSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("g", StringType), StructField("v", LongType)))

  test("incremental (2 micro-batches, overlapping values) == batch kmvDistinct") {
    val k = 16
    val in = tmpDir("kmv-in"); val state = tmpDir("kmv-state"); val ckpt = tmpDir("kmv-ckpt")
    // group "a": 100 distinct (> k, estimator path) split across batches
    // with overlap; group "b": 5 distinct (< k, exact path)
    val c1 = (0L until 60L).map(("a", _)) ++ (0L until 3L).map(("b", _))
    val c2 = (40L until 100L).map(("a", _)) ++ (2L until 5L).map(("b", _))
    def lines(ts: Seq[(String, Long)]) =
      ts.map(t => s"""{"g":"${t._1}","v":${t._2}}""").mkString("\n")
    def run(): Unit =
      IncrementalKmv.start(spark, in, schema, state, ckpt, Seq("g"), "v", k)
        .awaitTermination()
    Files.write(Paths.get(in, "c1.jsonl"), lines(c1).getBytes)
    run()
    Files.write(Paths.get(in, "c2.jsonl"), lines(c2).getBytes)
    run()

    val streaming = IncrementalKmv.estimate(spark, state, Seq("g"), k)
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    val batch = Sketches.kmvDistinct((c1 ++ c2).toDF("g", "v"), Seq("g"), "v", k)
      .orderBy("g").as[(String, Long, Double)].collect().toSeq
    assert(streaming === batch) // exact, not approximate, agreement
    val m = streaming.map(r => r._1 -> r).toMap
    assert(m("b")._2 == 5L && m("b")._3 == 5.0) // under-k exact path
    assert(m("a")._2 == k.toLong && m("a")._3 > 0) // estimator path engaged
  }
}
