package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkTestBase

/** Streaming Misra-Gries: the deterministic guarantees must survive
  * arbitrary batching — presence above n/(k+1), two-sided estimate
  * bound — and with vocabulary under k the maintained summary must hold
  * EXACT counts identical to a one-shot batch count. */
class IncrementalHeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("text", StringType)))

  test("small vocab (< k): maintained summary == exact counts across 2 batches") {
    val in = tmpDir("hh-in"); val state = tmpDir("hh-state"); val ckpt = tmpDir("hh-ckpt")
    def run(): Unit =
      IncrementalHeavyHitters.start(spark, in, schema, state, ckpt, k = 64)
        .awaitTermination()
    Files.write(Paths.get(in, "c1.jsonl"),
      """{"text":"a a a b b c"}""".getBytes)
    run()
    Files.write(Paths.get(in, "c2.jsonl"),
      """{"text":"a b c c d"}""".getBytes)
    run()
    val got = IncrementalHeavyHitters.summary(spark, state)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 4L), ("b", 3L), ("c", 3L), ("d", 1L)))
  }

  test("large vocab (> k): guarantees hold after batched maintenance") {
    val k = 8
    val state = tmpDir("hh-big")
    // zipf-ish stream: item i appears ~ 200/i times, split into 3 batches
    val stream = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"w$i"))
    val shuffled = new scala.util.Random(5).shuffle(stream)
    val batches = shuffled.grouped((shuffled.size + 2) / 3).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalHeavyHitters.processBatch(b.toDF("item"), "item", state, k, batchId = i.toLong)
    }
    val n = stream.size.toLong
    val slack = n / (k + 1)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = IncrementalHeavyHitters.summary(spark, state)
      .as[(String, Long)].collect().toMap
    assert(sk.nonEmpty && sk.size <= k)
    exact.foreach { case (t, c) =>
      if (c > slack) assert(sk.contains(t), s"frequent '$t' ($c > $slack) missing")
    }
    sk.foreach { case (t, est) =>
      val true_ = exact.getOrElse(t, 0L)
      assert(est <= true_, s"'$t' overestimated: $est > $true_")
      assert(true_ - est <= slack, s"'$t' underestimated past the bound")
    }
  }
}
