package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.Sketches

/** Count-Min guarantees and incremental == batch: the sketch never
  * underestimates, overestimates are collision-bounded, and the
  * maintained counters equal the batch build counter-for-counter. */
class IncrementalCmsSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(StructField("text", StringType)))

  test("CMS never underestimates; corpus-token estimates are exact-or-over") {
    val items = (1 to 30).flatMap(i => Seq.fill(i)(s"w$i")).toDF("v")
    val sketch = Sketches.countMin(items, "v")
    val est = Sketches.countMinEstimate(sketch, items.distinct(), "v")
      .as[(String, Long)].collect().toMap
    (1 to 30).foreach { i =>
      assert(est(s"w$i") >= i.toLong, s"w$i underestimated")
    }
    // unseen probe estimates 0 (empty counters via the left join)
    val unseen = Sketches.countMinEstimate(sketch, Seq("nope").toDF("v"), "v")
      .as[(String, Long)].collect().head
    assert(unseen._2 === 0L)
  }

  test("incremental (2 micro-batches) counters == batch build, exactly") {
    val in = tmpDir("cms-in"); val state = tmpDir("cms-state"); val ckpt = tmpDir("cms-ckpt")
    def run(): Unit =
      IncrementalCms.start(spark, in, schema, state, ckpt).awaitTermination()
    Files.write(Paths.get(in, "c1.jsonl"), """{"text":"a a b c"}""".getBytes)
    run()
    Files.write(Paths.get(in, "c2.jsonl"), """{"text":"a c d d d"}""".getBytes)
    run()
    val streaming = MvPipeline.readState(spark, state, "cms")
      .as[(Int, Long, Long)].collect().toSet
    val batch = Sketches.countMin(
      Seq("a", "a", "b", "c", "a", "c", "d", "d", "d").toDF("item"), "item")
      .as[(Int, Long, Long)].collect().toSet
    assert(streaming === batch)
    // estimates over state: exact for this collision-free tiny vocab
    val est = IncrementalCms.estimate(spark, state,
      Seq("a", "b", "c", "d").toDF("item"), "item")
      .as[(String, Long)].collect().toMap
    assert(est === Map("a" -> 3L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
  }
}
