package graft.streaming

import graft.SparkTestBase
import graft.operators.Dedup

/** The maintained substring-duplication spans must equal the batch
  * `Dedup.duplicateSpanStats` sweep over everything folded, after EVERY
  * batch — including the RETROACTIVE case where a new doc's text flags
  * windows of a doc folded batches earlier (no row of which arrived),
  * span growth/coalescing over time (per-doc REPLACE, not additive
  * merge), the distinct-doc rule (self-repeats alone never flag), and
  * the compaction horizon contract. */
class IncrementalDupSpansSpec extends SparkTestBase {
  import spark.implicits._

  private val k = 40

  // deterministic unique filler so only the EXPLICITLY shared runs match
  private def uniq(seed: Int, n: Int): String = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }
  private val run1 = uniq(1001, 60) // a 60-char shared run
  private val run2 = uniq(1002, 60)

  private def truth(ds: Seq[(Long, String)]): Map[Long, (Long, Long, Long, Long, Long)] = {
    val r = Dedup.duplicateSpanStats(ds.toDF("doc_id", "text"), "doc_id", "text", k)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5, t._6)).toMap
    graft.operators.Caching.releaseAll()
    r
  }

  private def fold(state: String, ds: Seq[(Long, String)], id: Long): Unit =
    IncrementalDupSpans.processBatch(ds.toDF("doc_id", "text"),
      "doc_id", "text", k, state, id, numBuckets = 4)

  private def served(state: String): Map[Long, (Long, Long, Long, Long, Long)] =
    IncrementalDupSpans.stats(spark, state)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4, t._5, t._6)).toMap

  test("retroactive flagging: a later doc flags a doc folded earlier; == batch each step") {
    val state = tmpDir("ds1")
    // b0: A alone (contains run1), a self-repeater, and an unrelated doc
    val a = 1L -> (uniq(1, 100) + run1 + uniq(2, 50))
    val selfRep = 2L -> (uniq(3, 50) * 3) // same 50 chars thrice, ONE doc
    val other = 3L -> uniq(4, 120)
    fold(state, Seq(a, selfRep, other), 0L)
    assert(served(state) === truth(Seq(a, selfRep, other)))
    assert(served(state) === Map.empty, "nothing shared across docs yet; " +
      "self-repeats alone must not flag")

    // b1: B shares run1 — A gets flagged RETROACTIVELY
    val b = 4L -> (uniq(5, 30) + run1 + uniq(6, 80))
    fold(state, Seq(b), 1L)
    val all1 = Seq(a, selfRep, other, b)
    assert(served(state) === truth(all1))
    assert(served(state).keySet === Set(1L, 4L))

    // b2: C copies a LARGER slice of A spanning run1 plus surrounding
    // filler — A's span GROWS and re-coalesces (per-doc replace)
    val aText = a._2
    val c = 5L -> (uniq(7, 20) + aText.substring(80, 180) + uniq(8, 40))
    fold(state, Seq(c), 2L)
    val all2 = all1 :+ c
    assert(served(state) === truth(all2))
    val before = served(state)(1L)
    // b3: a third holder of run1 — A and B are ALREADY flagged there
    // (saturated hash), their stats must not change
    val e = 6L -> (run1 + uniq(9, 70))
    fold(state, Seq(e), 3L)
    assert(served(state) === truth(all2 :+ e))
    assert(served(state)(1L) === before, "saturated hashes must not re-touch old docs")

    // replaying the last batch id is a no-op
    fold(state, Seq(e), 3L)
    assert(served(state) === truth(all2 :+ e))
  }

  test("within-batch duplication and two docs sharing DIFFERENT runs with a third") {
    val state = tmpDir("ds2")
    // within one batch: two docs share run2 → flagged immediately
    val p = 10L -> (uniq(11, 45) + run2)
    val q = 11L -> (run2 + uniq(12, 45))
    fold(state, Seq(p, q), 0L)
    assert(served(state) === truth(Seq(p, q)))
    assert(served(state).keySet === Set(10L, 11L))
    // a doc holding run1 AND run2 arrives: pairs with the older docs on
    // run2 (saturating) and creates nothing for run1 yet
    val r = 12L -> (run1 + uniq(13, 10) + run2)
    fold(state, Seq(r), 1L)
    assert(served(state) === truth(Seq(p, q, r)))
    // now run1's second holder arrives → retro-flags doc 12's run1 part;
    // its span set is REPLACED (two spans if the gap exceeds k)
    val s = 13L -> (uniq(14, 25) + run1 + uniq(15, 25))
    fold(state, Seq(s), 2L)
    assert(served(state) === truth(Seq(p, q, r, s)))
  }

  test("random fuzz: 4 batches of docs with random shared slices == batch after every fold") {
    val state = tmpDir("ds3")
    val rnd = new scala.util.Random(7)
    val pool = (0 until 6).map(i => uniq(2000 + i, 70))
    var all = Seq.empty[(Long, String)]
    var nextId = 100L
    for (bid <- 0L until 4L) {
      val batch = (0 until 3 + rnd.nextInt(3)).map { _ =>
        nextId += 1
        val nParts = 1 + rnd.nextInt(3)
        val text = (0 until nParts).map { _ =>
          if (rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
          else uniq(rnd.nextInt(100000), 30 + rnd.nextInt(60))
        }.mkString
        nextId -> text
      }
      fold(state, batch, bid)
      all ++= batch
      assert(served(state) === truth(all), s"batch $bid diverged from the batch sweep")
    }
  }

  test("compaction horizon: frozen docs' stats freeze but still flag NEW docs") {
    val state = tmpDir("ds4")
    val a = 1L -> (uniq(21, 50) + run1 + uniq(22, 50) + run2 + uniq(23, 20))
    val b = 2L -> (uniq(24, 40) + run1)
    fold(state, Seq(a, b), 0L)
    val frozenStats = served(state)(1L)
    val dropped = IncrementalDupSpans.compact(spark, state,
      org.apache.spark.sql.functions.col("doc_id") === 1L)
    assert(dropped > 0, "freezing must drop the doc's window rows")
    assert(served(state)(1L) === frozenStats, "stats stay served after freeze")

    // a new doc shares run2 — held only by FROZEN doc 1. The new doc
    // still gets flagged (hidx survives compaction), doc 1's own stats
    // stay at their pre-freeze values (the documented horizon loss)
    val c = 3L -> (run2 + uniq(25, 55))
    fold(state, Seq(c), 1L)
    val batchTruth = truth(Seq(a, b, c))
    assert(served(state)(3L) === batchTruth(3L),
      "new doc must flag against frozen text")
    assert(served(state)(1L) === frozenStats,
      "frozen doc's stats freeze (batch would show more)")
    assert(served(state)(2L) === batchTruth(2L), "live docs unaffected")
  }

  test("forget: doc-local removal with the conservative over-flag contract") {
    val state = tmpDir("ds6")
    val a = 1L -> (uniq(41, 50) + run1)
    val b = 2L -> (run1 + uniq(42, 50))
    val c = 3L -> uniq(43, 100)
    fold(state, Seq(a, b, c), 0L)
    assert(served(state).keySet === Set(1L, 2L))
    val bStats = served(state)(2L)

    // forget doc 1: its stats leave the view; doc 2's stats deliberately
    // STAY (the hash summaries keep counting forgotten text — the
    // conservative over-flag, never an under-flag)
    val n = IncrementalDupSpans.forget(spark, state, Seq(1L).toDF("doc_id"),
      numBuckets = 4)
    assert(n > 0)
    assert(served(state).keySet === Set(2L))
    assert(served(state)(2L) === bStats)

    // a future doc matching only the FORGOTTEN text still flags
    // (conservative), and the 1→2-style transition targeting the
    // forgotten holder skips gracefully
    val d = 4L -> (uniq(44, 20) + run1 + uniq(45, 20))
    fold(state, Seq(d), 1L)
    assert(served(state).contains(4L), "new doc must flag against forgotten text")
    assert(!served(state).contains(1L), "forgotten doc must stay gone")

    // unknown ids and replays are no-ops
    assert(IncrementalDupSpans.forget(spark, state, Seq(999L).toDF("doc_id"),
      numBuckets = 4) === 0L)
    val snap = served(state)
    IncrementalDupSpans.forget(spark, state, Seq(1L).toDF("doc_id"), numBuckets = 4)
    assert(served(state) === snap)
  }

  test("start(): JSON-line stream end-to-end; retro across micro-batches") {
    import org.apache.spark.sql.types._
    val in = tmpDir("ds5in"); val state = tmpDir("ds5st"); val ckpt = tmpDir("ds5ck")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val a = 1L -> (uniq(31, 60) + run1)
    val b = 2L -> (run1 + uniq(32, 60))
    def line(t: (Long, String)) = s"""{"doc_id":${t._1},"text":"${t._2}"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b0.json"),
      line(a).getBytes("UTF-8"))
    IncrementalDupSpans.start(spark, in, schema, state, ckpt,
      "doc_id", "text", k).awaitTermination()
    assert(served(state) === Map.empty)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b1.json"),
      line(b).getBytes("UTF-8"))
    IncrementalDupSpans.start(spark, in, schema, state, ckpt,
      "doc_id", "text", k).awaitTermination()
    assert(served(state) === truth(Seq(a, b)))
  }
}
