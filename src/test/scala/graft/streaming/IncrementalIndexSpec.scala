package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkTestBase
import graft.operators.InvertedIndex

/** Incremental == batch for the inverted index (VERDICT r5 task 1): the
  * streaming fan-out run in two micro-batches must converge to exactly the
  * state a one-shot batch [[InvertedIndex.postings]] computes — df,
  * total_tf AND the XOR posting fingerprint. Mirrors MvPipelineSpec's
  * contract for the reference's 8 MVs. */
class IncrementalIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def jsonLine(id: Long, text: String): String =
    s"""{"doc_id":$id,"text":"$text"}"""

  // chunk2 revisits chunk1's tokens from NEW docs (forces real merges of
  // df, tf and fingerprint), plus a token unique to chunk2
  private val chunk1 = Seq(1L -> "the cat sat", 2L -> "the dog sat sat")
  private val chunk2 = Seq(3L -> "the cat ran", 4L -> "ran ran ran")

  private def sortedState(df: org.apache.spark.sql.DataFrame) =
    df.select("token", "df", "total_tf", "postings_fp")
      .orderBy("token").as[(String, Long, Long, Long)].collect().toSeq

  test("incremental (2 micro-batches) == batch, including XOR fingerprint") {
    val in = tmpDir("ii-in"); val state = tmpDir("ii-state"); val ckpt = tmpDir("ii-ckpt")

    def runAvailable(): Unit =
      IncrementalIndex.start(spark, in, schema, state, ckpt).awaitTermination()

    Files.write(Paths.get(in, "c1.jsonl"),
      chunk1.map((jsonLine _).tupled).mkString("\n").getBytes)
    runAvailable()
    Files.write(Paths.get(in, "c2.jsonl"),
      chunk2.map((jsonLine _).tupled).mkString("\n").getBytes)
    runAvailable()

    val batch = InvertedIndex.postings(
      (chunk1 ++ chunk2).toDF("doc_id", "text"), "doc_id", "text")
    assert(sortedState(IncrementalIndex.readState(spark, state)) ===
      sortedState(batch))
  }

  test("retract + compact removes a chunk; fingerprint self-inverts") {
    val state = tmpDir("ii-retract")
    IncrementalIndex.processBatch(chunk1.toDF("doc_id", "text"), state, batchId = 0L)
    IncrementalIndex.processBatch(chunk2.toDF("doc_id", "text"), state, batchId = 1L)
    IncrementalIndex.retract(chunk2.toDF("doc_id", "text"), state, batchId = 2L)
    IncrementalIndex.compact(spark, state)
    // back to exactly the chunk1-only index: counts subtracted, the
    // fingerprint XOR-ed a second time (self-inverse), df==0 rows dropped
    val batch1 = InvertedIndex.postings(chunk1.toDF("doc_id", "text"), "doc_id", "text")
    assert(sortedState(IncrementalIndex.readState(spark, state)) ===
      sortedState(batch1))
  }

  test("BM25 search over maintained state == batch search; corpus absent from plan") {
    val state = tmpDir("ii-bm25")
    IncrementalIndex.processBatch(chunk1.toDF("doc_id", "text"), state, batchId = 0L)
    IncrementalIndex.processBatch(chunk2.toDF("doc_id", "text"), state, batchId = 1L)

    val full = (chunk1 ++ chunk2).toDF("doc_id", "text")
    val batch = InvertedIndex.bm25TopK(
      InvertedIndex.postingsDetail(full, "doc_id", "text"),
      InvertedIndex.docLengths(full, "doc_id", "text"),
      Seq("cat", "ran"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    graft.operators.Caching.releaseAll()

    val fromState = IncrementalIndex.searchBm25(spark, state, Seq("cat", "ran"), k = 10)
    // the read path consumes ONLY the maintained summaries: no in-memory
    // corpus relation (LocalTableScan/LogicalRDD) anywhere in its plan
    val plan = fromState.queryExecution.optimizedPlan.toString
    assert(!plan.contains("LocalRelation") && !plan.contains("LogicalRDD"),
      s"corpus leaked into the state-serving plan:\n$plan")
    val got = fromState.as[(Long, Long, Long)].collect().toSeq
    graft.operators.Caching.releaseAll()

    assert(got === batch)
    assert(got.nonEmpty)
    // ranking sanity: doc 3 ("the cat ran") matches BOTH query terms and
    // outranks doc 4 ("ran ran ran"), whose higher tf on one term can't
    // beat two summed term scores
    assert(got.head._1 === 3L && got.head._2 === 2L)
  }

  test("bucketed state: incremental == batch; small batch rewrites only touched buckets") {
    val state = tmpDir("ii-bucketed")
    IncrementalIndex.processBatchBucketed(chunk1.toDF("doc_id", "text"), state,
      batchId = 0L, numBuckets = 8)

    // record per-bucket mtimes, then fold a one-doc batch with ONE token
    val postingsDir = new java.io.File(s"$state/postings")
    def bucketMtimes(): Map[String, Long] =
      postingsDir.listFiles().filter(_.getName.matches("bucket=\\d+"))
        .map(d => d.getName -> d.listFiles().map(_.lastModified).max).toMap
    val before = bucketMtimes()
    Thread.sleep(1100) // mtime granularity
    IncrementalIndex.processBatchBucketed(Seq(9L -> "cat").toDF("doc_id", "text"),
      state, batchId = 1L, numBuckets = 8)
    val after = bucketMtimes()
    val rewritten = after.keySet.filter(b => !before.contains(b) || after(b) > before(b))
    // "cat" hashes into exactly one bucket — the others are untouched bytes
    assert(rewritten.size === 1, s"rewrote $rewritten, expected 1 bucket")
    assert(before.size > 1, "rehearsal needs a multi-bucket state to be meaningful")

    // replay idempotence across the bucket loop
    IncrementalIndex.processBatchBucketed(Seq(9L -> "cat").toDF("doc_id", "text"),
      state, batchId = 1L, numBuckets = 8)

    val full = (chunk1 :+ (9L -> "cat")).toDF("doc_id", "text")
    val batch = InvertedIndex.bm25TopK(
      InvertedIndex.postingsDetail(full, "doc_id", "text"),
      InvertedIndex.docLengths(full, "doc_id", "text"),
      Seq("cat", "sat"), k = 10).as[(Long, Long, Long)].collect().toSeq
    graft.operators.Caching.releaseAll()
    val got = IncrementalIndex.searchBm25Bucketed(spark, state, Seq("cat", "sat"), k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    graft.operators.Caching.releaseAll()
    assert(got === batch)
    assert(got.nonEmpty)
  }

  test("positional state: incremental == batch; phrase search from state == recompute") {
    val state = tmpDir("ii-pos")
    IncrementalIndex.processBatchPositional(chunk1.toDF("doc_id", "text"), state, batchId = 0L)
    IncrementalIndex.processBatchPositional(chunk2.toDF("doc_id", "text"), state, batchId = 1L)
    // replay folds nothing twice
    IncrementalIndex.processBatchPositional(chunk2.toDF("doc_id", "text"), state, batchId = 1L)

    val full = (chunk1 ++ chunk2).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("token", "doc_id").as[(String, Long, Seq[Int])].collect().toSeq
    assert(canon(MvPipeline.readState(spark, state, "positional")) ===
      canon(InvertedIndex.positionalPostings(full, "doc_id", "text")))

    // "the cat" occurs in docs 1 and 3 exactly once each; doc 2 has "the"
    // but not the phrase; "sat sat" only in doc 2
    val got = IncrementalIndex.searchPhrase(spark, state, Seq("the", "cat"))
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (3L, 1L)))
    val rep = IncrementalIndex.searchPhrase(spark, state, Seq("sat", "sat"))
      .as[(Long, Long)].collect().toSeq
    assert(rep === Seq((2L, 1L)))
  }

  test("replayed batch id folds exactly once") {
    val state = tmpDir("ii-idem")
    val docs = chunk1.toDF("doc_id", "text")
    IncrementalIndex.processBatch(docs, state, batchId = 5L)
    IncrementalIndex.processBatch(docs, state, batchId = 5L) // replay: skipped
    val batch = InvertedIndex.postings(docs, "doc_id", "text")
    assert(sortedState(IncrementalIndex.readState(spark, state)) ===
      sortedState(batch))
  }
}
