package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Dedup-family scale rehearsal (dev aid, not part of the driver contract):
  * runs exact dedup, MinHash-LSH pairs, and duplicate clustering on the
  * sf0.1 documents corpus and on a synthesized N× duplication-heavy corpus
  * (N id-shifted copies of every doc — the worst realistic shape for a
  * dedup pipeline: every text is an N-way duplicate group), recording wall
  * time, total shuffle-write bytes, and result rows for each operator at
  * each scale. Evidence for ARCHITECTURE §4's O(docs×bands) claim: shuffle
  * should grow ~linearly in docs (plus the output term: N-way groups emit
  * C(N,2) true pairs per text by definition, which is output size, not
  * candidate blow-up).
  *
  * {{{ sbt "runMain graft.tools.ScaleRehearsal /root/testdata/sf0.1 10" }}}
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    val base = graft.Tables.documents(spark, dir)
    // N id-shifted full copies; text identical => every doc is in an N-way
    // exact-duplicate group and LSH must absorb N-way bucket collisions.
    val big = (0 until copies)
      .map(i => base.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000000L)))
      .reduce(_ union _)
    val bigPath = s"/tmp/graft_rehearsal_${copies}x"
    big.write.mode("overwrite").parquet(s"$bigPath/documents.parquet")
    // embeddings: same N-fold id shift; vectors identical across copies —
    // each copy is an exact duplicate on the unit sphere, the worst case
    // for bucketed candidate generation
    val ebase = graft.Tables.embeddings(spark, dir)
    (0 until copies)
      .map(i => ebase.withColumn("vec_id", col("vec_id") + lit(i.toLong * 1000000000L)))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$bigPath/embeddings.parquet")

    def run(label: String, d: String): Unit = {
      def docs = graft.Tables.documents(spark, d)
      def op(name: String)(f: => Long): Unit = {
        // the listener bus is async: drain before reset AND before read, or
        // an op's last stage-completion events leak into the next window
        org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
        shuffleBytes.set(0)
        val t0 = System.nanoTime()
        val rows = f
        val sec = (System.nanoTime() - t0) / 1e9
        org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
        println(f"REHEARSE $label%-4s $name%-12s ${sec}%8.2f s  shuffleWrite ${shuffleBytes.get / 1048576.0}%9.1f MiB  rows $rows%d")
        graft.operators.Caching.releaseAll()
      }
      op("exact")(Dedup.exact(docs, "doc_id", "text").count())
      op("minhash_lsh")(Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.8).count())
      // NOTE: runs the full pairs pipeline AGAIN and then clusters — the
      // row measures the end-to-end pairs→clusters cost, not clustering
      // alone (labelled accordingly)
      op("pairs+clusters")(Dedup.clusters(Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.8)).count())
      // similarity family: same 10 query vectors at every scale, corpus
      // grows N×. At this corpus size (20k × 64-dim at 10×) every variant
      // is overhead-dominated, so the signal is the SHUFFLE column (the
      // corpus must never shuffle; probes broadcast), not a wall-time
      // contrast between brute force and the bucketed paths.
      def emb = graft.Tables.embeddings(spark, d)
      op("ann_lsh")(Similarity.lshTopK(emb, col("vec_id") < 10, k = 5).count())
      op("ann_ivf_pinned")(Similarity.ivfTopKPinned(emb, col("vec_id") < 10, k = 5).count())
      op("brute_topk") {
        val e = emb.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
        val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qv"))
        Similarity.bruteTopKAgg(q, e, k = 5).count()
      }
      // token-shuffle family (round-6): evidence for the O(tokens) claims —
      // shuffle must grow ~linearly in corpus tokens, never quadratically
      op("inverted_idx")(graft.operators.InvertedIndex.postings(docs, "doc_id", "text").count())
      // IVF-PQ encode (the ingest-time index build): pure map pass, zero shuffle
      op("ivfpq_encode")(Similarity.encodeIvfPq(emb).count())
      op("cdc_chunks")(Dedup.chunkDupStats(Dedup.cdcChunks(docs, "doc_id", "text")).count())
      op("tfidf_topk")(graft.operators.TextAnalysis.tfidfTopK(docs).count())
    }

    run("1x", dir)
    run(s"${copies}x", bigPath)

    // Iterative clusters at rehearsal scale (round-6): force the
    // >1M-edge distributed path (driverThreshold=0) on the
    // duplication-heavy corpus, record rounds-to-converge and shuffle,
    // and require label-for-label agreement with the union-find path.
    {
      def docs = graft.Tables.documents(spark, bigPath)
      def pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.8)
      org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
      shuffleBytes.set(0)
      val t0 = System.nanoTime()
      val iterative = Dedup.clusters(pairs, maxIter = 30, driverThreshold = 0L)
        .transform(graft.operators.Caching.persisted)
      val rows = iterative.count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerShim.drainListeners(spark.sparkContext)
      val mib = shuffleBytes.get / 1048576.0
      val iters = Dedup.lastClusterIterations
      val uf = Dedup.clusters(pairs, driverThreshold = Long.MaxValue)
      val disagree = iterative.as("a").join(uf.as("b"), "id")
        .filter(col("a.cluster") =!= col("b.cluster")).count()
      println(f"REHEARSE ${copies}x clusters_iterative ${sec}%8.2f s  " +
        f"shuffleWrite ${mib}%9.1f MiB  rows $rows%d  iterations $iters%d  " +
        f"unionFindDisagreements $disagree%d")
      require(disagree == 0, s"iterative and union-find labels disagree on $disagree ids")
      graft.operators.Caching.releaseAll()
    }
    spark.stop()
  }
}
