package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types._

/** Per-micro-batch latency / throughput of the streaming maintenance
  * surface (VERDICT r6 task 7): replays the inputs as N-file directories
  * with one file per trigger and records every micro-batch's
  * triggerExecution duration from the StreamingQueryListener —
  * batches/sec, rows/sec, p50/p99 batch latency per maintained family:
  *
  *  - `mv8`: the 8-view querylog fan-out (MvPipeline — parse once,
  *    8 concurrent summary merges per batch)
  *  - `ext6`: the 6 document-side incremental extension views folded per
  *    batch (inverted index incl. BM25 tables, KMV, CMS, heavy hitters,
  *    mixture, contamination registry)
  *  - `spikes`: event-side spike-bucket maintenance
  *  - `ann`: embedding-side IVF-PQ index maintenance
  *
  * {{{ sbt "runMain graft.tools.StreamBench /root/testdata/sf0.1" }}}
  */
object StreamBench {

  private final case class Rec(rows: Long, ms: Long)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val recs = new java.util.concurrent.ConcurrentLinkedQueue[Rec]()
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val ms = Option(e.progress.durationMs.get("triggerExecution")).map(_.longValue)
        ms.foreach(m => recs.add(Rec(e.progress.numInputRows, m)))
      }
    })

    val base = s"/tmp/stream_bench_${java.util.UUID.randomUUID.toString.take(8)}"
    def fresh(name: String): (String, String, String) =
      (s"$base/$name/in", s"$base/$name/state", s"$base/$name/ckpt")

    def measure(name: String)(run: => Unit): Unit = {
      recs.clear()
      val t0 = System.nanoTime()
      run
      Thread.sleep(2000) // let the async listener drain
      val wall = (System.nanoTime() - t0) / 1e9 - 2.0
      val rs = recs.toArray(Array.empty[Rec]).filter(_.rows > 0).sortBy(_.ms)
      val rows = rs.map(_.rows).sum
      def pct(p: Double) = if (rs.isEmpty) 0L else rs(math.min(rs.length - 1,
        (p * rs.length).toInt)).ms
      println(f"STREAM $name%-7s batches ${rs.length}%3d  rows $rows%7d  " +
        f"wall $wall%6.1f s  batches/s ${rs.length / wall}%5.2f  rows/s ${(rows / wall).toLong}%7d  " +
        f"p50 ${pct(0.5)}%5d ms  p99 ${pct(0.99)}%5d ms")
    }

    // ---- mv8: querylog 8-view fan-out, 100k lines in 20 file-batches ----
    locally {
      val (in, state, ckpt) = fresh("mv8")
      IngestBench.syntheticLines(spark, 100000L)
        .repartition(20).write.text(in)
      measure("mv8") {
        graft.streaming.MvPipeline.start(spark, in, state, ckpt,
          maxFilesPerTrigger = 1).awaitTermination()
      }
    }

    // ---- ext6: 6 doc-side extension views per batch, 10 file-batches ----
    locally {
      val (in, state, ckpt) = fresh("ext6")
      graft.Tables.documents(spark, dir)
        .select("doc_id", "text", "source", "lang")
        .repartition(10).write.json(in)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("source", StringType), StructField("lang", StringType)))
      measure("ext6") {
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in)
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            val b = batch.persist()
            try {
              b.count() // materialize once before the concurrent fan-out
              val toks = b.select(explode(graft.operators.TextOps.tokens(col("text"))).as("t"))
                .filter(col("t") =!= "")
              // concurrent view merges, the MvPipeline.processBatch pattern
              val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
              implicit val ec: scala.concurrent.ExecutionContext =
                scala.concurrent.ExecutionContext.fromExecutorService(pool)
              import scala.concurrent.Future
              try scala.concurrent.Await.result(Future.sequence(Seq(
                Future(graft.streaming.IncrementalIndex.processBatch(b, state, bid)),
                Future(graft.streaming.IncrementalKmv.processBatch(b, Seq("lang"), "doc_id", state, 64, bid)),
                Future(graft.streaming.IncrementalCms.processBatch(toks, "t", state, 4, 256, bid)),
                Future(graft.streaming.IncrementalHeavyHitters.processBatch(toks, "t", state, 20, bid)),
                Future(graft.streaming.IncrementalMixture.processBatch(b, state, bid)),
                Future(graft.streaming.StreamingContamination.processBatch(b, "text", state, bid))
              )), scala.concurrent.duration.Duration.Inf)
              finally pool.shutdown()
              ()
            } finally b.unpersist()
          }
          .start().awaitTermination()
      }
    }

    // ---- spikes: event-side bucket maintenance, 10 file-batches ----
    locally {
      val (in, state, ckpt) = fresh("spikes")
      graft.Tables.events(spark, dir).select("event_type", "ts")
        .repartition(10).write.json(in)
      val schema = StructType(Seq(
        StructField("event_type", StringType), StructField("ts", LongType)))
      measure("spikes") {
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in)
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            graft.streaming.StreamingSpikes.processBatch(
              batch, "event_type", "ts", 10, state, bid)
          }
          .start().awaitTermination()
      }
    }

    // ---- beh3: event-side behavioral state (delta-join sequence view +
    //      day bitmaps + value histogram), 10 file-batches ----
    locally {
      val (in, state, ckpt) = fresh("beh3")
      graft.Tables.events(spark, dir)
        .select(col("user_id"), col("event_type"),
          expr("ts DIV 1000").as("t_us"), col("value"))
        .repartition(10).write.json(in)
      val schema = StructType(Seq(
        StructField("user_id", LongType), StructField("event_type", StringType),
        StructField("t_us", LongType), StructField("value", DoubleType)))
      val conds = Seq(("view", None), ("click", Some(3600000000L)),
        ("purchase", Some(86400000000L)))
      measure("beh3") {
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in)
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            val b = batch.persist()
            try {
              b.count()
              graft.streaming.IncrementalSequence.processBatch(
                b, "user_id", "t_us", "event_type", conds, state, bid)
              graft.streaming.IncrementalBitmap.processBatch(
                b.select(expr("t_us DIV 86400000000").as("day"), col("user_id")),
                "day", "user_id", state, bid)
              graft.streaming.IncrementalHistogram.processBatch(
                b, Seq("event_type"), "value", state, bid)
              ()
            } finally { b.unpersist(); () }
          }
          .start().awaitTermination()
      }
    }

    // ---- ann: embedding-side IVF-PQ index maintenance, 10 file-batches ----
    locally {
      val (in, state, ckpt) = fresh("ann")
      graft.Tables.embeddings(spark, dir)
        .select(col("vec_id"), graft.operators.Similarity.asDouble(col("embedding")).as("embedding"))
        .repartition(10).write.json(in)
      val schema = StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(DoubleType))))
      measure("ann") {
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(in)
          .writeStream.option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, bid: Long) =>
            graft.streaming.IncrementalAnnIndex.processBatch(batch, state, bid)
          }
          .start().awaitTermination()
      }
    }

    spark.stop()
  }
}
