package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.IncrementalNearDup

/** Bootstrap-vs-fold cost evidence (dev aid): initialize the near-dup
  * state from the sf0.1 documents corpus via the one-shot batch sweep,
  * check the served labels equal the batch pipeline, then fold a 5-doc
  * steady-state batch on top — the operational sequence (batch
  * bootstrap, then streaming maintenance) with both costs printed.
  *
  * {{{ sbt "runMain graft.tools.BootstrapRehearsal /root/testdata/sf0.1" }}}
  */
object BootstrapRehearsal {
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

    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text")).cache()
    val n = docs.count()
    val maxId = docs.agg(max("doc_id")).collect().head.getLong(0)
    val state = java.nio.file.Files.createTempDirectory("nd-bootstrap").toString
    println(s"[rehearsal] $n docs")

    val t0 = System.nanoTime()
    IncrementalNearDup.bootstrap(docs, "doc_id", "text",
      shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.8,
      stateDir = state, numBuckets = 64)
    println(f"[rehearsal] bootstrap (batch sweep → state): ${(System.nanoTime() - t0) / 1e9}%.2f s")

    def truth(ds: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      val pairs = graft.operators.Dedup.minhashLshPairs(ds, "doc_id", "text",
        shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.8)
      val comp = graft.operators.Dedup.clusters(pairs)
        .as[(Long, Long)].collect().toMap
      graft.operators.Caching.releaseAll()
      ds.select("doc_id").as[Long].collect()
        .map(id => id -> comp.getOrElse(id, id)).toMap
    }
    val got = IncrementalNearDup.labels(spark, state)
      .as[(Long, Long)].collect().toMap
    val want = truth(docs)
    require(got == want, s"bootstrap labels diverged: ${got.size} vs ${want.size}")
    println(s"[rehearsal] bootstrap labels ≡ batch sweep (${got.size} docs)")

    // steady-state continuation: 5 new docs, one a near-dup of doc 0
    val donor = docs.orderBy("doc_id").limit(1).as[(Long, String)].collect().head
    val probe = Seq(
      (maxId + 1L, donor._2 + " tail"),
      (maxId + 2L, "p unique " + ("q " * 40).trim),
      (maxId + 3L, "r unique " + ("s " * 40).trim),
      (maxId + 4L, "t unique " + ("u " * 40).trim),
      (maxId + 5L, "v unique " + ("w " * 40).trim)).toDF("doc_id", "text")
    val t1 = System.nanoTime()
    IncrementalNearDup.processBatch(probe, "doc_id", "text",
      shingleN = 3, numHashes = 8, numBands = 4, threshold = 0.8,
      stateDir = state, batchId = 0L, numBuckets = 64)
    println(f"[rehearsal] steady-state fold on bootstrapped state: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    val got2 = IncrementalNearDup.labels(spark, state)
      .as[(Long, Long)].collect().toMap
    val want2 = truth(docs.unionByName(probe))
    require(got2 == want2, "post-fold labels diverged from the batch sweep")
    println(s"[rehearsal] post-fold labels ≡ batch sweep (${got2.size} docs); done")
    spark.stop()
  }
}
