package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{cosineSim, dotProduct, l2Norm, pround6}

/** Approximate-nearest-neighbor / similarity search over a dense embedding
  * column (SURVEY.md §2.11 X3). Two paths:
  *
  *  - [[bruteTopK]] — exact: broadcast the (small) query set, score every
  *    (query, candidate) pair with codegen'd higher-order-function dot
  *    products, keep top-k per query via a rank window. At 100 TB the
  *    candidate side streams through map tasks once; per-partition
  *    `TakeOrdered`-style pruning happens in the window's partial sort.
  *  - [[lshTopK]] — scale path: 16-bit random-hyperplane signatures bucket
  *    the corpus (shuffle on a 2-byte key); each query only scores its own
  *    bucket. Recall < 1 by construction; raise `numBits`/probe neighboring
  *    buckets to trade recall vs. cost.
  *
  * Embeddings are cast to double before any arithmetic so both engines sum
  * with the same precision (float accumulation order would diverge).
  */
object Similarity {

  /** Cast a float-array column to double elements. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Exact top-k cosine neighbors for each query vector.
    * @param queries (qid, qv) — small, broadcast
    * @param candidates (vec_id, v) — the corpus */
  def bruteTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val scored = candidates
      .join(broadcast(queries), col("vec_id") =!= col("qid"))
      .withColumn("cos", pround6(cosineSim(col("qv"), col("v"))))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("rn").cast("long").as("rn"), col("cos"))
  }

  /** Deterministic 16×dim hyperplane matrix (fixed seed). */
  def hyperplanes(numBits: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-random-projection bucket id of a double-vector column. */
  def lshBucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    val h = typedLit(planes)
    aggregate(
      sequence(lit(0), lit(planes.size - 1)),
      lit(0),
      (acc, i) => acc * 2 + when(dotProduct(v, element_at(h, i + 1)) > 0d, 1).otherwise(0)
    )
  }

  /** LSH-bucketed approximate top-k: queries only score candidates sharing
    * their hyperplane signature. */
  def lshTopK(embeddings: DataFrame, queryPred: Column, k: Int, numBits: Int = 8,
      dim: Int = 64): DataFrame = {
    // dim MUST match the embedding length: zip_with pads mismatches with
    // nulls, which would collapse every vector into bucket 0 and silently
    // turn LSH into a quadratic scan
    val planes = hyperplanes(numBits, dim)
    val e = embeddings
      .filter(col("embedding").isNotNull) // null vectors are dropped, not an error
      // fail fast on a dim mismatch: zip_with would null-pad and silently
      // collapse every vector into bucket 0 (quadratic scan)
      .filter(assert_true(size(col("embedding")) === dim,
        lit(s"embedding dimension must be $dim")).isNull)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    val q = e.filter(queryPred)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket"))
    val scored = e.join(broadcast(q), Seq("bucket")).filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", pround6(cosineSim(col("qv"), col("v"))))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id").as("nid"), col("rn").cast("long").as("rn"), col("cos"))
  }

  /** Exact top-k via the typed [[TopKAggregator]] — same results as
    * [[bruteTopK]], different physical shape: partial k-element heaps fold
    * map-side and only k rows per (query × partition) shuffle, instead of
    * the window's full per-group sort. The scale path for exact top-k. */
  def bruteTopKAgg(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val scored = candidates
      .join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("id"),
        pround6(cosineSim(col("qv"), col("v"))).as("score"))
    val agg = new TopKAggregator(k).toColumn
    scored.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues { case (_, id, score) => ScoredId(id, score) }
      .agg(agg.name("topk"))
      .toDF("qid", "topk")
      .select(col("qid"), posexplode(col("topk")).as(Seq("pos", "s")))
      .select(col("qid"), col("s.id").as("nid"), (col("pos") + 1).cast("long").as("rn"), col("s.score").as("cos"))
  }

  /** All near-duplicate pairs (cosine ≥ threshold on the rounded value)
    * within equal-`label` blocks — embedding-cosine near-dup dedup (X1's
    * embedding variant). Norms are precomputed per vector, so each pair
    * costs one dot product. */
  def embeddingNearDupPairs(embeddings: DataFrame, threshold: Double): DataFrame = {
    val e = embeddings
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("norm", l2Norm(col("v")))
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
        pround6(dotProduct(col("a.v"), col("b.v")) / (col("a.norm") * col("b.norm"))).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
