package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-decade scale-rehearsal corpus (VERDICT r14 task 7): synthesize
  * `factor`× the sf0.1 tables the 10 most expensive bench queries read
  * (documents / events / embeddings) so their sf0.1→sf1 wall-time
  * ratios can be MEASURED against the complexity claims (O(chars),
  * O(Δ), O(distinct)) instead of argued.
  *
  * Each copy k shifts ids into a disjoint range and PERTURBS content so
  * the big corpus reads as "10× more data of the same shape", never
  * "10 duplicates of the same data" (verbatim copies would plant a
  * quadratic cross-copy near-dup/ANN-tie structure no real corpus has
  * and corrupt exactly the exponents being measured):
  *   - documents: every token suffixed `_k` for k > 0 — per-copy
  *     vocabularies are disjoint (pagerank graph, simhash, shingles
  *     scale; within-copy duplicate structure preserved); n_chars
  *     recomputed.
  *   - events: user/event ids shifted; timestamps/types/values kept
  *     (time buckets densify 10×, value-distinct sets stay put — the
  *     O(distinct) queries SHOULD flatline, that is the claim).
  *   - embeddings: ids shifted; each component jittered by a
  *     deterministic ±0.3% so vectors are near-but-not-exact neighbors
  *     of their source (IVF cells fill 10×, top-k stays non-degenerate).
  *
  * {{{ sbt "runMain graft.tools.MakeScaledCorpus /root/testdata/sf0.1 /tmp/graft_sf1 10" }}}
  */
object MakeScaledCorpus {
  def main(args: Array[String]): Unit = {
    val Array(src, dst, factorS) = args.take(3)
    val factor = factorS.toInt
    require(factor >= 1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("make-scaled-corpus")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val SHIFT = 100000000L // beyond any sf0.1 id

    def copies(df: DataFrame)(mk: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(k => mk(df, k)).reduce(_ unionByName _)

    val docs = spark.read.parquet(s"$src/documents.parquet")
    copies(docs) { (d, k) =>
      val text =
        if (k == 0) col("text")
        else array_join(
          transform(split(col("text"), " "), t => concat(t, lit(s"_$k"))), " ")
      d.select(
        (col("doc_id") + lit(k * SHIFT)).as("doc_id"),
        text.as("text"),
        col("lang"), col("source"),
        length(text).cast("long").as("n_chars"))
    }.repartition(32).write.mode("overwrite").parquet(s"$dst/documents.parquet")

    val events = spark.read.parquet(s"$src/events.parquet")
    copies(events) { (e, k) =>
      e.withColumn("event_id", col("event_id") + lit(k * SHIFT))
        .withColumn("user_id", col("user_id") + lit(k * SHIFT))
    }.repartition(32).write.mode("overwrite").parquet(s"$dst/events.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    copies(emb) { (e, k) =>
      if (k == 0) e
      else e.select(
        (col("vec_id") + lit(k * SHIFT)).as("vec_id"),
        transform(col("embedding"), (v, i) =>
          (v * (lit(1.0f) + (pmod(col("vec_id") * 31 + i * 7 + lit(k), lit(7)) - lit(3))
            .cast("float") * lit(0.001f)))).as("embedding"),
        col("label"))
    }.repartition(32).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")

    // relational star: fact/bridge tables scale with shifted keys so
    // shifted facts reference shifted dims; region/nation stay fixed
    // (TPC-H's own scaling rule — dimension shape is scale-invariant)
    def shiftCols(df: DataFrame, k: Int, cols: Seq[String]): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(k * SHIFT)))
    val keyed = Seq(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "customer" -> Seq("c_custkey"),
      "part" -> Seq("p_partkey"),
      "supplier" -> Seq("s_suppkey"))
    keyed.foreach { case (t, ks) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      copies(df)((d, k) => shiftCols(d, k, ks))
        .repartition(32).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    (Seq("documents", "events", "embeddings") ++ keyed.map(_._1)).foreach { t =>
      val n = spark.read.parquet(s"$dst/$t.parquet").count()
      println(s"[scaled] $t: $n rows -> $dst/$t.parquet")
    }
    spark.stop()
  }
}
