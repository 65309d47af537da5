package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING — the learn-the-merges half that
  * [[TextAnalysis]]'s BPE-ish token counting presupposes: iteratively
  * find the most frequent adjacent symbol pair and fuse it, the standard
  * byte-pair-encoding loop (Sennrich et al.).
  *
  * Spark shape: the corpus collapses ONCE to its word vocabulary with
  * frequencies (the classic formulation — pair counts weight by word
  * frequency), so every iteration is a pair-count aggregation over
  * O(vocab) rows, not the corpus; the driver holds only the running
  * merge table (the trained artifact, like [[IvfCodebook]]'s centroids)
  * and the 1-row argmax per round. At 100 TB one trains on a bounded
  * sample exactly as with the IVF codebook — same economics, same
  * pinning recipe.
  *
  * Determinism: argmax tie-break is (count desc, left asc, right asc);
  * merge application is the leftmost-first greedy fold (an `aggregate`
  * HOF per vocab word — interpreted, but vocab-sized × numMerges, never
  * corpus-sized), so the learned sequence is reproducible run-to-run
  * and cluster-size-independent.
  */
object Bpe {

  /** Word vocabulary with frequencies and initial character symbols. */
  private def vocab(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .withColumn("syms", filter(split(col("w"), ""), s => s =!= ""))

  /** One greedy leftmost, non-overlapping merge pass of (a, b) → ab over
    * a symbol-array column. */
  private def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Release the RDD blocks behind a `localCheckpoint()`ed frame — each
    * training round supersedes the previous round's checkpoint, which
    * would otherwise pin vocab-sized storage for every round of the job. */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
      case _ =>
    }

  /** Learn `numMerges` merges; returns them in application order. */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    var seqs = vocab(docs, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    while (rounds < numMerges) {
      val best = seqs
        .select(col("freq"), posexplode(arrays_zip(
          slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0)))))
          .as(Seq("i", "p")))
        .groupBy(col("p.0").as("a"), col("p.1").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) rounds = numMerges // no pairs left: stop
      else {
        val a = best(0).getString(0)
        val b = best(0).getString(1)
        merges += ((a, b))
        val prev = seqs
        seqs = seqs.withColumn("syms", applyMerge(col("syms"), a, b)).localCheckpoint()
        unpersistCheckpoint(prev)
        rounds += 1
      }
    }
    merges.toSeq
  }

  /** Encode: apply a (pinned or learned) merge list in order to every
    * word of the corpus; returns (word, freq, syms) — the segmentation
    * table a tokenizer ships. */
  def encode(docs: DataFrame, textCol: String, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(vocab(docs, textCol)) { case (df, (a, b)) =>
      df.withColumn("syms", applyMerge(col("syms"), a, b))
    }
}
