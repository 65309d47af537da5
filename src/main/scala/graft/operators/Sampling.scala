package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{md5Hash64, unitInterval}

/** Deterministic sampling and dataset splitting (SURVEY.md §2.11 R17) —
  * the reproducibility-critical half of a training-data pipeline: the
  * same row lands in the same sample/split on every rerun, on any
  * cluster size, in any engine, because membership is a pure function of
  * the row's id (md5-derived uniform position, the same primitive as
  * [[Sketches]]), not of RNG state, partitioning, or row order.
  * `df.sample()` guarantees none of those things.
  *
  * Scale shape: both operators are stateless row-wise filters/projections
  * — no shuffle, fully codegen'd, pushed into the scan's batch loop.
  */
object Sampling {

  /** Uniform (0,1) position of `id` under `salt` (distinct salts give
    * independent samples) — [[graft.functions.unitInterval]] over the
    * salted md5 hash. */
  private def uniformPos(id: Column, salt: String): Column =
    unitInterval(md5Hash64(concat(id.cast("string"), lit(salt))))

  /** Keep each row iff its id's uniform position < `fraction` —
    * a deterministic Bernoulli(fraction) sample. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String = ":sample"): DataFrame =
    df.filter(uniformPos(col(idCol), salt) < fraction)

  /** Assign every row a train/val/test split by uniform-position
    * thresholds (train: u < trainFrac; val: u < trainFrac+valFrac;
    * else test) — disjoint, exhaustive, and stable under any reordering
    * or re-partitioning of the input. */
  def assignSplit(df: DataFrame, idCol: String, trainFrac: Double,
      valFrac: Double, salt: String = ":split"): DataFrame = {
    val u = uniformPos(col(idCol), salt)
    df.withColumn("split",
      when(u < trainFrac, "train")
        .when(u < trainFrac + valFrac, "val")
        .otherwise("test"))
  }

  /** Benchmark-decontamination stats: per-`groupCol` count of TEST-split
    * rows whose exact `textCol` md5 also appears in the TRAIN split —
    * the overlap an eval must rule out. At 100 TB the train side
    * collapses to a broadcast of distinct 16-byte hashes; texts never
    * shuffle. */
  def contaminationStats(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, trainFrac: Double, valFrac: Double): DataFrame = {
    val sp = Caching.persisted(
      assignSplit(df, idCol, trainFrac, valFrac)
        .select(col(groupCol), col("split"), md5(col(textCol)).as("h")))
    val train = sp.filter(col("split") === "train")
      .select(col("h")).distinct().withColumn("in_train", lit(1L))
    sp.filter(col("split") === "test")
      .join(broadcast(train), Seq("h"), "left")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("test_docs"),
        sum(coalesce(col("in_train"), lit(0L))).as("contaminated"))
  }
}
