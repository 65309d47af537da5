package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.md5Hash64

/** Deterministic corpus shuffle + sharding for training-data export — the
  * write-side operator an LLM data pipeline needs after dedup/filtering:
  * training wants the corpus in a pseudo-random order, split into
  * fixed-count shards, and REPRODUCIBLY so (same corpus + salt → same
  * shard layout, regardless of partitioning, cluster size, or run).
  *
  * Both the shard id and the intra-shard order derive from
  * [[md5Hash64]] of the document id + salt: content-independent (no
  * correlation with text length/topic, unlike ordering by ingest time)
  * and engine-reproducible (the harness oracle replays it in SQL).
  *
  * Scale shape: one hash projection + one shuffle on `shard` (the
  * `partitionBy` write); no skew — md5 spreads ids uniformly, so shards
  * are balanced to ±O(√(n/shards)). At 100 TB: `numShards` ≈ total
  * bytes / desired shard file size; writers sort within partitions so
  * each shard file is internally ordered by the shuffle key (stable
  * resume points for data loaders).
  */
object Sharding {

  /** Positive pseudo-random key from an id column and salt. */
  private def shuffleKey(id: Column, salt: String): Column =
    md5Hash64(concat(id.cast("string"), lit(":"), lit(salt)))

  /** Add `shard` (0..numShards-1) and `sort_key` columns. */
  def assignShards(docs: DataFrame, idCol: String, numShards: Int,
      salt: String = "graft"): DataFrame = {
    require(numShards > 0)
    docs
      .withColumn("shard", pmod(shuffleKey(col(idCol), salt), lit(numShards.toLong)).cast("int"))
      .withColumn("sort_key", shuffleKey(col(idCol), salt + ":order"))
  }

  /** Write the shuffled corpus: one directory per shard, rows ordered by
    * the deterministic sort key within each shard file. */
  def writeShards(docs: DataFrame, idCol: String, numShards: Int, path: String,
      salt: String = "graft"): Unit =
    assignShards(docs, idCol, numShards, salt)
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "sort_key")
      .write.partitionBy("shard").mode("overwrite").parquet(path)
}
