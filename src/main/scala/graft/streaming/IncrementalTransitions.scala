package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental maintenance of the R135 transition matrix — non-trivial
  * because adjacency CROSSES batch boundaries: the first event of a
  * user's new batch continues the chain from their last event of the
  * previous one. State:
  *
  *  - `last_event` (user → (t, id, et) of the latest event), merged by
  *    `max_by` under the total (t, id) order — the struct moves
  *    atomically, so the stored type always belongs to the stored
  *    timestamp (independent per-column max would tear it);
  *  - `transitions` (from, to → n) under the plain SUM upsert.
  *
  * Each batch contributes its INTERNAL lead-pass adjacencies plus one
  * BRIDGE adjacency per user with prior state (stored last → batch
  * first). Like deltaSum's day-span bridge (R106), this carries a
  * TIME-ORDERED contract: batches must not interleave below the
  * per-user grain (an event older than the stored last would need
  * retraction of a counted edge — out of scope, documented). The
  * `<end>` sink is a READ-time concept (the live last event is not yet
  * an edge), so `read` adds the per-user open ends from `last_event`
  * without storing them.
  */
object IncrementalTransitions {

  /** Fold one micro-batch of (user, t, id, et) rows. */
  def processBatch(events: DataFrame, stateDir: String,
      batchId: Long = -1L): Unit = {
    val spark = events.sparkSession
    val ev = events.select(col("user"), col("t"), col("id"), col("et"))
    val w = Window.partitionBy("user").orderBy("t", "id")
    val withNext = ev.withColumn("nxt", lead(col("et"), 1).over(w))
    val internal = withNext.filter(col("nxt").isNotNull)
      .groupBy(col("et").as("from_type"), col("nxt").as("to_type"))
      .agg(count(lit(1)).as("n"))

    val firsts = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val prior = MvPipeline.readStateOrEmpty(spark, stateDir, "last_event",
      firsts.select(col("user"), col("t"), col("id"), col("et")).schema)
    val bridge = firsts.join(
        prior.select(col("user"), col("et").as("pet")), "user")
      .groupBy(col("pet").as("from_type"), col("et").as("to_type"))
      .agg(count(lit(1)).as("n"))

    MvPipeline.upsert(internal.unionByName(bridge)
        .groupBy("from_type", "to_type").agg(sum("n").as("n")),
      s"$stateDir/transitions", Seq("from_type", "to_type"), batchId)

    val lasts = ev.groupBy("user").agg(
      max(col("t")).as("t"),
      max_by(col("id"), struct(col("t"), col("id"))).as("id"),
      max_by(col("et"), struct(col("t"), col("id"))).as("et"))
    MvPipeline.upsertWith(lasts, s"$stateDir/last_event", Seq("user"), {
      case "t"  => max(col("t"))
      case "id" => max_by(col("id"), struct(col("t"), col("id")))
      case "et" => max_by(col("et"), struct(col("t"), col("id")))
      case other => throw new IllegalArgumentException(other)
    }, batchId)
  }

  /** The matrix served from state, with the read-time `<end>` sink rows
    * (each user's live last event has no successor YET). */
  def read(spark: SparkSession, stateDir: String): DataFrame = {
    val trans = MvPipeline.readState(spark, stateDir, "transitions")
    val ends = MvPipeline.readState(spark, stateDir, "last_event")
      .groupBy(col("et").as("from_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("to_type", lit("<end>"))
      .select("from_type", "to_type", "n")
    trans.unionByName(ends)
      .groupBy("from_type", "to_type").agg(sum("n").as("n"))
  }
}
