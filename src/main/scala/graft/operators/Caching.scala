package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Tracked persistence for operator-internal fan-out points.
  *
  * Dedup/similarity pipelines persist intermediates that feed multiple plan
  * branches (self-join sides, signature → verify). Those handles were
  * previously fire-and-forget: in a long-lived session repeatedly invoking
  * the operators (the facade usage pattern), cached blocks accumulated
  * until executor storage filled. Every internal persist now registers
  * here; callers (or the [[graft.api.AdGuardAnalytics]] facade) release
  * them after consuming results via [[releaseAll]].
  *
  * Unpersist is non-blocking: dropping blocks is cleanup, not a barrier. */
object Caching {

  private val handles = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK) and track the handle for later release. */
  def persisted(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    handles.add(df)
    df
  }

  private val ckpts = new ConcurrentLinkedQueue[DataFrame]()

  /** Track a `localCheckpoint()`ed DataFrame that ESCAPES its operator
    * (the final iteration's state): its backing RDD is only safe to
    * unpersist after the consuming query finishes, so it is released by
    * [[releaseAll]] rather than in the loop. (Superseded per-iteration
    * checkpoints are released eagerly via [[releaseCheckpoint]].) */
  def trackCheckpoint(df: DataFrame): DataFrame = {
    ckpts.add(df)
    df
  }

  /** Unpersist every tracked handle (idempotent; safe while queries on
    * other data are running — Spark recomputes dropped blocks lazily). */
  def releaseAll(): Unit = {
    var df = handles.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = handles.poll()
    }
    var ck = ckpts.poll()
    while (ck != null) {
      releaseCheckpoint(ck)
      ck = ckpts.poll()
    }
  }

  /** Number of currently tracked handles (test introspection). */
  def trackedCount: Int = handles.size()

  /** Unpersist the RDD behind a `localCheckpoint()`ed DataFrame.
    * Iterative operators (pageRank, k-means, label propagation, BPE)
    * checkpoint per iteration; each superseded checkpoint must be
    * released or the job pins one O(state) RDD PER ITERATION for its
    * lifetime (visible as residual blocks in the storage audit). */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
      case _ =>
    }
}
