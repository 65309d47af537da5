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

  /** Backstop for callers that never call [[releaseAll]]: once more than
    * this many handles are tracked, the OLDEST is released on each new
    * registration. Dropping a block a consumer still reads is safe —
    * Spark recomputes it lazily — so an untracked long-lived session
    * degrades to recomputation instead of accumulating pinned storage.
    * Harness callers release after every query and never approach it. */
  private val MaxTracked = 256

  private val handles = new ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` (MEMORY_AND_DISK) and track the handle for later release. */
  def persisted(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    handles.add(df)
    while (handles.size() > MaxTracked) {
      val old = handles.poll()
      if (old != null) old.unpersist(blocking = false)
    }
    df
  }

  private val ckpts = new ConcurrentLinkedQueue[DataFrame]()

  /** Track a `localCheckpoint()`ed DataFrame that ESCAPES its operator
    * (the final iteration's state): its backing RDD is only safe to
    * unpersist after the consuming query finishes, so it is released by
    * [[releaseAll]] rather than in the loop. (Superseded per-iteration
    * checkpoints are released eagerly via [[releaseCheckpoint]].)
    *
    * Callers of the iterative operators (pageRank, KMeansInt, GdTrainer,
    * Dedup.clusters, Bpe) OWN a releaseAll() call after consuming the
    * result; absent one, the [[MaxTracked]] backstop evicts the oldest
    * checkpoint — note a checkpointed RDD canNOT be recomputed from
    * lineage (it was cut), so an evicted ESCAPED checkpoint fails the
    * consuming query; the cap is sized far above any sane working set. */
  def trackCheckpoint(df: DataFrame): DataFrame = {
    ckpts.add(df)
    while (ckpts.size() > MaxTracked) {
      val old = ckpts.poll()
      if (old != null) releaseCheckpoint(old)
    }
    df
  }

  /** Run `body` and release ONLY the handles it registered — the
    * chunk-scoped release the star's mega-wave fold needs: each chunk's
    * walk intermediates drop before the next chunk materializes (the
    * working-set bound IS the point of chunking), while frames cached
    * BEFORE the scope stay for the remaining chunks. Safe by the same
    * rule as [[releaseAll]]: a dropped block recomputes lazily.
    * Concurrency note: the scope is identified by registration TIME, so
    * a concurrent thread's handles registered during the scope are
    * released with it — a recompute-only (performance) hazard, never a
    * correctness one, but keep scoped work on one thread (the star's
    * chunk loop is). */
  def scoped[T](body: => T): T = {
    val before = new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]()
    handles.forEach(h => before.put(h, java.lang.Boolean.TRUE))
    val r = body
    val it = handles.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (!before.containsKey(h)) { h.unpersist(blocking = false); it.remove() }
    }
    r
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
