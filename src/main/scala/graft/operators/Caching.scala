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

  private val globalHandles = new ConcurrentLinkedQueue[DataFrame]()
  private val globalCkpts = new ConcurrentLinkedQueue[DataFrame]()

  /** THREAD-ISOLATED registries ([[isolated]]): a thread inside an
    * isolation scope registers into (and releases from) its OWN pair of
    * queues instead of the process-global ones — so concurrent catalog
    * stages ([[graft.streaming.ViewCatalog]] `concurrentTiers`) whose
    * engine folds end with [[releaseAll]] cannot unpersist a SIBLING
    * stage's mid-flight persisted frames or drain its tracked
    * localCheckpoints (which, lineage-cut, can never be recomputed). */
  private val isolation = new ThreadLocal[
    (ConcurrentLinkedQueue[DataFrame], ConcurrentLinkedQueue[DataFrame])]()

  private def handles: ConcurrentLinkedQueue[DataFrame] =
    Option(isolation.get).map(_._1).getOrElse(globalHandles)
  private def ckpts: ConcurrentLinkedQueue[DataFrame] =
    Option(isolation.get).map(_._2).getOrElse(globalCkpts)

  /** Run `body` with this thread's Caching registries ISOLATED: every
    * handle it registers lands in a private registry, [[releaseAll]] /
    * [[scoped]] inside the body touch only that registry, and scope
    * exit releases whatever the body left tracked. Other threads (and
    * this thread outside the scope) keep the global registries — their
    * releaseAll can no longer free this scope's frames and vice versa.
    * Scope is per-THREAD: work the body fans out to other threads
    * registers globally (the engines register only from the calling
    * thread; their internal pools run marker-guarded upserts, which
    * never register). */
  def isolated[T](body: => T): T = {
    val prev = isolation.get
    val mine = (new ConcurrentLinkedQueue[DataFrame](),
      new ConcurrentLinkedQueue[DataFrame]())
    isolation.set(mine)
    try body
    finally {
      if (prev == null) isolation.remove() else isolation.set(prev)
      var df = mine._1.poll()
      while (df != null) { df.unpersist(blocking = false); df = mine._1.poll() }
      var ck = mine._2.poll()
      while (ck != null) { releaseCheckpoint(ck); ck = mine._2.poll() }
    }
  }

  /** Persist `df` (MEMORY_AND_DISK) and track the handle for later release. */
  def persisted(df: DataFrame): DataFrame = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    val hs = handles
    hs.add(df)
    while (hs.size() > MaxTracked) {
      val old = hs.poll()
      if (old != null) old.unpersist(blocking = false)
    }
    df
  }

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
    val cs = ckpts
    cs.add(df)
    while (cs.size() > MaxTracked) {
      val old = cs.poll()
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
    val hs = handles
    val before = new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]()
    hs.forEach(h => before.put(h, java.lang.Boolean.TRUE))
    val r = body
    val it = hs.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (!before.containsKey(h)) { h.unpersist(blocking = false); it.remove() }
    }
    r
  }

  /** Unpersist every tracked handle (idempotent; safe while queries on
    * other data are running — Spark recomputes dropped blocks lazily).
    * Inside an [[isolated]] scope this drains only the scope's own
    * registry — a concurrent sibling's frames are untouchable. */
  def releaseAll(): Unit = {
    val hs = handles
    var df = hs.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = hs.poll()
    }
    val cs = ckpts
    var ck = cs.poll()
    while (ck != null) {
      releaseCheckpoint(ck)
      ck = cs.poll()
    }
  }

  /** Number of currently tracked handles in this thread's active
    * registry (test introspection). */
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
