package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication for document ingest (SURVEY.md §2.11 X1 × the
  * streaming surface): a training-data pipeline dedupes documents AS THEY
  * ARRIVE, not only in batch sweeps. Two variants over a streaming
  * DataFrame with (`idCol`, `textCol`):
  *
  *  - [[exactDedupStream]] — unbounded state: first occurrence of each
  *    distinct text passes, every later copy is dropped, across
  *    micro-batches and restarts (state checkpoints). State per distinct
  *    doc is the 16-byte md5 key, NOT the text — the same
  *    shuffle-16-bytes-never-documents rule as batch `Dedup.exact`; still
  *    O(distinct docs) forever, so use it for bounded corpora or with
  *    state-store TTL configured.
  *  - [[exactDedupStreamWatermarked]] — bounded state: duplicates are only
  *    suppressed within the event-time watermark horizon, and Spark evicts
  *    older keys. The standard choice at 100 TB/day: dup pairs in logs
  *    overwhelmingly arrive close together (retries, re-crawls), and the
  *    batch MinHash/exact sweeps catch long-range stragglers.
  *
  * Both are pure built-ins (`dropDuplicates` on the hash key) — Catalyst
  * plans the streaming-dedup operator with a keyed state store; no custom
  * state code needed, which is exactly when NOT to reach for
  * `mapGroupsWithState` (that stays for genuinely custom state like
  * [[Sessionize]]). */
object StreamingDedup {

  /** First-occurrence-wins exact dedup, unbounded state. The dedup key is
    * `unhex(md5(text))` — a 16-byte BINARY, not the 32-char hex string —
    * so state-store and shuffle volume per distinct doc is half the hex
    * form's. */
  def exactDedupStream(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("text_md5", unhex(md5(col(textCol))))
      .dropDuplicates("text_md5")

  /** Exact dedup with state bounded by the event-time watermark on
    * `tsCol`: duplicates separated by more than `delayThreshold` may both
    * survive (by design — state eviction). */
  def exactDedupStreamWatermarked(
      docs: DataFrame, textCol: String, tsCol: String,
      delayThreshold: String = "10 minutes"): DataFrame =
    docs
      .withColumn("text_md5", unhex(md5(col(textCol))))
      .withWatermark(tsCol, delayThreshold)
      .dropDuplicatesWithinWatermark("text_md5")
}
