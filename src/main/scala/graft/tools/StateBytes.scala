package graft.tools

import java.io.File

/** Shared bucket-dir write-amplification probe for the streaming-view
  * rehearsals: snapshot per-bucket mtimes + total bytes before a fold,
  * then report how many buckets (and bytes) the fold actually rewrote —
  * the evidence line for the bucketed layout's O(Δ) write claim
  * (ARCHITECTURE §4). Callers sleep ≥ 1.1 s between snapshot and fold so
  * filesystem timestamp granularity can't mask a rewrite. */
private[tools] object StateBytes {
  def dirBytes(d: File): Long =
    if (!d.exists()) 0L
    else d.listFiles().map(f => if (f.isDirectory) dirBytes(f) else f.length()).sum

  /** bucket-name → newest mtime under it. */
  def snapshot(d: File): Map[String, Long] =
    if (!d.exists()) Map.empty
    else d.listFiles().filter(_.getName.matches("bucket=\\d+"))
      .map(b => b.getName -> allFiles(b).map(_.lastModified).max).toMap

  private def allFiles(d: File): Seq[File] = {
    val fs = d.listFiles().toSeq
    fs.filter(_.isFile) ++ fs.filter(_.isDirectory).flatMap(allFiles)
  }

  /** (buckets rewritten, bytes rewritten, total buckets, total bytes). */
  def rewritten(d: File, before: Map[String, Long]): (Int, Long, Int, Long) = {
    val after = snapshot(d)
    val rw = after.keySet.filter(b => !before.contains(b) || after(b) > before(b))
    val rwBytes = rw.toSeq.map(b => dirBytes(new File(d, b))).sum
    (rw.size, rwBytes, after.size, dirBytes(d))
  }

  def report(tag: String, d: File, before: Map[String, Long]): Unit = {
    val (rwN, rwB, totN, totB) = rewritten(d, before)
    println(f"[rehearsal]   $tag: rewrote $rwN%d/$totN%d buckets = ${rwB / 1024}%d/${totB / 1024}%d KiB (${if (totB > 0) 100.0 * rwB / totB else 0.0}%.1f%% of state)")
  }
}
