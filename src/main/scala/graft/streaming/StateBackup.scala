package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Consistent BACKUP / RESTORE of maintained-view state (r14, R181;
  * differential since r15) — the disaster-recovery half of operating
  * the engine: a deployment's state is a set of bucketed tables +
  * markers + floors under the stages' state dirs (plus the catalog
  * dir's completion floors), and "restore from last night" must
  * reproduce a state every read and every resumed fold treats as
  * identical to the original.
  *
  * Consistency contract: a backup is taken BETWEEN batches (the
  * catalog's single-writer idle point — after [[ViewCatalog.runBatch]]
  * returns, before the next). [[backup]] REFUSES a dir that carries
  * in-flight protocol artifacts — staged deltas (`_delta_*`), swap
  * leftovers (`.tmp`/`.old`), half-restored staging (`.restoring`) —
  * because they mark a crash mid-fold: a copy taken then is restorable
  * (the replay protocol converges from exactly such states) but NOT a
  * clean point-in-time, so taking one must be an explicit `force`
  * decision, not an accident. Spark's own CheckpointFileManager leaves
  * `.<name>.<uuid>.tmp` orphans in a CRASHED-BUT-IDLE streaming
  * checkpoint dir (its rename-based commit never sweeps losers), and a
  * checkpoint dir is part of the documented (state, floors, offsets)
  * triple — those specific names are therefore NOT treated as
  * in-flight: the checkpoint's commit protocol ignores them on resume,
  * so a copy carrying them is still a clean point-in-time.
  *
  * Integrity: the backup writes a `_backup_manifest` naming every file
  * with its length AND an MD5 content checksum (computed while the
  * copy streams the bytes — no extra read). [[verify]] re-checks
  * presence + length (a pure listing); `verify(deep = true)` re-reads
  * every byte against the checksums. [[restore]] always re-hashes what
  * it copies, so same-length bit corruption is refused mid-restore —
  * and because the copy lands in a `<target>.restoring` staging dir
  * that only SWAPS over the live target after every file verified, a
  * refused or crashed restore leaves the pre-restore target intact
  * (the one crash window, between the aside-rename and the swap, holds
  * the complete verified staging dir beside the aside copy — nothing
  * is lost, re-run the restore).
  *
  * DIFFERENTIAL backups ([[backupIncremental]], r15 — closes the last
  * O(state) ops cost): a backup chained to a BASE copies only the
  * files whose (length, source mtime) changed since the base recorded
  * them, plus its own manifest; unchanged files are carried as CHAIN
  * POINTERS (manifest layer field = hops up the base chain to the dir
  * that physically holds the bytes). The fingerprint is the same
  * conservative device as the R178 bucket fingerprints: no write path
  * in the engine changes a file's rows without replacing the file
  * (part names carry fresh job UUIDs; markers commit via rename), so
  * (name, length, mtime)-equal ⇒ byte-equal. Per nightly backup the
  * cost is O(changed buckets' bytes) + O(files) listings — a no-change
  * night copies nothing. [[verify]]/[[restore]] resolve pointers
  * through the chain, so a restore from an incremental reproduces the
  * full tree (base + increments) byte-identically; tampering with ANY
  * layer is caught by the same length/checksum checks.
  *
  * Scheduling + retention ([[backupAuto]]/[[pruneBackups]]): the
  * nightly loop as one maintenance-tier call — incremental chained to
  * the newest backup, a fresh FULL whenever the chain would exceed
  * `maxChain` (restore cost and tamper blast-radius grow with the
  * chain), and chain-aware pruning that keeps the newest K plus every
  * base they transitively depend on, so retention can never delete a
  * base out from under a kept increment.
  *
  * Streaming resume: a deployment restoring state UNDER A LIVE
  * CHECKPOINT must back up the checkpoint dir (and the catalog dir's
  * completion floors) in the SAME call as the state dirs — they are
  * ordinary directories here, just list them. Restoring state alone
  * rewinds the floors below the checkpoint's next batch id, and the
  * resumed stream would fold only from that id onward, silently
  * missing every batch between the backup point and the checkpoint
  * (the replay protocol protects against re-application, not against
  * a source that no longer re-offers consumed offsets). One backup =
  * one consistent (state, floors, offsets) triple.
  *
  * 100 TB shape: the listing/manifest/refusal protocol is the
  * contract; the byte movement is a DISTRIBUTED copy (one Spark job
  * over the file list — each task streams its files through the
  * Hadoop FileSystem API, so the driver never holds file bytes and
  * the copy parallelism is the executor count, the distcp shape).
  * Relative layout is preserved exactly: `<dst>/<i>/<relative path>`
  * per source dir, so nested bucket dirs, layout markers, replay
  * stamps, and resume floors ride along byte-for-byte. */
object StateBackup {

  /** `files`/`bytes` describe the NAMED tree (what a restore
    * reproduces); `copiedFiles`/`copiedBytes` what this call physically
    * moved — equal for a full backup, the changed subset for an
    * incremental one. */
  final case class BackupReport(dirs: Int, files: Long, bytes: Long,
      copiedFiles: Long, copiedBytes: Long)

  /** One manifest entry: `key` = `<i>/<relative path>`, `layer` = hops
    * up the base chain to the backup dir holding the bytes (0 = this
    * one). `mtime` is the SOURCE file's modification time at backup
    * time — the incremental change fingerprint, never compared against
    * backup copies. */
  final case class Entry(key: String, len: Long, md5: String,
      mtime: Long, layer: Int)

  private final case class Manifest(srcDirs: Seq[String],
      base: Option[String], entries: Seq[Entry])

  /** Copy `stateDirs` to `dstDir` (one numbered subdir per source,
    * `_backup_manifest` at the root). Refuses in-flight protocol
    * artifacts unless `force`; refuses a non-empty `dstDir`. */
  def backup(spark: SparkSession, stateDirs: Seq[String], dstDir: String,
      force: Boolean = false): BackupReport =
    backupImpl(spark, stateDirs, dstDir, base = None, force)

  /** Differential backup chained to `baseDir` (itself a full OR
    * incremental backup of the SAME source dirs): copies only files
    * whose (length, mtime) changed since the base's manifest recorded
    * them; unchanged files ride as chain pointers. The base must
    * [[verify]] (shallow) first — chaining to a damaged base would
    * bake its damage into every later restore. */
  def backupIncremental(spark: SparkSession, stateDirs: Seq[String],
      dstDir: String, baseDir: String,
      force: Boolean = false): BackupReport = {
    require(verify(spark, baseDir),
      s"base backup $baseDir fails its manifest check — refusing to chain " +
        "an incremental to a truncated or tampered base")
    val baseMan = readManifest(spark, baseDir)
    require(baseMan.entries.forall(_.md5.nonEmpty),
      s"base backup $baseDir is a v1 (pre-r15) backup — v1 recorded no " +
        "mtimes or hashes, so the incremental change fingerprint cannot " +
        "chain to it; take a fresh full backup to re-anchor")
    require(baseMan.srcDirs == stateDirs,
      s"base backup covers ${baseMan.srcDirs}, incremental asked for " +
        s"$stateDirs — a chain must describe one source-dir tuple")
    backupImpl(spark, stateDirs, dstDir, Some((baseDir, baseMan)), force)
  }

  private def backupImpl(spark: SparkSession, stateDirs: Seq[String],
      dstDir: String, base: Option[(String, Manifest)],
      force: Boolean): BackupReport = {
    require(stateDirs.nonEmpty, "nothing to back up")
    require(stateDirs.distinct.size == stateDirs.size, "duplicate state dirs")
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(dstDir)
    val dfs = dst.getFileSystem(conf)
    require(!dfs.exists(dst) || dfs.listStatus(dst).isEmpty,
      s"backup destination $dstDir is not empty")
    if (!force) stateDirs.foreach { d =>
      val bad = inFlightArtifacts(spark, d)
      require(bad.isEmpty,
        s"$d carries in-flight protocol artifacts (crash mid-fold?): " +
          bad.take(5).mkString(", ") +
          " — run the owning stream's recovery (any merge replays and " +
          "sweeps them), or pass force = true for a convergent-but-dirty copy")
    }
    val current = stateDirs.zipWithIndex.flatMap { case (d, i) =>
      listFiles(spark, d).map { case (rel, len, mtime) =>
        (s"$i/$rel", s"$d/$rel", len, mtime) }
    }
    val baseByKey: Map[String, Entry] =
      base.map(_._2.entries.map(e => e.key -> e).toMap).getOrElse(Map.empty)
    // (len, mtime)-equal ⇒ byte-equal: every engine write path replaces
    // files (fresh part UUIDs / rename commits), never edits in place —
    // the R178 fingerprint argument, file-grained. Exception (ADVICE
    // r15): small `_`-named marker/floor files (`_fps_*`, resume
    // floors, _SUCCESS) are rewritten IN PLACE at constant length, so
    // on a coarse-mtime store a rewrite within one granularity tick
    // would ride as a stale pointer — they always copy (bytes are
    // negligible; the fingerprint shortcut only pays on parquet parts,
    // whose fresh-UUID names never collide).
    def alwaysCopy(key: String, len: Long): Boolean =
      key.substring(key.lastIndexOf('/') + 1).startsWith("_") && len <= 65536
    val (unchanged, changed) = current.partition { case (key, _, len, mtime) =>
      !alwaysCopy(key, len) &&
        baseByKey.get(key).exists(e => e.len == len && e.mtime == mtime)
    }
    val copied = distributedCopy(spark,
      changed.map { case (key, src, _, _) => (src, s"$dstDir/$key") })
    val entries =
      changed.map { case (key, _, len, mtime) =>
        Entry(key, len, copied(s"$dstDir/$key"), mtime, 0)
      } ++
      unchanged.map { case (key, _, len, mtime) =>
        val e = baseByKey(key)
        Entry(key, len, e.md5, mtime, e.layer + 1)
      }
    writeManifest(spark, dstDir,
      Manifest(stateDirs, base.map(_._1), entries.sortBy(_.key)))
    BackupReport(stateDirs.size, entries.size.toLong,
      entries.map(_.len).sum,
      changed.size.toLong, changed.map(_._3).sum)
  }

  /** Re-check a backup against its manifest: every named file present
    * at its recorded length, chain pointers resolving through the base
    * manifests, and no extra files (a manifest must describe its
    * backup dir's tree exactly). `deep = true` additionally re-reads
    * every named byte against the recorded MD5s (a distributed job —
    * the full bit-rot audit; the default stays a pure listing). */
  def verify(spark: SparkSession, backupDir: String,
      deep: Boolean = false): Boolean =
    try {
      val man = readManifest(spark, backupDir)
      val chain = resolveChain(spark, backupDir, man)
      // this backup dir's tree must be EXACTLY its layer-0 entries
      // (extra files are a failure — a manifest describes its own
      // numbered dirs completely)
      val named0 = man.entries.filter(_.layer == 0)
        .map(e => e.key -> e.len).toMap
      val actual0 = man.srcDirs.indices.flatMap(i =>
        listFiles(spark, s"$backupDir/$i").map { case (rel, len, _) =>
          (s"$i/$rel", len) }).toMap
      // chain pointers: each pointed-to ancestor file present at its
      // recorded length (ancestors may hold MORE — other increments
      // need not chain through this one)
      val chainOk = man.entries.filter(_.layer > 0).forall { e =>
        val p = new Path(s"${chain(e.layer)._1}/${e.key}")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.exists(p) && fs.getFileStatus(p).getLen == e.len
      }
      if (named0 != actual0 || !chainOk) false
      else if (!deep) true
      else {
        // v1 entries carry no recorded md5 ("") — nothing to deep-check
        // beyond the shallow listing above
        val checks = man.entries.filter(_.md5.nonEmpty)
          .map(e => (s"${chain(e.layer)._1}/${e.key}", e.md5)).toMap
        val got = distributedHash(spark, checks.keys.toSeq)
        checks.forall { case (p, md5) => got.get(p).contains(md5) }
      }
    } catch { case _: Exception => false } // unreadable manifest/chain = not a verified backup

  /** Restore a backup (full or incremental — pointers resolve through
    * the chain) over its ORIGINAL source paths (or `over` — positional
    * replacements, e.g. a staging clone). Verifies the backup first;
    * refuses a non-empty live target unless `force` (restore-over-live
    * is an explicit decision). The copy lands in `<target>.restoring`
    * staging dirs, every byte is RE-HASHED against the manifest as it
    * streams (same-length corruption refused before any target is
    * touched), and only then each target swaps via rename — a refused
    * or crashed restore leaves the live targets as they were. */
  def restore(spark: SparkSession, backupDir: String,
      over: Seq[String] = Nil, force: Boolean = false): BackupReport = {
    require(verify(spark, backupDir),
      s"$backupDir fails its manifest check — refusing to restore from " +
        "a truncated or tampered backup")
    val man = readManifest(spark, backupDir)
    val chain = resolveChain(spark, backupDir, man)
    val targets = if (over.nonEmpty) over else man.srcDirs
    require(targets.size == man.srcDirs.size,
      s"backup carries ${man.srcDirs.size} dirs, ${targets.size} targets given")
    val conf = spark.sparkContext.hadoopConfiguration
    val staging = targets.map(t => s"$t.restoring")
    targets.zip(staging).foreach { case (t, st) =>
      val p = new Path(t)
      val fs = p.getFileSystem(conf)
      require(force || !fs.exists(p) || fs.listStatus(p).isEmpty,
        s"restore target $t is not empty — pass force = true to replace it")
      fs.delete(new Path(st), true) // stale staging from a crashed restore
    }
    // stage: copy every named file (resolved through the chain) into
    // the staging dirs, hashing as the bytes stream
    val plan = man.entries.map { e =>
      val i = e.key.takeWhile(_ != '/').toInt
      val rel = e.key.drop(e.key.indexOf('/') + 1)
      (s"${chain(e.layer)._1}/${e.key}", s"${staging(i)}/$rel", e)
    }
    val hashes = distributedCopy(spark,
      plan.map { case (src, dst, _) => (src, dst) })
    try {
      plan.filter(_._3.md5.nonEmpty).foreach { case (_, dst, e) =>
        val got = hashes.getOrElse(dst, "")
        require(got == e.md5,
          s"restore of ${e.key} hashed $got, manifest says ${e.md5} — " +
            "bit corruption in the backup; nothing was swapped, targets intact")
      }
      // staged trees must re-list to the manifest exactly before any swap
      val restored = staging.zipWithIndex.flatMap { case (st, i) =>
        listFiles(spark, st).map { case (rel, len, _) => (s"$i/$rel", len) }
      }.toMap
      require(restored == man.entries.map(e => e.key -> e.len).toMap,
        "staged restore tree does not match the manifest — restore aborted " +
          "before touching any target")
    } catch { case e: Throwable =>
      // a refused restore must not leave staging behind (it would trip
      // the next backup's in-flight refusal on the parent dir)
      staging.foreach(st =>
        new Path(st).getFileSystem(conf).delete(new Path(st), true))
      throw e
    }
    // swap: aside-rename per target. Crash between the aside and the
    // swap leaves BOTH the complete verified staging dir and the aside
    // copy — re-running the restore recovers (stale staging deleted,
    // re-staged); nothing is ever half-deleted.
    targets.zip(staging).foreach { case (t, st) =>
      val tp = new Path(t); val sp = new Path(st)
      val fs = tp.getFileSystem(conf)
      val aside = new Path(t + ".replaced")
      fs.delete(aside, true)
      if (fs.exists(tp)) require(fs.rename(tp, aside), s"stage out $t")
      fs.mkdirs(tp.getParent)
      require(fs.rename(sp, tp), s"swap restored tree into $t")
      fs.delete(aside, true)
    }
    BackupReport(targets.size, man.entries.size.toLong,
      man.entries.map(_.len).sum,
      man.entries.size.toLong, man.entries.map(_.len).sum)
  }

  // ------------------------------------------------------------------
  // Backup SCHEDULING + RETENTION (r15): the nightly-ops loop over the
  // differential device — "incremental every batch, a fresh full every
  // maxChain, prune to the newest K restorable points".
  // ------------------------------------------------------------------

  /** The backups under `rootDir` (subdirs carrying a `_backup_manifest`),
    * name-sorted — [[backupAuto]]'s chain order, so callers must pass
    * monotonically-sorting names (zero-padded batch ids; enforced
    * there). */
  def listBackups(spark: SparkSession, rootDir: String): Seq[String] = {
    val root = new Path(rootDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    // fully-QUALIFIED paths: these strings become chain base pointers in
    // later incrementals' manifests, and a scheme-less path would
    // resolve against the DEFAULT filesystem — an s3a:// backup root
    // would chain (and verify, and prune) against the wrong store
    fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => fs.exists(new Path(p, "_backup_manifest")))
      .map(p => fs.makeQualified(p).toString).sorted.toSeq
  }

  /** Chain length of a backup: 1 for a full, base's depth + 1 for an
    * incremental (restore touches this many manifests). */
  def chainDepth(spark: SparkSession, backupDir: String): Int = {
    val man = readManifest(spark, backupDir)
    1 + man.base.map(chainDepth(spark, _)).getOrElse(0)
  }

  /** One scheduled backup under `rootDir/b<id>` (zero-padded, so the
    * listing sorts in batch order): INCREMENTAL chained to the newest
    * existing backup, except a FULL when none exists or the chain would
    * exceed `maxChain` (restore cost and tamper blast-radius both grow
    * with the chain, so a periodic full re-anchors it). The name must
    * sort after every existing backup — a replayed/duplicate id is
    * refused rather than silently re-chained. Returns the new dir. */
  def backupAuto(spark: SparkSession, stateDirs: Seq[String],
      rootDir: String, id: Long, maxChain: Int = 7,
      force: Boolean = false): (String, BackupReport) = {
    require(id >= 0 && maxChain >= 1)
    val name = f"b$id%012d"
    val dst = { // qualified, like the listing — chains must never mix schemes
      val p = new Path(s"$rootDir/$name")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toString
    }
    val existing = listBackups(spark, rootDir)
    require(existing.forall(_.split('/').last < name),
      s"backup id $id does not sort after ${existing.lastOption.getOrElse("")} " +
        "— scheduled backups must use monotonically increasing ids")
    val report = existing.lastOption match {
      case Some(base) if chainDepth(spark, base) < maxChain =>
        backupIncremental(spark, stateDirs, dst, base, force)
      case _ => backup(spark, stateDirs, dst, force)
    }
    (dst, report)
  }

  /** Chain-aware retention: delete backups under `rootDir` beyond the
    * newest `keep`, EXCEPT any backup a surviving manifest still
    * depends on (directly or transitively) — a base is never deleted
    * out from under its increments, so every kept backup stays fully
    * restorable. Returns the deleted dirs. */
  def pruneBackups(spark: SparkSession, rootDir: String,
      keep: Int): Seq[String] = {
    require(keep >= 1, "keep >= 1")
    val all = listBackups(spark, rootDir)
    if (all.size <= keep) return Nil
    // qualify before comparing: manifests record the caller's base
    // strings verbatim (qualified by backupAuto, possibly raw from
    // hand-built chains) — a raw-vs-qualified string mismatch here
    // would delete a live base out from under its increments
    def norm(d: String): String = {
      val p = new Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(p).toString
    }
    val keepSet = scala.collection.mutable.Set[String]()
    def addWithBases(dir: String): Unit = if (keepSet.add(norm(dir)))
      readManifest(spark, dir).base.foreach(addWithBases)
    all.takeRight(keep).foreach(addWithBases)
    val doomed = all.filterNot(d => keepSet(norm(d)))
    val fs = new Path(rootDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    doomed.foreach(d => fs.delete(new Path(d), true))
    doomed
  }

  /** Rebase a backup into a SYNTHETIC FULL at `dstDir` without touching
    * live state: every file the chain names is resolved to the layer
    * holding its bytes and copied, and the new manifest (all layer 0,
    * no base pointer) reuses the recorded source mtimes — so later
    * incrementals chain onto the consolidated full exactly as they
    * would have onto the original chain. The copy re-hashes every byte
    * and REFUSES on any checksum mismatch (consolidation doubles as a
    * full integrity audit), leaving a partial `dstDir` the caller
    * deletes — never a manifest, so a crashed consolidation is not a
    * backup. Use before retiring an old full that only survives as a
    * base: consolidate the newest chain, then [[pruneBackups]]. */
  def consolidate(spark: SparkSession, backupDir: String,
      dstDir: String): BackupReport = {
    require(verify(spark, backupDir),
      s"$backupDir fails its manifest check — refusing to consolidate " +
        "a truncated or tampered chain")
    val man = readManifest(spark, backupDir)
    val chain = resolveChain(spark, backupDir, man)
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new Path(dstDir)
    val dfs = dst.getFileSystem(conf)
    require(!dfs.exists(dst) || dfs.listStatus(dst).isEmpty,
      s"consolidation destination $dstDir is not empty")
    val hashes = distributedCopy(spark, man.entries.map(e =>
      (s"${chain(e.layer)._1}/${e.key}", s"$dstDir/${e.key}")))
    man.entries.foreach { e =>
      require(hashes.get(s"$dstDir/${e.key}").contains(e.md5),
        s"consolidating ${e.key} hashed ${hashes.getOrElse(s"$dstDir/${e.key}", "?")}, " +
          s"manifest says ${e.md5} — bit corruption in the chain; no manifest " +
          "was written, delete the partial destination")
    }
    writeManifest(spark, dstDir,
      Manifest(man.srcDirs, None, man.entries.map(_.copy(layer = 0))))
    BackupReport(man.srcDirs.size, man.entries.size.toLong,
      man.entries.map(_.len).sum,
      man.entries.size.toLong, man.entries.map(_.len).sum)
  }

  /** The in-flight protocol artifacts under a state dir: staged deltas
    * awaiting bucket applies, `.tmp`/`.old` swap leftovers, and
    * `.restoring` staging from a crashed [[restore]]. Spark
    * CheckpointFileManager orphans (`.<name>.<uuid>.tmp` — left by a
    * crashed rename-based checkpoint commit, ignored by the resuming
    * stream) are NOT in-flight: a genuinely idle checkpoint dir may
    * carry them forever, and refusing it would make the documented
    * (state, floors, offsets) triple unbackupable without force. */
  def inFlightArtifacts(spark: SparkSession, dir: String): Seq[String] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    // a crashed restore OF THIS DIR leaves `<dir>.restoring`/`<dir>
    // .replaced` SIBLINGS — possibly with the dir itself missing (the
    // window between the aside-rename and the swap). Checking only
    // inside the tree would let a scheduled backup record the missing
    // dir as an EMPTY tree and retention later prune the good backups.
    Seq(".restoring", ".replaced").foreach { sfx =>
      val sib = new Path(dir + sfx)
      if (fs.exists(sib)) out += sib.toString
    }
    if (!fs.exists(base)) return out.toSeq
    def walk(p: Path): Unit = fs.listStatus(p).foreach { s =>
      val n = s.getPath.getName
      val flagged =
        (n.startsWith("_delta_") || n.endsWith(".tmp") ||
          n.endsWith(".old") || n.endsWith(".restoring") ||
          n.endsWith(".replaced")) &&
          !isCheckpointManagerTemp(n)
      if (flagged) out += s.getPath.toString
      else if (s.isDirectory) walk(s.getPath)
    }
    walk(base)
    out.toSeq
  }

  /** Spark CheckpointFileManager temp name: `.<name>.<uuid>.tmp`
    * (RenameBasedFSDataOutputStream's staging convention). */
  private[streaming] def isCheckpointManagerTemp(name: String): Boolean =
    name.matches("""\..*\.[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\.tmp""")

  /** All files under `dir` as (relative path, length, mtime). */
  private def listFiles(spark: SparkSession,
      dir: String): Seq[(String, Long, Long)] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Nil
    val root = fs.getFileStatus(base).getPath.toUri.getPath
    val it = fs.listFiles(base, true)
    val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    while (it.hasNext) {
      val s = it.next()
      out += ((s.getPath.toUri.getPath.stripPrefix(root)
        .stripPrefix("/"), s.getLen, s.getModificationTime))
    }
    out.toSeq.sorted
  }

  /** The backup chain as (dir, manifest) by layer index: element 0 is
    * `backupDir` itself, element k its k-th ancestor. Refuses a chain
    * whose pointers outrun the recorded bases. */
  private def resolveChain(spark: SparkSession, backupDir: String,
      man: Manifest): Vector[(String, Manifest)] = {
    val maxLayer = (0 +: man.entries.map(_.layer)).max
    var chain = Vector((backupDir, man))
    while (chain.size <= maxLayer) {
      val (_, m) = chain.last
      val b = m.base.getOrElse(throw new IllegalArgumentException(
        s"manifest points $maxLayer layers up but the chain ends at " +
          s"${chain.size - 1}"))
      chain = chain :+ ((b, readManifest(spark, b)))
    }
    chain
  }

  /** One Spark job over the (src, dst) file list — each task opens its
    * files through the Hadoop FileSystem API and streams bytes, hashing
    * as it goes, so the copy is executor-parallel, the driver holds
    * only paths, and the integrity checksum costs no extra read. The
    * session's Hadoop settings ship to the tasks as plain key/value
    * pairs (a default `new Configuration()` in the task would drop
    * every `spark.hadoop.*` override — object-store credentials,
    * endpoints, HA namenode configs — exactly the deployments this
    * device targets). Returns dst → md5. */
  private def distributedCopy(spark: SparkSession,
      pairs: Seq[(String, String)]): Map[String, String] = {
    if (pairs.isEmpty) return Map.empty
    val hadoopProps = hadoopPropArray(spark)
    val n = math.max(1, math.min(pairs.size, 32))
    spark.sparkContext.parallelize(pairs, n).mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      hadoopProps.foreach { case (k, v) => conf.set(k, v) }
      it.map { case (src, dst) =>
        val sp = new Path(src); val dp = new Path(dst)
        val sfs = sp.getFileSystem(conf); val dfs = dp.getFileSystem(conf)
        dfs.mkdirs(dp.getParent)
        val md = java.security.MessageDigest.getInstance("MD5")
        val in = sfs.open(sp)
        try {
          val out = dfs.create(dp, true)
          try {
            val buf = new Array[Byte](1 << 20)
            var r = in.read(buf)
            while (r >= 0) {
              if (r > 0) { out.write(buf, 0, r); md.update(buf, 0, r) }
              r = in.read(buf)
            }
          } finally out.close()
        } finally in.close()
        dst -> md.digest().map("%02x".format(_)).mkString
      }
    }.collect().toMap
  }

  /** Distributed MD5 of each path (deep verify): path → md5. */
  private def distributedHash(spark: SparkSession,
      paths: Seq[String]): Map[String, String] = {
    if (paths.isEmpty) return Map.empty
    val hadoopProps = hadoopPropArray(spark)
    val n = math.max(1, math.min(paths.size, 32))
    spark.sparkContext.parallelize(paths, n).mapPartitions { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      hadoopProps.foreach { case (k, v) => conf.set(k, v) }
      it.map { p =>
        val sp = new Path(p)
        val fs = sp.getFileSystem(conf)
        val md = java.security.MessageDigest.getInstance("MD5")
        val in = fs.open(sp)
        try {
          val buf = new Array[Byte](1 << 20)
          var r = in.read(buf)
          while (r >= 0) { if (r > 0) md.update(buf, 0, r); r = in.read(buf) }
        } finally in.close()
        p -> md.digest().map("%02x".format(_)).mkString
      }
    }.collect().toMap
  }

  private def hadoopPropArray(spark: SparkSession): Array[(String, String)] = {
    val it = spark.sparkContext.hadoopConfiguration.iterator()
    val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.toArray
  }

  private def manifestPath(backupDir: String) =
    new Path(s"$backupDir/_backup_manifest")

  /** Manifest format v2: line 1 `graft-backup v2`, line 2 `dirs=<n>`,
    * line 3 `base=<dir or ->`, then `<i>\t<source dir>` per dir, a
    * blank line, then `<i>/<rel>\t<len>\t<md5>\t<src mtime>\t<layer>`
    * per file. Written tmp+rename (atomic: a backup without a manifest
    * is not a backup). */
  private def writeManifest(spark: SparkSession, backupDir: String,
      man: Manifest): Unit = {
    val p = manifestPath(backupDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.toString + ".manifest-tmp")
    val body = Seq("graft-backup v2", s"dirs=${man.srcDirs.size}",
      s"base=${man.base.getOrElse("-")}") ++
      man.srcDirs.zipWithIndex.map { case (d, i) => s"$i\t$d" } ++
      Seq("") ++
      man.entries.map(e => s"${e.key}\t${e.len}\t${e.md5}\t${e.mtime}\t${e.layer}")
    val out = fs.create(tmp, true)
    try out.write(body.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, p), s"commit manifest $p")
  }

  private def readManifest(spark: SparkSession,
      backupDir: String): Manifest = {
    val p = manifestPath(backupDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"$backupDir has no _backup_manifest")
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in).getLines().toVector
      finally in.close()
    // v1 manifests (pre-r15: no header line, entries are `<key>\t<len>`
    // only — no base/md5/mtime/layer) parse READ-ONLY (ADVICE r15: a
    // DR tool must not refuse yesterday's backups after an upgrade):
    // restore/verify work shallow (md5 = "" ⇒ byte-hash checks skip),
    // but chaining an incremental to a v1 base is refused — v1 recorded
    // no mtimes, so the change fingerprint cannot discriminate.
    if (lines.headOption.exists(_.startsWith("dirs="))) {
      val nDirs = lines(0).stripPrefix("dirs=").toInt
      val srcDirs = lines.slice(1, 1 + nDirs).map(_.split("\t", 2)(1))
      val entries = lines.drop(2 + nDirs).filter(_.nonEmpty).map { l =>
        val Array(k, len) = l.split("\t", 2)
        Entry(k, len.toLong, md5 = "", mtime = 0L, layer = 0)
      }
      return Manifest(srcDirs, base = None, entries)
    }
    require(lines.headOption.contains("graft-backup v2"),
      s"$backupDir manifest is not a graft-backup manifest (v1 or v2)")
    val nDirs = lines(1).stripPrefix("dirs=").toInt
    val base = Some(lines(2).stripPrefix("base=")).filter(_ != "-")
    val srcDirs = lines.slice(3, 3 + nDirs).map(_.split("\t", 2)(1))
    val entries = lines.drop(4 + nDirs).filter(_.nonEmpty).map { l =>
      val Array(k, len, md5, mtime, layer) = l.split("\t", 5)
      Entry(k, len.toLong, md5, mtime.toLong, layer.toInt)
    }
    Manifest(srcDirs, base, entries)
  }
}
