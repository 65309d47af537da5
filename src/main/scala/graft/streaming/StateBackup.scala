package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Consistent BACKUP / RESTORE of maintained-view state (r14, R181) —
  * the disaster-recovery half of operating the engine: a deployment's
  * state is a set of bucketed tables + markers + floors under the
  * stages' state dirs (plus the catalog dir's completion floors), and
  * "restore from last night" must reproduce a state every read and
  * every resumed fold treats as identical to the original.
  *
  * Consistency contract: a backup is taken BETWEEN batches (the
  * catalog's single-writer idle point — after [[ViewCatalog.runBatch]]
  * returns, before the next). [[backup]] REFUSES a dir that carries
  * in-flight protocol artifacts — staged deltas (`_delta_*`), swap
  * leftovers (`.tmp`/`.old`) — because they mark a crash mid-fold: a
  * copy taken then is restorable (the replay protocol converges from
  * exactly such states) but NOT a clean point-in-time, so taking one
  * must be an explicit `force` decision, not an accident.
  *
  * Integrity: the backup writes a `_backup_manifest` naming every
  * copied file with its length; [[verify]] re-checks the backup against
  * it, and [[restore]] verifies BEFORE touching any target and then
  * re-lists the restored tree against the same manifest. A truncated
  * or partially-deleted backup is refused, never half-restored.
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

  final case class BackupReport(dirs: Int, files: Long, bytes: Long)

  /** Copy `stateDirs` to `dstDir` (one numbered subdir per source,
    * `_backup_manifest` at the root). Refuses in-flight protocol
    * artifacts unless `force`; refuses a non-empty `dstDir`. */
  def backup(spark: SparkSession, stateDirs: Seq[String], dstDir: String,
      force: Boolean = false): BackupReport = {
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
    val entries = stateDirs.zipWithIndex.flatMap { case (d, i) =>
      listFiles(spark, d).map { case (rel, len) => (i, d, rel, len) }
    }
    distributedCopy(spark,
      entries.map { case (i, d, rel, _) => (s"$d/$rel", s"$dstDir/$i/$rel") })
    writeManifest(spark, dstDir, stateDirs, entries)
    BackupReport(stateDirs.size, entries.size.toLong,
      entries.map(_._4).sum)
  }

  /** Re-check a backup against its manifest: every named file present
    * at its recorded length (extra files are also a failure — a
    * manifest must describe the tree exactly). */
  def verify(spark: SparkSession, backupDir: String): Boolean = {
    val (srcDirs, named) = readManifest(spark, backupDir)
    val actual = srcDirs.indices.flatMap(i =>
      listFiles(spark, s"$backupDir/$i").map { case (rel, len) =>
        (s"$i/$rel", len) }).toMap
    named.toMap == actual
  }

  /** Restore a backup over its ORIGINAL source paths (or `over` —
    * positional replacements, e.g. a staging clone). Verifies the
    * backup first; refuses a non-empty live target unless `force`
    * (restore-over-live is an explicit decision); re-verifies the
    * restored tree file-by-file. */
  def restore(spark: SparkSession, backupDir: String,
      over: Seq[String] = Nil, force: Boolean = false): BackupReport = {
    require(verify(spark, backupDir),
      s"$backupDir fails its manifest check — refusing to restore from " +
        "a truncated or tampered backup")
    val (srcDirs, named) = readManifest(spark, backupDir)
    val targets = if (over.nonEmpty) over else srcDirs
    require(targets.size == srcDirs.size,
      s"backup carries ${srcDirs.size} dirs, ${targets.size} targets given")
    val conf = spark.sparkContext.hadoopConfiguration
    targets.foreach { t =>
      val p = new Path(t)
      val fs = p.getFileSystem(conf)
      require(force || !fs.exists(p) || fs.listStatus(p).isEmpty,
        s"restore target $t is not empty — pass force = true to replace it")
      fs.delete(p, true)
    }
    distributedCopy(spark, named.map { case (key, _) =>
      val i = key.takeWhile(_ != '/').toInt
      val rel = key.drop(key.indexOf('/') + 1)
      (s"$backupDir/$key", s"${targets(i)}/$rel")
    })
    // the restored tree must re-list to the manifest exactly
    val restored = targets.zipWithIndex.flatMap { case (t, i) =>
      listFiles(spark, t).map { case (rel, len) => (s"$i/$rel", len) }
    }.toMap
    require(restored == named.toMap,
      "restored tree does not match the manifest — restore is incomplete")
    BackupReport(targets.size, named.size.toLong, named.map(_._2).sum)
  }

  /** The in-flight protocol artifacts under a state dir: staged deltas
    * awaiting bucket applies and `.tmp`/`.old` swap leftovers. */
  def inFlightArtifacts(spark: SparkSession, dir: String): Seq[String] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Nil
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def walk(p: Path): Unit = fs.listStatus(p).foreach { s =>
      val n = s.getPath.getName
      if (n.startsWith("_delta_") || n.endsWith(".tmp") || n.endsWith(".old"))
        out += s.getPath.toString
      else if (s.isDirectory) walk(s.getPath)
    }
    walk(base)
    out.toSeq
  }

  /** All files under `dir` as (relative path, length). */
  private def listFiles(spark: SparkSession,
      dir: String): Seq[(String, Long)] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Nil
    val root = fs.getFileStatus(base).getPath.toUri.getPath
    val it = fs.listFiles(base, true)
    val out = scala.collection.mutable.ArrayBuffer[(String, Long)]()
    while (it.hasNext) {
      val s = it.next()
      out += ((s.getPath.toUri.getPath.stripPrefix(root)
        .stripPrefix("/"), s.getLen))
    }
    out.toSeq.sorted
  }

  /** One Spark job over the (src, dst) file list — each task opens its
    * files through the Hadoop FileSystem API and streams bytes, so the
    * copy is executor-parallel and the driver holds only paths. The
    * session's Hadoop settings ship to the tasks as plain key/value
    * pairs (a default `new Configuration()` in the task would drop
    * every `spark.hadoop.*` override — object-store credentials,
    * endpoints, HA namenode configs — exactly the deployments this
    * device targets). */
  private def distributedCopy(spark: SparkSession,
      pairs: Seq[(String, String)]): Unit = {
    if (pairs.isEmpty) return
    val hadoopProps = {
      val it = spark.sparkContext.hadoopConfiguration.iterator()
      val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
      while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
      buf.toArray
    }
    val n = math.max(1, math.min(pairs.size, 32))
    spark.sparkContext.parallelize(pairs, n).foreachPartition { it =>
      val conf = new org.apache.hadoop.conf.Configuration()
      hadoopProps.foreach { case (k, v) => conf.set(k, v) }
      it.foreach { case (src, dst) =>
        val sp = new Path(src); val dp = new Path(dst)
        val sfs = sp.getFileSystem(conf); val dfs = dp.getFileSystem(conf)
        dfs.mkdirs(dp.getParent)
        val in = sfs.open(sp)
        try {
          val out = dfs.create(dp, true)
          try {
            val buf = new Array[Byte](1 << 20)
            var r = in.read(buf)
            while (r >= 0) { if (r > 0) out.write(buf, 0, r); r = in.read(buf) }
          } finally out.close()
        } finally in.close()
      }
    }
  }

  private def manifestPath(backupDir: String) =
    new Path(s"$backupDir/_backup_manifest")

  /** Manifest format: line 1 `dirs=<n>`, then `<i>\t<source dir>` per
    * dir, a blank line, then `<i>/<relative path>\t<length>` per file.
    * Written tmp+rename (atomic: a backup without a manifest is not a
    * backup). */
  private def writeManifest(spark: SparkSession, backupDir: String,
      srcDirs: Seq[String], entries: Seq[(Int, String, String, Long)]): Unit = {
    val p = manifestPath(backupDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(p.toString + ".manifest-tmp")
    val body = (s"dirs=${srcDirs.size}" +:
      srcDirs.zipWithIndex.map { case (d, i) => s"$i\t$d" }) ++
      Seq("") ++
      entries.map { case (i, _, rel, len) => s"$i/$rel\t$len" }
    val out = fs.create(tmp, true)
    try out.write(body.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, p), s"commit manifest $p")
  }

  private def readManifest(spark: SparkSession,
      backupDir: String): (Seq[String], Seq[(String, Long)]) = {
    val p = manifestPath(backupDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"$backupDir has no _backup_manifest")
    val in = fs.open(p)
    val lines =
      try scala.io.Source.fromInputStream(in).getLines().toVector
      finally in.close()
    val nDirs = lines.head.stripPrefix("dirs=").toInt
    val srcDirs = lines.slice(1, 1 + nDirs).map(_.split("\t", 2)(1))
    val files = lines.drop(2 + nDirs).filter(_.nonEmpty).map { l =>
      val Array(k, len) = l.split("\t", 2); (k, len.toLong)
    }
    (srcDirs, files)
  }
}
