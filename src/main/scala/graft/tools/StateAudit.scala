package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.MvPipeline

/** Operational audit of a maintained-state directory — the check an
  * operator runs after a crash, a migration, or on a cadence: verifies
  * the STRUCTURAL health of every bucketed state (wellformed bucket
  * dirs, markers present, no swap leftovers, staged deltas only where a
  * replay can consume them) and the SEMANTIC invariants each view family
  * proves in its specs, re-checked against the live bytes:
  *
  *   - near-dup label lattices: `label ≤ doc_id` (labels only descend
  *     from the self-seed) and root closure (every label names a doc
  *     whose own label is itself — state clusterings are star-shaped);
  *   - Z-set views: integral(changelog) == materialized aggregate (the
  *     R143/R145/R146 invariant — survives compaction by construction,
  *     so ANY deviation is corruption, not history);
  *   - dup-spans: hash summaries saturate correctly (`nd ∈ {1, 2}`,
  *     `d1` present exactly while unique) and every served stat has its
  *     meta row.
  *
  * Returns violations as strings (empty = clean); the `main` prints
  * them and exits nonzero. Pure reads — the audit never repairs (the
  * protocols self-repair on their next fold; an audit that mutated
  * state would race the single writer it is auditing). */
object StateAudit {

  def audit(spark: SparkSession, stateDir: String): Seq[String] = {
    val base = new Path(stateDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Seq(s"state dir does not exist: $stateDir")
    val out = scala.collection.mutable.ArrayBuffer[String]()

    // ---- structural sweep over every directory underneath
    def walk(p: Path): Unit = {
      val name = p.getName
      if (name.endsWith(".tmp")) out += s"uncommitted swap leftover: $p"
      if (name.endsWith(".old")) out += s"stale rename-aside copy: $p"
      if (fs.getFileStatus(p).isDirectory && !name.endsWith(".tmp") && !name.endsWith(".old"))
        fs.listStatus(p).filter(_.isDirectory).foreach(s => walk(s.getPath))
    }
    walk(base)

    // bucketed tables at ANY depth: every bucket=N dir carries a marker
    def checkBuckets(dir: Path): Unit = {
      val subs = fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      subs.filter(_.getName.matches("bucket=\\d+")).foreach { b =>
        if (!fs.exists(new Path(b, "_graft_batch")))
          out += s"bucket without a batch marker: $b"
      }
      subs.filterNot(_.getName.matches("bucket=\\d+")).foreach(checkBuckets)
    }
    checkBuckets(base)

    // ---- semantic invariants, keyed by the family's directory name
    def has(name: String): Boolean = fs.exists(new Path(base, name))

    def labelLattice(view: String, idCol: String): Unit = {
      val l = MvPipeline.readBucketedState(spark, s"$stateDir/$view")
        .filter(col("kind") === "l").select(col(idCol).as("id"), col("label"))
        .transform(graft.operators.Caching.persisted)
      val above = l.filter(col("label") > col("id")).count()
      if (above > 0) out += s"$view: $above labels ABOVE their doc id (lattice broken)"
      val roots = l.select(col("label").as("id")).distinct()
      val dangling = roots.join(
        l.filter(col("id") === col("label")).select("id"), Seq("id"), "left_anti").count()
      if (dangling > 0) out += s"$view: $dangling labels naming a non-root doc (stars broken)"
    }
    Seq("neardup" -> "doc_id", "embneardup" -> "vec_id",
      "imgneardup" -> "doc_id", "audneardup" -> "doc_id",
      "txtneardup" -> "doc_id").foreach { case (v, idc) =>
      if (has(v)) labelLattice(v, idc) }

    def zsetIntegral(view: String): Unit = {
      val a = MvPipeline.readBucketedState(spark, s"$stateDir/$view/a")
        .transform(graft.operators.Caching.persisted)
      val mat = a.filter(col("kind") === "a")
        .select(col("g"), col("m"), col("c"))
      val integ = a.filter(col("kind") === "c")
        .groupBy("g").agg(sum(col("m")).as("m"), sum(col("c")).as("c"))
        .filter(col("m") =!= 0 || col("c") =!= 0)
      val diff = mat.exceptAll(integ).count() + integ.exceptAll(mat).count()
      if (diff > 0) out += s"$view: integral(changelog) != materialized aggregate ($diff rows differ)"
    }
    Seq("joinagg", "joinaggchain", "joinaggn", "joinaggstar")
      .foreach(v => if (has(v)) zsetIntegral(v))

    Seq("strictfunnel", "strictorderfunnel").foreach { v =>
      if (has(v)) {
        val st = MvPipeline.readBucketedState(spark, s"$stateDir/$v")
          .transform(graft.operators.Caching.persisted)
        val served = st.filter(col("kind") === "v").select("user", "k")
        val integ = st.filter(col("kind") === "d")
          .groupBy("user", "k").agg(sum(col("w")).as("w"))
          .filter(col("w") =!= 0).select("user", "k")
        val diff = served.exceptAll(integ).count() + integ.exceptAll(served).count()
        if (diff > 0) out += s"$v: integral(changelog) != served levels ($diff rows differ)"
      }
    }

    if (has("dupspans")) {
      val h = MvPipeline.readBucketedState(spark, s"$stateDir/dupspans/hidx")
        .transform(graft.operators.Caching.persisted)
      val badNd = h.filter(col("nd") < 1 || col("nd") > 2).count()
      if (badNd > 0) out += s"dupspans: $badNd hash rows with nd outside {1, 2}"
      val badD1 = h.filter(col("nd") === 1 && col("d1").isNull).count()
      if (badD1 > 0) out += s"dupspans: $badD1 unique hashes missing their holder d1"
      val s = MvPipeline.readBucketedState(spark, s"$stateDir/dupspans/s")
        .transform(graft.operators.Caching.persisted)
      val orphans = s.filter(col("kind") === "s").select("doc_id")
        .join(s.filter(col("kind") === "m").select("doc_id"), Seq("doc_id"), "left_anti")
        .count()
      if (orphans > 0) out += s"dupspans: $orphans served stats without a meta row"
    }

    graft.operators.Caching.releaseAll()
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      sys.error("usage: StateAudit <stateDir>"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val violations = audit(spark, dir)
    if (violations.isEmpty) println(s"[audit] $dir: clean")
    else {
      violations.foreach(v => println(s"[audit] VIOLATION: $v"))
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
