package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A pinned product-quantization codebook loaded from a text resource —
  * 8 subspaces × 256 centroids × 8 dims, the build-time artifact of 8
  * per-subspace KMeans fits (k=256, seed 42+s, maxIter 10), regenerable
  * with `graft.tools.FitPqCodebook`.
  *
  * Unlike the retired 8×16 literal codebook (whose centroids lived as
  * LITERAL expression trees and therefore hit janino's 64 KB method
  * ceiling already at k=16, plus ~0.76s of driver expression
  * construction per query), these codebooks are plain DATA: a text
  * resource loaded once at class-init, shipped to executors as a plan
  * reference object inside the codegen'd
  * [[graft.expressions.PqEncodeExpr]]/[[graft.expressions.PqLutExpr]]
  * kernels (the broadcast-variable pattern — the 128 KB matrix rides the
  * serialized plan, generated code loops over it). Expression size is
  * CONSTANT in k, so standard PQ geometries (8-16 subspaces × 256
  * centroids) and beyond fit with no codegen or driver-cost ceiling.
  *
  * Values round-trip exactly: `Double.toString` → `parseDouble` is
  * lossless, and [[ensureParquet]] re-emits the identical doubles for
  * the DuckDB oracle to read — both engines see bit-identical
  * centroids. */
abstract class PqCodebookResource(resource: String, parquetName: String) {

  /** subCenters(s)(j) = 8-dim centroid j of subspace s. */
  val subCenters: Seq[Seq[Seq[Double]]] = {
    val in = getClass.getResourceAsStream(resource)
    require(in != null, s"$resource resource missing")
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
                finally in.close()
    val parsed = lines.filter(_.nonEmpty).map { l =>
      val t = l.split(" ")
      (t(0).toInt, t(1).toInt, t.drop(2).map(java.lang.Double.parseDouble).toSeq)
    }
    val m = parsed.map(_._1).max + 1
    (0 until m).map { s =>
      parsed.filter(_._1 == s).sortBy(_._2).map(_._3)
    }
  }

  /** Write the codebook as a parquet table (s, j, c) for the DuckDB
    * oracle side, returning the absolute path embedded in the oracle
    * SQL. Idempotent; the parquet doubles are the same IEEE values the
    * expressions compute with. */
  def ensureParquet(spark: SparkSession): String = {
    val path = parquetPath
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      df(spark).coalesce(1).write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Resolved at runtime against the working directory (sbt runs in the
    * repo root), so the oracle SQL points wherever this checkout lives. */
  lazy val parquetPath: String =
    new java.io.File(s"target/$parquetName").getAbsolutePath

  /** The oracle-side codebook relation `cteName` (Spark writes a
    * directory of part files, hence the glob). */
  def oracleCte(cteName: String): String =
    s"$cteName AS (SELECT s, j, c FROM read_parquet('$parquetPath/*.parquet'))"

  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (for { (cs, s) <- subCenters.zipWithIndex; (c, j) <- cs.zipWithIndex }
      yield (s, j, c)).toDF("s", "j", "c")
  }
}

/** The DIRECT codebook: centroids fit on raw unit-vector slices —
  * encodes `nv` itself ([[Similarity.ivfPqTopK]], x33). */
object PqCodebook256
    extends PqCodebookResource("/graft/pq_codebook_8x256.txt", "pq_codebook_8x256.parquet") {
  def oracleCte: String = oracleCte("cb")
}

/** The RESIDUAL codebook (IVFADC): centroids fit on `nv − c(bucket)`
  * cell residuals, which concentrate around the origin per cell — the
  * same 256 centroids resolve within-cell structure instead of
  * inter-cell variance ([[Similarity.ivfAdcTopK]], x48). */
object PqCodebookResidual256
    extends PqCodebookResource("/graft/pq_residual_8x256.txt", "pq_residual_8x256.parquet")
