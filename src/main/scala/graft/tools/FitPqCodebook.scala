package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-time build-step fitter for the PINNED product-quantization codebook
  * ([[graft.operators.PqCodebook256]]): per subspace `s` of the
  * L2-normalized 64-dim corpus (8 slices of 8 dims), fits KMeans (k=256,
  * seed 42+s, maxIter 10) on the slice and writes the 8×256×8 centroid
  * tensor as the text resource the library loads at class-init
  * (`graft/pq_codebook_8x256.txt`, one `s j v0..v7` line per centroid,
  * `Double.toString` for exact round-trip) — the offline "train the PQ
  * index" step of IVF-PQ. Production-scale k (256 per subspace) is exactly
  * what the round-6 literal-expression encoding could NOT hold (janino's
  * 64 KB method ceiling at k=16 already forced staged projections); as
  * plain DATA the codebook has no expression-size footprint at all.
  *
  * {{{ sbt "runMain graft.tools.FitPqCodebook /root/testdata/sf0.1" }}}
  *
  * With `--residual`, fits on the CELL RESIDUALS `nv − c(bucket(nv))`
  * instead of the raw unit vectors (the IVFADC codebook,
  * [[graft.operators.PqCodebookResidual256]]) — residuals concentrate
  * around the origin per cell, so the same 256 centroids spend their
  * resolution on the within-cell structure the direct codebook wastes on
  * inter-cell variance.
  */
object FitPqCodebook {
  def main(args: Array[String]): Unit = {
    val residual = args.contains("--residual")
    val pos = args.filterNot(_.startsWith("--"))
    val dir = pos.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath = pos.drop(1).headOption.getOrElse(
      if (residual) "src/main/resources/graft/pq_residual_8x256.txt"
      else "src/main/resources/graft/pq_codebook_8x256.txt")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val nv = graft.Tables.embeddings(spark, dir)
      .filter(col("embedding").isNotNull)
      .select(graft.operators.Similarity.asDouble(col("embedding")).as("v"))
      .filter(!exists(col("v"), x => isnan(x)) && graft.functions.l2Norm(col("v")) > 0d)
      .select(transform(col("v"), x => x / graft.functions.l2Norm(col("v"))).as("nv"))
      .persist()
    nv.count()

    // residual mode: subtract the assigned pinned IVF centroid per vector
    val fitInput =
      if (!residual) nv
      else nv
        .withColumn("bucket",
          graft.functions.nearestCell(col("nv"), graft.operators.IvfCodebook.centers))
        .withColumn("cv",
          element_at(typedLit(graft.operators.IvfCodebook.centers), col("bucket") + 1))
        .select(zip_with(col("nv"), col("cv"), (a, b) => a - b).as("nv"))

    val lines = (0 until 8).flatMap { s =>
      val train = fitInput.select(array_to_vector(slice(col("nv"), s * 8 + 1, 8)).as("fv"))
      val model = new KMeans().setK(256).setSeed(42L + s).setMaxIter(10)
        .setFeaturesCol("fv").fit(train)
      model.clusterCenters.zipWithIndex.map { case (c, j) =>
        s"$s $j " + c.toArray.map(_.toString).mkString(" ")
      }
    }
    val p = java.nio.file.Paths.get(outPath)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    println(s"wrote ${lines.size} centroids to $outPath")
    spark.stop()
  }
}
