package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-time build-step fitter for the PINNED IVF codebook
  * ([[graft.operators.IvfCodebook]]): fits the same L2-normalized KMeans as
  * `Similarity.ivfTopK` (k=16, seed 42, maxIter 10) on the sf0.1 embeddings
  * corpus and prints the 16×64 centroid matrix as Scala source. The pasted
  * output is the "trained index" that `ivfTopKPinned` and the x12 DuckDB
  * oracle both replay as double literals (x7's pinned-planes recipe) — run
  * again only to retrain against a new corpus:
  *
  * {{{ sbt "runMain graft.tools.FitIvfCodebook /root/testdata/sf0.1" }}}
  */
object FitIvfCodebook {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = graft.Tables.embeddings(spark, dir)
      .filter(col("embedding").isNotNull)
      .select(graft.operators.Similarity.asDouble(col("embedding")).as("v"))
      .filter(!exists(col("v"), x => isnan(x)) && graft.functions.l2Norm(col("v")) > 0d)
      .select(array_to_vector(transform(col("v"),
        x => x / graft.functions.l2Norm(col("v")))).as("fv"))
    val model = new KMeans().setK(16).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("fv").fit(e)

    val rows = model.clusterCenters.map { c =>
      c.toArray.map(_.toString).mkString("    Seq(", ", ", ")")
    }
    println("  val centers: Seq[Seq[Double]] = Seq(")
    println(rows.mkString(",\n"))
    println("  )")
    spark.stop()
  }
}
