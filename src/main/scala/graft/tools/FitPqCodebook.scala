package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-time build-step fitter for the PINNED product-quantization codebook
  * ([[graft.operators.PqCodebook]]): per subspace `s` of the L2-normalized
  * 64-dim corpus (8 slices of 8 dims), fits KMeans (k=16, seed 42+s,
  * maxIter 10) on the slice and prints the 8×16×8 centroid tensor as Scala
  * source — the offline "train the PQ index" step of IVF-PQ; queries only
  * ever replay the frozen literals (the x12 pinned-codebook recipe):
  *
  * {{{ sbt "runMain graft.tools.FitPqCodebook /root/testdata/sf0.1" }}}
  */
object FitPqCodebook {
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
    val nv = graft.Tables.embeddings(spark, dir)
      .filter(col("embedding").isNotNull)
      .select(graft.operators.Similarity.asDouble(col("embedding")).as("v"))
      .filter(!exists(col("v"), x => isnan(x)) && graft.functions.l2Norm(col("v")) > 0d)
      .select(transform(col("v"), x => x / graft.functions.l2Norm(col("v"))).as("nv"))
      .persist()
    nv.count()

    val sub = (0 until 8).map { s =>
      val train = nv.select(array_to_vector(slice(col("nv"), s * 8 + 1, 8)).as("fv"))
      val model = new KMeans().setK(16).setSeed(42L + s).setMaxIter(10)
        .setFeaturesCol("fv").fit(train)
      model.clusterCenters.map(_.toArray.toSeq).toSeq
    }

    println("  val subCenters: Seq[Seq[Seq[Double]]] = Seq(")
    println(sub.map { cs =>
      "    Seq(\n" + cs.map(c =>
        c.map(_.toString).mkString("      Seq(", ", ", ")")).mkString(",\n") + "\n    )"
    }.mkString(",\n"))
    println("  )")
    spark.stop()
  }
}
