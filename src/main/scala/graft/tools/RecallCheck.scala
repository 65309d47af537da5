package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val embr = graft.Tables.embeddings(spark, s"/root/testdata/$sf")
      val e = embr.select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
      val q = e.filter(col("vec_id") < 10).select(col("vec_id").as("qid"), col("v").as("qv"))
      val exact = Similarity.bruteTopK(q, e, k = 5).as[(Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2)).toSet
      graft.operators.Caching.releaseAll()
      def recall(df: org.apache.spark.sql.DataFrame): Double = {
        val got = df.as[(Long, Long, Long, Double)].collect().map(r => (r._1, r._2)).toSet
        graft.operators.Caching.releaseAll()
        (exact & got).size.toDouble / exact.size
      }
      val pq = recall(Similarity.ivfPqTopK(embr, col("vec_id") < 10, k = 5))
      val adc = recall(Similarity.ivfAdcTopK(embr, col("vec_id") < 10, k = 5))
      val ivf = recall(Similarity.ivfTopKPinned(embr, col("vec_id") < 10, k = 5))
      println(s"RECALL $sf ivf=$ivf pq=$pq adc=$adc")
    }
    spark.stop()
  }
}
