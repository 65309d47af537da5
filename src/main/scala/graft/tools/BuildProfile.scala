package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scratch profiler for driver-side DataFrame-construction cost (dev aid):
  * splits x33's BUILD phase into table read, encode tree, and search tree.
  *
  * {{{ sbt "runMain graft.tools.BuildProfile /root/testdata/sf0.1" }}}
  */
object BuildProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    import graft.operators.Similarity
    (1 to 3).foreach { r =>
      val t0 = System.nanoTime()
      graft.operators.PqCodebook256.ensureParquet(spark)
      val t1 = System.nanoTime()
      val emb = graft.Tables.embeddings(spark, dir)
      val t2 = System.nanoTime()
      val enc = Similarity.encodeIvfPq(emb)
      val t3 = System.nanoTime()
      val out = Similarity.searchIvfPqEncoded(enc, col("vec_id") < 10, 5)
      val t4 = System.nanoTime()
      out.queryExecution.executedPlan
      val t5 = System.nanoTime()
      def ms(a: Long, b: Long) = (b - a) / 1e6
      println(f"r$r ensure ${ms(t0, t1)}%7.1f ms  read ${ms(t1, t2)}%7.1f ms  " +
        f"encode ${ms(t2, t3)}%7.1f ms  search ${ms(t3, t4)}%7.1f ms  plan ${ms(t4, t5)}%7.1f ms")
    }
    spark.stop()
  }
}
