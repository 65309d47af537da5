package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (round 13, deleted after use). */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("sqlprobe").toString
    // place rows by the REAL writer hash: pmod(xxhash64(g), 2)
    val rows = Seq(("g1", 5L), ("g2", 7L), ("g3", 9L)).toDF("g", "v")
      .withColumn("b", pmod(xxhash64(col("g")), lit(2L)))
    rows.show()
    Seq(0L, 1L).foreach { b =>
      rows.filter(col("b") === b).drop("b").write.parquet(s"$d/bucket=$b")
    }
    val t = spark.read.option("basePath", d).parquet(d)
    t.createOrReplaceTempView("probe_t")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION probe_for(grp STRING)
      RETURNS TABLE (g STRING, v BIGINT)
      RETURN SELECT g, v FROM probe_t WHERE bucket = pmod(xxhash64(grp), 2) AND g = grp""")
    val q = spark.sql("SELECT * FROM probe_for('g3')")
    q.show()
    println(q.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PartitionFilters") || l.contains("files read") || l.contains("Location")).mkString("\n"))
    // count files actually read
    val scan = q.queryExecution.executedPlan.collectLeaves()
    println("=== formatted ===")
    println(q.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
