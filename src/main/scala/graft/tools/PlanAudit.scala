package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the physical plans of the scale-sensitive similarity queries
  * (dev aid, not part of the driver contract): verifies the top-k
  * aggregate plans as ObjectHashAggregate with a partial stage, the
  * near-dup self-join reuses one persisted fan-out point, and no
  * WholeStageCodegen span is broken by the native expressions. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val which = args.drop(1).headOption.getOrElse("x9,x6,x7")

    val qs = graft.SparkEntry.queries.filter { case (n, _) =>
      which.split(",").exists(n.startsWith)
    }
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      println(s"\n===== $name =====")
      val df = fn(spark, dir)
      df.explain("formatted")
      df.count()
      graft.operators.Caching.releaseAll()
    }
    spark.stop()
  }
}
