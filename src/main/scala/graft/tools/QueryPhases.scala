package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query phase timer (dev aid): splits a harness query's wall time
  * into BUILD (DataFrame construction — any eager driver work), PLAN
  * (analysis through physical planning), and EXECUTE (first run of the
  * exact plan). Adjudicates literal-heavy queries like x33, whose
  * thousands of embedded codebook doubles inflate the driver-side
  * phases, not execution.
  *
  * {{{ sbt "runMain graft.tools.QueryPhases /root/testdata/sf0.1 x33" }}}
  */
object QueryPhases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).headOption.getOrElse("x33")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb session/codegen startup so phase numbers aren't JVM warmup
    spark.range(1000).selectExpr("sum(id)").collect()

    graft.SparkEntry.queries
      .filter { case (n, _) => which.split(",").exists(n.startsWith) }
      .toSeq.sortBy(_._1).foreach { case (name, fn) =>
        (1 to 2).foreach { round => // round 2 shows post-codegen-cache cost
          val t0 = System.nanoTime()
          val df = fn(spark, dir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan // force analysis + planning
          val t2 = System.nanoTime()
          df.queryExecution.toRdd.foreachPartition(_ => ())
          val t3 = System.nanoTime()
          println(f"PHASES $name%-20s r$round  build ${(t1 - t0) / 1e9}%6.2f s  " +
            f"plan ${(t2 - t1) / 1e9}%6.2f s  exec ${(t3 - t2) / 1e9}%6.2f s")
          graft.operators.Caching.releaseAll()
        }
      }
    spark.stop()
  }
}
