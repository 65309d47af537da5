package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes each named query's `.explain("formatted")` to
  * `<outDir>/<query>_<tag>.txt` AFTER executing it (so AQE's final plan is
  * what lands in the file), plus one audit line per query from
  * [[PlanSweep.audit]] — the optimization round's plan-evidence artifact
  * (the `plans/r16` before/after txt files).
  *
  * {{{ sbt "runMain graft.tools.PlanDump /root/testdata/sf0.1 plans/r16 before x52_token_pagerank,x87_lttb" }}}
  *
  * Uses the bench session shape (local[$SPARK_GRAFT_CPUS], shuffle
  * partitions = cpus) so the captured plans are the ones the driver's bench
  * actually runs. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val names = args(3).split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Files.createDirectories(Paths.get(outDir))
    graft.SparkEntry.queries.filter(q => names(q._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"plandump: $name")
        val df = fn(spark, dir)
        df.queryExecution.toRdd.foreachPartition(_ => ())
        val explain = df.queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        val a = PlanSweep.audit(df.queryExecution.executedPlan, explain)
        Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
          explain.getBytes(StandardCharsets.UTF_8))
        println(s"plandump $name exchanges=${a.exchanges} cartesian=${a.cartesians} " +
          s"bnlj=${a.bnlj} wscg=${a.wscg} fallbacks=${a.fallbacks.mkString("/")}")
        graft.operators.Caching.releaseAll()
      }
    spark.stop()
  }
}
