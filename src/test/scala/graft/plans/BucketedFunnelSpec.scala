package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Funnel

/** Evidence for the behavioral-aggregates 100 TB claim (ARCHITECTURE §4):
  * the funnel operators express their joins/aggregations on the bare user
  * key, so a user-bucketed storage layout removes the per-stage shuffles
  * WITHOUT any operator change — the layout is a storage decision. */
class BucketedFunnelSpec extends SparkTestBase {

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.queryExecution.toRdd.count() // execute the EXACT plan (post-AQE)
    graft.tools.PlanSweep.allNodes(df.queryExecution.executedPlan)
      .count(_.getClass.getSimpleName == "ShuffleExchangeExec")
  }

  test("windowFunnel over a user-bucketed table plans with fewer shuffles") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
        .withColumn("t_us", expr("ts DIV 1000"))
        .select("user_id", "event_type", "t_us")
      ev.write.bucketBy(4, "user_id").sortBy("user_id")
        .mode("overwrite").saveAsTable("events_user_b")

      def funnel(df: org.apache.spark.sql.DataFrame) =
        Funnel.windowFunnel(df, "user_id", "t_us", "event_type",
          Seq("signup", "click", "purchase"), windowUs = 86400000000L)

      val plain = exchanges(funnel(ev))
      val bucketed = exchanges(funnel(spark.table("events_user_b")))
      // same rows either way
      assert(funnel(spark.table("events_user_b")).orderBy("user")
        .collect().toSeq === funnel(ev).orderBy("user").collect().toSeq)
      // every per-stage join/agg shuffle disappears; only the final
      // level-union aggregation still exchanges (union output carries no
      // recognized partitioning)
      info(s"shuffle exchanges: plain=$plain bucketed=$bucketed")
      assert(bucketed < plain,
        s"bucketed funnel should shuffle less: $bucketed vs $plain")
      assert(bucketed <= 2, s"expected ≤2 residual exchanges, got $bucketed")
    } finally {
      spark.sql("DROP TABLE IF EXISTS events_user_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10485760L)
    }
  }
}
