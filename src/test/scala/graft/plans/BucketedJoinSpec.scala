package graft.plans

import graft.SparkTestBase

/** Evidence for the 100 TB co-located-join claim (ARCHITECTURE.md §4):
  * bucketing both fact tables on the join key removes the per-query shuffle
  * entirely — the join plans with zero ShuffleExchange nodes. */
class BucketedJoinSpec extends SparkTestBase {

  test("join of tables bucketed on the key plans without exchanges") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      val l = graft.Tables.lineitem(spark, "/root/testdata/sf0.001")
      o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      l.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          spark.table("lineitem_b")("l_orderkey") === spark.table("orders_b")("o_orderkey"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10485760L)
    }
  }
}
