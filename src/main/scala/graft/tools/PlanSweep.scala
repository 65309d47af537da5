package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback

/** Plan-evidence sweep over harness queries (VERDICT r5 task 3): executes
  * each query at the given SF and reports, from the FINAL (post-AQE)
  * physical plan: shuffle-exchange count, cartesian / nested-loop-join
  * nodes, CodegenFallback expression classes, and WholeStageCodegen span
  * count. Output is a markdown table row per query, pasted into
  * ARCHITECTURE §3 as recorded evidence (replacing docstring claims).
  *
  * {{{ sbt "runMain graft.tools.PlanSweep /root/testdata/sf0.001 x25,x26" }}}
  */
object PlanSweep {

  /** All nodes of the FINAL adaptive plan — descends into AQE's
    * materialized query stages (whose inner plans are not `children`),
    * reused exchanges, and subqueries; plain `collect` sees none of
    * those and under-reports every post-shuffle operator. */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val expanded: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case _                        => p.children
    }
    p +: (expanded ++ p.subqueries).flatMap(allNodes)
  }

  final case class Audit(exchanges: Int, cartesians: Int, bnlj: Int,
      wscg: Int, fallbacks: Seq[String])

  /** @param explainStr formatted explain of the executed query — WSCG
    *                   spans are counted here because AQE stage plans
    *                   only receive their codegen wrapping at
    *                   materialization, invisible to plan traversal. */
  def audit(plan: SparkPlan, explainStr: String): Audit = {
    val nodes = allNodes(plan)
    def cls(n: SparkPlan) = n.getClass.getSimpleName
    val fallbacks = nodes.flatMap(n => n.expressions.flatMap(_.collect {
      case e: CodegenFallback if e.getClass.getSimpleName != "AttributeReference" =>
        e.getClass.getSimpleName
    })).distinct.sorted
    Audit(
      exchanges = nodes.count(n => cls(n).startsWith("ShuffleExchange")),
      cartesians = nodes.count(n => cls(n) == "CartesianProductExec"),
      bnlj = nodes.count(n => cls(n) == "BroadcastNestedLoopJoinExec"),
      wscg = "\\[codegen id : (\\d+)\\]".r.findAllMatchIn(explainStr)
        .map(_.group(1)).toSeq.distinct.size,
      fallbacks = fallbacks)
  }

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
    val which = args.drop(1).headOption
    val qs = graft.SparkEntry.queries
      .filter { case (n, _) => which.forall(_.split(",").exists(n.startsWith)) }
    println("| query | exchanges | cartesian | bnlj | wscg spans | CodegenFallback exprs |")
    println("|---|---|---|---|---|---|")
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, dir)
      // execute THIS df's plan (df.count() would build and run a different
      // aggregate plan, leaving this one's AQE stages unmaterialized)
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val explain =
        df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) println(explain)
      val a = audit(df.queryExecution.executedPlan, explain)
      val fb = if (a.fallbacks.isEmpty) "—" else a.fallbacks.mkString(", ")
      println(s"| $name | ${a.exchanges} | ${a.cartesians} | ${a.bnlj} | ${a.wscg} | $fb |")
      graft.operators.Caching.releaseAll()
    }
    spark.stop()
  }
}
