package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-join rehearsal (dev aid): measures AQE's runtime skew-join
  * splitting on a deterministic 90%-hot-key join, with broadcast
  * disabled so the engine MUST sort-merge (the 100 TB fact-fact shape —
  * at real scale the dimension wouldn't broadcast either). Thresholds
  * are lowered so the demo corpus trips the same machinery a 256 MB+
  * partition trips in production; the point recorded is the CONTRAST
  * (skew split on vs off) and the result equality, not absolute times.
  *
  * {{{ sbt "runMain graft.tools.SkewRehearsal 4000000" }}}
  */
object SkewRehearsal {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)

    def run(skewOn: Boolean): (Double, Long) = {
      val spark = SparkSession.builder()
        .master("local[32]")
        .appName(s"skew-$skewOn")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try {
        // 90% of left rows share key 0; the rest spread over 100k keys
        val left = spark.range(n).select(col("id"),
          when(pmod(col("id"), lit(10)) =!= 9, lit(0L))
            .otherwise(pmod(col("id"), lit(100000L))).as("key"),
          (col("id") * 7L).as("payload"))
        val right = spark.range(100000L).select(col("id").as("key"),
          (col("id") % 97L).as("attr"))
        val t0 = System.nanoTime()
        val res = left.join(right, "key")
          .agg(count(lit(1)).as("cnt"), sum(col("payload") % 1000L + col("attr")).as("chk"))
          .collect()(0)
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, res.getLong(0))
      } finally spark.stop()
    }

    val (offSec, offCnt) = run(skewOn = false)
    val (onSec, onCnt) = run(skewOn = true)
    require(offCnt == onCnt, s"results diverged: $offCnt vs $onCnt")
    println(f"SKEW rows $n%d  join+agg skewOff ${offSec}%6.2f s  skewOn ${onSec}%6.2f s  rows $onCnt%d")
  }
}
