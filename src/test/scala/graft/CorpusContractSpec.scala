package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.col

/** The engine's schema contract with the driver-generated corpus
  * (`TESTDATA.md`), asserted ONCE so a corpus regeneration that changes a
  * physical type fails as a single labeled assertion here instead of
  * dozens of opaque per-query analysis errors (the round-8 failure mode:
  * `events.ts` silently moved from INT64 TIMESTAMP(NANOS) to
  * timestamp[us] and 54 queries died at analysis). Mirrors the reference
  * collector pinning its input schema up front (reference
  * `src/collector.py:16-26` — required keys throw, optional default).
  *
  * Two layers:
  *   1. the LOGICAL schema each [[Tables]] accessor serves to the engine
  *      (what 150+ query sites assume), per table;
  *   2. for `events.ts`, that every SUPPORTED physical form — epoch-nanos
  *      Long (legacy corpus) and µs timestamp (current corpus) —
  *      normalizes to the same epoch-nanos Long with the same values. */
class CorpusContractSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def fields(df: org.apache.spark.sql.DataFrame): Seq[(String, DataType)] =
    df.schema.fields.toSeq.map(f => (f.name, f.dataType))

  test("relational tables serve the assumed logical schemas") {
    assert(fields(Tables.region(spark, sf)) === Seq(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assert(fields(Tables.nation(spark, sf)) === Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assert(fields(Tables.customer(spark, sf)) === Seq(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assert(fields(Tables.supplier(spark, sf)) === Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assert(fields(Tables.part(spark, sf)) === Seq(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    // date columns: any timestamp flavor works (queries compare/extract,
    // never assume the physical flavor) — pin name + family, not flavor
    val ord = fields(Tables.orders(spark, sf))
    assert(ord.map(_._1) === Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    assert(Set[DataType](TimestampType, TimestampNTZType)
      .contains(ord.toMap.apply("o_orderdate")))
    val li = fields(Tables.lineitem(spark, sf))
    assert(li.map(_._1) === Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
      "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"))
    assert(Set[DataType](TimestampType, TimestampNTZType)
      .contains(li.toMap.apply("l_shipdate")))
  }

  test("documents and embeddings serve the assumed logical schemas") {
    assert(fields(Tables.documents(spark, sf)) === Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assert(fields(Tables.embeddings(spark, sf)) === Seq(
      "vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }

  test("events.ts normalizes to the epoch-nanos Long contract") {
    assert(fields(Tables.events(spark, sf)) === Seq(
      "event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType))
    // sanity on the values: epoch nanos of a plausible wall-clock era
    val r = Tables.events(spark, sf)
      .selectExpr("min(ts) as lo", "max(ts) as hi").as[(Long, Long)].head()
    assert(r._1 > 1000000000L * 1000000000L, "ts must be NANOS, not µs/ms/s")
    assert(r._2 < 4102444800L * 1000000000L, "ts beyond year 2100 — unit bug")
  }

  test("sf0.1 serves the same contracts (bench corpus, not just oracle corpus)") {
    val big = "/root/testdata/sf0.1"
    assert(fields(Tables.events(spark, big)) ===
      fields(Tables.events(spark, sf)))
    assert(fields(Tables.documents(spark, big)) ===
      fields(Tables.documents(spark, sf)))
    assert(fields(Tables.embeddings(spark, big)) ===
      fields(Tables.embeddings(spark, sf)))
    assert(fields(Tables.lineitem(spark, big)) ===
      fields(Tables.lineitem(spark, sf)))
    val r = Tables.events(spark, big)
      .selectExpr("min(ts) as lo", "max(ts) as hi").as[(Long, Long)].head()
    assert(r._1 > 1000000000L * 1000000000L, "sf0.1 ts must be NANOS")
    assert(r._2 < 4102444800L * 1000000000L, "sf0.1 ts beyond 2100 — unit bug")
  }

  test("both supported events.ts physical forms normalize identically") {
    // write the SAME instants as (a) µs timestamp and (b) epoch-nanos Long
    // parquet; Tables.events must serve identical Long nanos for both
    val us = Seq(1700000000000000L, 1700000001500000L, 1700000002000001L)
    val dirA = tmpDir("ev-us"); val dirB = tmpDir("ev-long")
    us.toDF("us")
      .selectExpr("us as event_id", "timestamp_micros(us) as ts",
        "us as user_id", "'a' as event_type", "0.0 as value", "'' as props")
      .write.mode("overwrite").parquet(s"$dirA/events.parquet")
    us.toDF("us")
      .selectExpr("us as event_id", "us * 1000 as ts",
        "us as user_id", "'a' as event_type", "0.0 as value", "'' as props")
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")
    val a = Tables.events(spark, dirA).select(col("ts")).as[Long]
      .collect().sorted.toSeq
    val b = Tables.events(spark, dirB).select(col("ts")).as[Long]
      .collect().sorted.toSeq
    assert(a === us.map(_ * 1000L))
    assert(b === us.map(_ * 1000L))
  }
}
