package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtQueries, IngestQueries, MvQueries, RelQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory of SURVEY.md §2 (the 8 MV semantics
  * recast over the test corpus, the relational read-side surface, and the
  * §2.11 LLM-pipeline extensions); `oracleSql` holds the DuckDB-equivalent
  * SQL for every deterministic-in-SQL entry. Entries without an oracle
  * (seeded-hash LSH, HLL, stubbed multimodal decode) get the driver's
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelQueries.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MvQueries.all ++ RelQueries.all ++ ExtQueries.all ++ IngestQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    MvQueries.oracles ++ RelQueries.oracles ++ ExtQueries.oracles ++ IngestQueries.oracles
}
