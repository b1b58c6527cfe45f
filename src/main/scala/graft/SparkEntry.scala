package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator surface (SURVEY.md §2 + the training-data
  * curation ops), one entry per operator, each runnable against any
  * /root/testdata/sf* directory. `oracleSql` carries the DuckDB-equivalent
  * SQL for every query whose semantics are SQL-expressible; hash-defined
  * ops (MinHash/SimHash/LSH) are spec-tested instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q06_join_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.defs ++
      graft.queries.MarketAnalytics.defs ++
      graft.queries.Curation.defs

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.MarketAnalytics.oracles ++
      graft.queries.Curation.oracles
}
