package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query catalogs live in `graft.queries.*`; this object only
  * aggregates them.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q5_region_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data pipeline extensions (dedup / similarity / text /
    * events).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.TextDedup.queries ++
      graft.queries.Vectors.queries ++
      graft.queries.Events.queries ++
      graft.queries.Nested.queries ++
      graft.queries.ApiSurface.queries ++
      graft.queries.Subqueries.queries ++
      graft.queries.Behavioral.queries ++
      graft.queries.Robustness.queries ++
      graft.queries.Stats.queries ++
      graft.queries.LayoutOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracles ++
      graft.queries.Analytics.oracles ++
      graft.queries.TextDedup.oracles ++
      graft.queries.Vectors.oracles ++
      graft.queries.Events.oracles ++
      graft.queries.Nested.oracles ++
      graft.queries.ApiSurface.oracles ++
      graft.queries.Subqueries.oracles ++
      graft.queries.Behavioral.oracles ++
      graft.queries.Robustness.oracles ++
      graft.queries.Stats.oracles ++
      graft.queries.LayoutOps.oracles
}
