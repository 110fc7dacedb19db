package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout helpers for the two storage decisions that dominate
  * repeated-query cost at 100 TB (SURVEY §4):
  *
  *   - BUCKETING: pre-shuffle a fact table once at write time
  *     (`bucketBy` on the join/agg key). Every later equi-join or
  *     aggregation on that key reads co-located buckets and skips its
  *     Exchange entirely — the write-once/join-many trade.
  *   - PARTITIONING: directory-level `partitionBy` on a low-cardinality
  *     filter column. Selective reads prune whole directories at file
  *     listing time (PartitionFilters in the scan), never touching
  *     excluded data.
  *
  * Both are plain Spark writers — the value is the contract they
  * enforce (sorted buckets, stable bucket count) so downstream plans
  * actually elide the exchanges. `LayoutSpec` asserts the plan shapes:
  * no ShuffleExchange under a bucketed join, PartitionFilters present
  * on a partitioned scan.
  */
object Layout {

  /** Write `df` as a bucketed+sorted managed table on `keyCol`. Joins
    * and aggregations between tables bucketed with the SAME bucket
    * count on the SAME key run exchange-free.
    */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCol)
      .sortBy(keyCol)
      .format("parquet")
      .saveAsTable(table)

  /** Write `df` partitioned by a low-cardinality column; selective
    * filters on that column prune directories at listing time.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCol: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  /** True iff the executed plan contains no shuffle exchange — the
    * property bucketed joins buy. Collects actual
    * `ShuffleExchangeLike` nodes (covers hash, range, and
    * single-partition exchanges plus AQE shuffle stages) instead of
    * substring-matching the plan string, which misses
    * `Exchange rangepartitioning` / `Exchange SinglePartition` and
    * AQE's re-wrapped shuffle reads.
    */
  def isExchangeFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect {
        case e: ShuffleExchangeLike => Seq(e)
        case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
        case q: QueryStageExec => shuffles(q.plan)
      }.flatten
    shuffles(df.queryExecution.executedPlan).isEmpty
  }

  /** The scan-level partition filters of the first file source in the
    * plan (empty string when none) — non-empty proves directory
    * pruning happened at listing time.
    */
  def partitionFilters(spark: SparkSession, df: DataFrame): String = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    scans.flatMap(_.partitionFilters).mkString(", ")
  }
}
