package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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

  /** Tables already created by THIS session (keyed appId/name) — see
    * [[createTableOnce]].
    */
  private val createdTables =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Run `create` exactly once per (session, table name), even under
    * concurrent invocation — later callers reuse the existing table.
    *
    * Two layers close the two races on a shared warehouse: table
    * names carry the applicationId upstream, so concurrent JVMs never
    * collide on a name; and this JVM-wide guard serializes concurrent
    * invocations WITHIN a session (Verify runs queries in parallel;
    * bench loops re-invoke), so the DROP + rewrite runs once and every
    * subsequent invocation is a pure reuse — which is also the honest
    * cost model: bucketing is a pay-once layout investment, not a
    * per-query tax.
    */
  def createTableOnce(spark: org.apache.spark.sql.SparkSession,
                      table: String)(create: => Unit): Unit = {
    val key = spark.sparkContext.applicationId + "/" + table
    if (!createdTables.contains(key)) createdTables.synchronized {
      if (!createdTables.contains(key)) {
        create
        createdTables.add(key)
      }
    }
  }

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

  /** Compact a small-file parquet dataset into ~`targetBytes` output
    * files. The long-running-pipeline failure mode at 100 TB is not
    * one big file but MILLIONS of tiny ones (per-trigger streaming
    * sinks, over-parallel writers): listing dominates planning, every
    * scan pays per-file open cost, and the NameNode/object store melts.
    * Sizing from the actual on-disk bytes (not row counts) keeps the
    * output file size stable regardless of schema width/encoding.
    *
    * Round-robin `repartition(n)` — not coalesce — so compaction also
    * REBALANCES: coalesce(n) merges adjacent partitions and inherits
    * their skew, while a shuffle write spreads bytes evenly.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): Long = {
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath))
      .getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    n.toLong
  }

  /** Morton (Z-order) key for two non-negative int columns: the bits
    * of `a` and `b` interleaved into one long, so sorting by the key
    * clusters rows that are close in BOTH dimensions. A multi-dim
    * filter then touches ~sqrt of the files a single-dim sort layout
    * would — the data-skipping trick behind Delta/Iceberg OPTIMIZE
    * ZORDER, expressed here as five codegen'd shift/mask stages per
    * column (the classic bit-spread), no UDF.
    *
    * Caller contract: values must fit in 31 bits (rank/bucket the
    * column first if it doesn't — z-ordering raw long IDs wastes the
    * high bits anyway).
    */
  def mortonKey(a: Column, b: Column): Column = {
    def spread(c: Column): Column = {
      // spread the low 32 bits of c to the even bit positions
      var x = c.cast("long").bitwiseAND(lit(0xffffffffL))
      x = x.bitwiseOR(shiftleft(x, 16)).bitwiseAND(lit(0x0000ffff0000ffffL))
      x = x.bitwiseOR(shiftleft(x, 8)).bitwiseAND(lit(0x00ff00ff00ff00ffL))
      x = x.bitwiseOR(shiftleft(x, 4)).bitwiseAND(lit(0x0f0f0f0f0f0f0f0fL))
      x = x.bitwiseOR(shiftleft(x, 2)).bitwiseAND(lit(0x3333333333333333L))
      x.bitwiseOR(shiftleft(x, 1)).bitwiseAND(lit(0x5555555555555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Write `df` Z-order-clustered on two int columns: range-partition
    * by the morton key (evenly sized files via range boundaries from a
    * sample), sort within partitions so parquet row-group min/max
    * stats are tight on BOTH columns.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
                    colB: String, numFiles: Int): Unit =
    df.withColumn("__z", mortonKey(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)

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

  /** Hilbert-curve key for two non-negative int columns on a
    * 2^order × 2^order grid — the other multi-dim clustering key next
    * to [[mortonKey]]. Hilbert keeps BETTER locality than Morton (no
    * quadrant-boundary jumps: consecutive keys are always
    * Manhattan-adjacent cells). The xy2d recurrence carries state
    * across bit levels, so it lives in a native codegen'd expression
    * ([[graft.functions.expressions.HilbertIndex]]) — the nested-CASE
    * column formulation grows a ~4^order-node tree (a 174 MB task
    * binary at order=8).
    *
    * Caller contract: values must lie in [0, 2^order) — rank/bucket
    * first otherwise (same contract as mortonKey).
    */
  def hilbertKey(a: Column, b: Column, order: Int = 16): Column = {
    graft.functions.expressions.HilbertIndex.register(SparkSession.active)
    call_function("graft_hilbert_index",
      a.cast("long"), b.cast("long"), lit(order))
  }

  /** Write `df` Hilbert-clustered on two int columns — same shape as
    * [[writeZOrdered]] (range-partition for even files, sort within
    * for tight row-group stats) with the better-locality key.
    */
  def writeHilbert(df: DataFrame, path: String, colA: String,
                   colB: String, numFiles: Int, order: Int = 16): Unit =
    df.withColumn("__h", hilbertKey(col(colA), col(colB), order))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode(SaveMode.Overwrite).parquet(path)
}
