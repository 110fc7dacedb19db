package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed total-order analytics: global row_number / running sums /
  * ntile under an arbitrary sort order WITHOUT a single-partition
  * window.
  *
  * `Window.orderBy(...)` with no partitionBy is the classic 100 TB
  * scale-killer: Spark warns "No Partition Defined ... Moving all data
  * to a single partition" and sorts the whole frame through one
  * reducer. This operator generalizes Packing.withRunningOffset's
  * range-partitioned prefix-sum pattern to arbitrary schemas, multiple
  * running sums, and desc/multi-column orders:
  *
  *   1. `repartitionByRange(sortCols)` + `sortWithinPartitions` — one
  *      range exchange yields globally ordered partitions;
  *   2. a partition-id aggregate reduces each partition to one row of
  *      (count, partial sums); only P rows shuffle to the driver,
  *      where an exclusive scan produces per-partition start offsets;
  *   3. one narrow `mapPartitions` pass adds the broadcast offset to
  *      the local running count/sums.
  *
  * Ties: rows with identical full sort keys get an arbitrary but
  * deterministic-per-layout order, exactly like a single-partition
  * window; callers should include a unique tiebreak column (all
  * catalog callers do), which also makes the result layout-independent.
  *
  * Null values in a sum column contribute 0 and the emitted running
  * sums are never null (callers wrap nullable inputs in
  * `when(...).otherwise(0)` anyway); null SORT keys order first, the
  * same ASC NULLS FIRST default the window formulation uses.
  */
object TotalOrder {

  /** Result frame plus the grand totals the pass computes for free
    * (total row count, grand total of each running-sum column) — often
    * exactly the "denominator" the caller would otherwise re-aggregate.
    */
  final case class Ordered(df: DataFrame, totalCount: Long,
                           totalSums: Array[Long])

  /** Core pass. Appends to `df` (all input columns preserved, order
    * kept): `rankOut` = 1-based global row number, and for each
    * (valueCol, name) in `sums` an inclusive long running sum under
    * the total order `sortCols`.
    */
  def ordered(df: DataFrame, sortCols: Seq[Column],
              sums: Seq[(Column, String)] = Nil,
              rankOut: Option[String] = None,
              numPartitions: Int = 0): Ordered = {
    val spark = df.sparkSession
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    val keep = df.columns
    val vCols = sums.zipWithIndex.map { case ((c, _), i) =>
      c.cast("long").as(s"__v$i") }
    // lazy localCheckpoint (the Packing rationale): both downstream
    // passes read the same materialized range layout, and the
    // ContextCleaner frees the blocks when the result is dropped.
    val parted = df.select(keep.map(col).toIndexedSeq ++ vCols: _*)
      .repartitionByRange(parts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .localCheckpoint(false)

    // Pass 1: per-partition (count, partial sums). The partial
    // aggregate collapses each partition to ONE row before the
    // exchange, so only P rows move.
    val aggs = count(lit(1L)).as("__cnt") +:
      sums.indices.map(i => sum(col(s"__v$i")).as(s"__s$i"))
    val partRows = parted
      .groupBy(spark_partition_id().as("__pid"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val nParts = parted.rdd.getNumPartitions
    val cntStart = new Array[Long](nParts)
    val sumStart = Array.fill(sums.length)(new Array[Long](nParts))
    val byPid = partRows.map(r => r.getInt(0) -> r).toMap
    var accCnt = 0L
    val accSum = new Array[Long](sums.length)
    var pid = 0
    while (pid < nParts) {
      cntStart(pid) = accCnt
      var i = 0
      while (i < sums.length) { sumStart(i)(pid) = accSum(i); i += 1 }
      byPid.get(pid).foreach { r =>
        accCnt += r.getLong(1)
        var j = 0
        while (j < sums.length) {
          if (!r.isNullAt(2 + j)) accSum(j) += r.getLong(2 + j)
          j += 1
        }
      }
      pid += 1
    }
    val bcCnt = spark.sparkContext.broadcast(cntStart)
    val bcSum = spark.sparkContext.broadcast(sumStart)

    // Pass 2: narrow per-partition scan adds the broadcast offsets.
    val inSchema = parted.schema
    val vIdx = sums.indices.map(i => inSchema.fieldIndex(s"__v$i")).toArray
    val keepIdx = keep.map(inSchema.fieldIndex)
    var outSchema = StructType(keepIdx.map(inSchema.fields(_)).toIndexedSeq)
    rankOut.foreach(n => outSchema = outSchema.add(n, LongType, nullable = false))
    sums.foreach { case (_, n) =>
      outSchema = outSchema.add(n, LongType, nullable = false) }
    val emitRank = rankOut.isDefined
    val nSums = sums.length
    val res = parted.mapPartitions { it =>
      val p = TaskContext.getPartitionId()
      var rn = bcCnt.value(p)
      val run = new Array[Long](nSums)
      var i = 0
      while (i < nSums) { run(i) = bcSum.value(i)(p); i += 1 }
      it.map { r =>
        rn += 1L
        val out = new Array[Any](keepIdx.length + (if (emitRank) 1 else 0) + nSums)
        var k = 0
        while (k < keepIdx.length) { out(k) = r.get(keepIdx(k)); k += 1 }
        if (emitRank) { out(k) = rn; k += 1 }
        var j = 0
        while (j < nSums) {
          if (!r.isNullAt(vIdx(j))) run(j) += r.getLong(vIdx(j))
          out(k) = run(j); k += 1; j += 1
        }
        Row.fromSeq(out.toIndexedSeq)
      }
    }(Encoders.row(outSchema))
    Ordered(res, accCnt, accSum)
  }

  /** Global 1-based row_number under `sortCols` — the distributed twin
    * of `row_number().over(Window.orderBy(sortCols))`.
    */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column],
                    out: String = "rn"): DataFrame =
    ordered(df, sortCols, Nil, Some(out)).df

  /** Inclusive global running sum of `value` (cast to long) under
    * `sortCols` — the distributed twin of
    * `sum(value).over(Window.orderBy(sortCols).rowsBetween(unboundedPreceding, currentRow))`.
    */
  def withRunningSum(df: DataFrame, sortCols: Seq[Column],
                     value: Column, out: String): Ordered =
    ordered(df, sortCols, Seq(value -> out), None)

  /** SQL NTILE(n) under a total order: first (N mod n) buckets get
    * ⌈N/n⌉ rows, the rest ⌊N/n⌋ — computed from the distributed global
    * rank plus the driver-known total, no window. Output column is
    * int, like `ntile(n)`.
    */
  def withNtile(df: DataFrame, sortCols: Seq[Column], n: Int,
                out: String): DataFrame = {
    val o = ordered(df, sortCols, Nil, Some("__rn"))
    val total = o.totalCount
    val q = total / n
    val r = total % n
    val cut = (q + 1) * r // rows 1..cut fill the first r buckets
    // longs here stay far below 2^53, so double division is exact
    // enough for the floor
    val bucket =
      when(col("__rn") <= cut,
        floor((col("__rn") - 1).cast("double") / lit((q + 1).toDouble)))
      .otherwise(lit(r) +
        floor((col("__rn") - 1 - cut).cast("double") / lit(q.toDouble)))
    o.df.withColumn(out, (bucket + 1).cast("int")).drop("__rn")
  }
}
