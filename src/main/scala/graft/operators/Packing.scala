package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: concatenate documents
  * in a deterministic order and chunk the token stream at a fixed
  * budget (the "concat-and-chunk" step of LLM pretraining corpus
  * prep). Each document's global token OFFSET decides its chunk.
  *
  * The naive offset formula is
  * `sum(tokens) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING)` — a
  * GLOBAL window, which Spark executes on ONE partition: the 100 TB
  * anti-pattern. This operator computes the same exclusive prefix sum
  * distributed:
  *
  *   1. `repartitionByRange(id)` + `sortWithinPartitions(id)` — a
  *      range shuffle gives globally ordered partitions;
  *   2. one pass per partition sums its token counts; the P partial
  *      totals (P rows, not data rows) come to the driver and are
  *      exclusive-scanned into per-partition start offsets;
  *   3. a second per-partition pass adds the broadcast start offset to
  *      the local running sum.
  *
  * Two narrow passes + one range exchange, no global sort on a single
  * reducer. The window formulation stays as the spec/oracle twin.
  */
object Packing {

  /** Adds `offset` = exclusive global prefix sum of `valueCol` under
    * ORDER BY `idCol` (both cast to long). Output columns: (`idCol`,
    * `valueCol`, `offset`).
    *
    * `idCol` must be UNIQUE: range partitioning keeps duplicate ids in
    * one partition, but their relative order (and therefore which of
    * them gets which offset) would be nondeterministic. Rows with a
    * NULL id or value are EXCLUDED (a null id has no position in the
    * order and a null value no defined contribution — same contract as
    * Hierarchy.closure's null-key filter).
    */
  def withRunningOffset(df: DataFrame, idCol: String, valueCol: String,
                        numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sessionState.conf.numShufflePartitions
    // lazy localCheckpoint, not persist(): both passes read the same
    // materialized blocks AND the ContextCleaner frees them when the
    // result is dropped — persist() would pin an input-sized cache
    // entry per call until someone manually unpersists.
    val parted = df
      .select(col(idCol).cast("long"), col(valueCol).cast("long"))
      .where(col(idCol).isNotNull && col(valueCol).isNotNull)
      .as[(Long, Long)]
      .repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(idCol)
      .localCheckpoint(false)

    val partTotals = parted.mapPartitions { it =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator.single((TaskContext.getPartitionId(), s))
    }.collect().sortBy(_._1)
    val starts = new Array[Long](partTotals.length)
    var acc = 0L
    partTotals.foreach { case (pid, total) => starts(pid) = acc; acc += total }
    val bc = spark.sparkContext.broadcast(starts)

    parted.mapPartitions { it =>
      var run = bc.value(TaskContext.getPartitionId())
      it.map { case (id, v) => val off = run; run += v; (id, v, off) }
    }.toDF(idCol, valueCol, "offset")
  }

  /** Concat-and-chunk packing: per-chunk stats for a `budget`-token
    * chunking of the corpus ordered by `idCol` (a document belongs to
    * the chunk its first token falls in). Output: (`chunk_id`,
    * `n_docs`, `first_doc`, `last_doc`, `sum_tokens`).
    */
  def packChunks(docs: DataFrame, idCol: String, tokensCol: String,
                 budget: Long): DataFrame =
    withRunningOffset(docs, idCol, tokensCol)
      .withColumn("chunk_id", expr(s"CAST(offset DIV $budget AS BIGINT)"))
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_docs"),
           min(col(idCol)).as("first_doc"),
           max(col(idCol)).as("last_doc"),
           sum(col(tokensCol)).as("sum_tokens"))
}
