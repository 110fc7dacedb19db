package graft.operators

import org.apache.spark.sql.DataFrame

/** Stats-resetting materialization for iterative operators.
  *
  * `Dataset.localCheckpoint()` truncates the logical plan and the RDD
  * lineage, but (Spark 3.4+) the resulting `LogicalRDD` CARRIES
  * `originStats` — the size estimate of the pre-checkpoint plan — so
  * the next round's join estimates multiply on top of the previous
  * round's product. In a peeling/fixpoint loop whose per-round plan
  * references the carried frame j times, the estimate's BigInt
  * bit-length grows ~j× per round: after ~a dozen rounds Catalyst's
  * join-size arithmetic is multiplying million-bit integers and
  * PLANNING (BigInteger.multiply on the driver) dwarfs execution —
  * measured 0.3 s → 40 s per round on a constant-size k-truss peel
  * while the removed set shrank to 4 edges.
  *
  * Rebuilding the frame from the checkpointed RDD drops the carried
  * stats: the fresh `LogicalRDD` reports the honest "unknown"
  * default, constant across rounds. The Row↔InternalRow detour costs
  * one deserialize/serialize pass per downstream use of the (already
  * materialized, edge-sized) frame — microseconds against the joins
  * it unblocks.
  */
object Materialize {

  /** Eagerly materialize `df` with truncated lineage AND
    * round-constant stats. Drop-in for `localCheckpoint()` inside
    * iteration; single-shot checkpoints (no compounding) don't need
    * it.
    */
  def apply(df: DataFrame): DataFrame = apply(df, eager = true)

  /** `eager = false` is the drop-in for `localCheckpoint(false)` —
    * loops whose convergence probe doubles as the materializing
    * action keep their one-job-per-iteration shape.
    */
  def apply(df: DataFrame, eager: Boolean): DataFrame = {
    val ckpt = df.localCheckpoint(eager)
    ckpt.sparkSession.createDataFrame(ckpt.rdd, ckpt.schema)
  }
}
