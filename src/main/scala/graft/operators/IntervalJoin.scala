package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval overlap join: pairs of intervals `[start, end]` (inclusive,
  * long units — µs, days, positions) that overlap:
  * `l.start <= r.end AND r.start <= l.end`.
  *
  * The naive theta join is a cross product. The scale strategy is the
  * standard bucketized interval join: cover every interval with
  * `bucketSize`-sized buckets, equi-join on the bucket id, then apply
  * the exact overlap predicate. Replication factor is
  * `len/bucketSize + 1` per row, so pick `bucketSize` near the typical
  * interval length.
  *
  * Exactly-once without a distinct: an overlapping pair co-occurs in
  * every bucket both intervals cover, so the pair is emitted only in
  * the canonical bucket containing `max(l.start, r.start)` — the
  * overlap's left edge. That turns O(replication²) duplicate pairs
  * into zero, with no dedup shuffle (the trick MapReduce spatial joins
  * and Spark range-join implementations share).
  */
object IntervalJoin {

  /** Emits overlapping pairs (left prefixed `l_`, right prefixed
    * `r_`). `startCol`/`endCol` must be LongType in both frames, with
    * `start <= end` per row.
    */
  def overlapJoin(left: DataFrame, right: DataFrame, startCol: String,
                  endCol: String, bucketSize: Long): DataFrame = {
    require(bucketSize > 0, s"bucketSize must be positive: $bucketSize")
    // backtick-quote interpolated identifiers (shared Fns.quoted): a
    // dotted/spaced column name would otherwise misparse inside expr()
    def q(name: String): String = graft.functions.Fns.quoted(name)
    // `div` (integral division on longs): `/` promotes to double and
    // can misplace boundary rows at 2024-epoch-µs magnitudes.
    def buckets(df: DataFrame, pfx: String): DataFrame =
      df.select(
        expr(s"explode(sequence(${q(startCol)} div ${bucketSize}L, " +
             s"${q(endCol)} div ${bucketSize}L))").as(s"__b$pfx") +:
          df.columns.map(c => col(q(c)).as(s"$pfx$c")).toIndexedSeq: _*)
    val l = buckets(left, "l_")
    val r = buckets(right, "r_")
    l.join(r, col("__bl_") === col("__br_") &&
        col(q(s"l_$startCol")) <= col(q(s"r_$endCol")) &&
        col(q(s"r_$startCol")) <= col(q(s"l_$endCol")) &&
        // canonical bucket: the one holding the overlap's left edge.
        // `div` truncates toward zero (not floor) — that only widens
        // the bucket spanning zero; correctness needs the SAME mapping
        // here as in the covers, which the negative-coordinate
        // property test pins.
        col("__bl_") ===
          expr(s"greatest(${q(s"l_$startCol")}, ${q(s"r_$startCol")}) " +
               s"div ${bucketSize}L"))
      .drop("__bl_", "__br_")
  }
}
