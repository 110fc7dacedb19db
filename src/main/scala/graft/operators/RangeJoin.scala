package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Banded range join: pairs of rows with the same key whose timestamps
  * lie within `toleranceMicros` of each other.
  *
  * A naive `|lt - rt| <= tol` theta join degenerates to a per-key
  * cross product (BroadcastNestedLoop / O(n^2) per key). Bucketizing
  * time into tolerance-sized bands turns it into an equi-join on
  * (key, band): each left row probes only its own and the adjacent
  * band, so cost scales with the true match density — the standard
  * interval-join strategy at 100 TB. The band filter is exact (no
  * false negatives: |lt-rt| <= tol implies band distance <= 1).
  */
object RangeJoin {

  /** Emits matched pairs (left prefixed `l_`, right prefixed `r_`)
    * where `abs(leftTime - rightTime) <= toleranceMicros` and the keys
    * are equal. Time columns must be TimestampType.
    */
  def bandJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTime: String, rightTime: String,
               toleranceMicros: Long): DataFrame = {
    // backtick-quote interpolated identifiers (shared Fns.quoted): a
    // dotted/spaced column name would otherwise misparse inside expr()
    def q(name: String): String = graft.functions.Fns.quoted(name)
    // `div` (integer division): Long `/` promotes to double, whose
    // rounding can misplace boundary rows by one band.
    val lBand = expr(s"unix_micros(${q(leftTime)}) div ${toleranceMicros}L")
    val rBand = expr(s"unix_micros(${q(rightTime)}) div ${toleranceMicros}L")
    val l = left.select(
      col(q(keyCol)).as("__k") +: explode(array(lBand - 1, lBand, lBand + 1)).as("__b") +:
        left.columns.map(c => col(q(c)).as(s"l_$c")).toIndexedSeq: _*)
    val r = right.select(
      col(q(keyCol)).as("__k2") +: rBand.as("__b2") +:
        right.columns.map(c => col(q(c)).as(s"r_$c")).toIndexedSeq: _*)
    l.join(r, col("__k") === col("__k2") && col("__b") === col("__b2"))
      .where(abs(unix_micros(col(q(s"l_$leftTime"))) -
                 unix_micros(col(q(s"r_$rightTime")))) <= toleranceMicros)
      .drop("__k", "__b", "__k2", "__b2")
  }
}
