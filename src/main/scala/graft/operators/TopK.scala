package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions

/** Per-group top-k as a bounded-heap AGGREGATE instead of a window
  * sort.
  *
  * The window formulation (`row_number().over(partitionBy(g).orderBy
  * ...) <= k`) sorts EVERY group's full row set to keep k rows —
  * O(n log n) per group and the whole group resident in the sort
  * spill. This aggregator keeps k rows of state per group, period:
  * O(n log k) work, map-side partials are already k-bounded before the
  * shuffle (each partition contributes ≤ k candidates per group, not
  * its whole slice), and merge is a k∪k trim. At 100 TB the
  * difference is shuffling k rows per (group × partition) versus
  * re-sorting the fact table.
  *
  * Ordering contract: descending by `score`, ties broken ascending by
  * `id` — a TOTAL order, so the result is deterministic and
  * hash-comparable to a window oracle with the same ORDER BY.
  */
object TopK {

  type Entry = (Long, Long) // (score, id)

  /** Insert into a descending-sorted bounded buffer. Linear in k —
    * k is small by construction; the win is never holding > k rows.
    */
  private[operators] def insert(buf: Array[Entry], k: Int,
                                e: Entry): Array[Entry] = {
    def lt(a: Entry, b: Entry): Boolean = // a ranks after b
      a._1 < b._1 || (a._1 == b._1 && a._2 > b._2)
    if (buf.length >= k && lt(e, buf(buf.length - 1))) buf
    else {
      val out = (buf :+ e).sortWith((a, b) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
      if (out.length > k) out.take(k) else out
    }
  }

  /** Untyped aggregate column: top-k (score, id) structs, descending
    * by score with ascending-id tiebreak. Input: struct(score, id).
    */
  def topKUdaf(k: Int): UserDefinedFunction = {
    require(k >= 1, s"k must be >= 1, got $k")
    functions.udaf(new Aggregator[Entry, Array[Entry], Seq[Entry]] {
      def zero: Array[Entry] = Array.empty
      def reduce(b: Array[Entry], x: Entry): Array[Entry] = insert(b, k, x)
      def merge(a: Array[Entry], b: Array[Entry]): Array[Entry] =
        b.foldLeft(a)((acc, e) => insert(acc, k, e))
      def finish(b: Array[Entry]): Seq[Entry] = b.toSeq
      def bufferEncoder: Encoder[Array[Entry]] = Encoders.kryo[Array[Entry]]
      def outputEncoder: Encoder[Seq[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    }, Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
  }
}
