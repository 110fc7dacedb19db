package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable Misra–Gries frequent-items sketch (Agarwal et al.,
  * "Mergeable Summaries", PODS'12) over token sequences.
  *
  * Buffer = item → lower-bound count, at most ~2×capacity entries.
  * When the buffer overflows, the (capacity+1)-th largest count is
  * subtracted from every entry and non-positive entries are dropped —
  * each unit subtracted from one item coincides with ≥ capacity+1
  * units subtracted in total, so any item's undercount is bounded by
  * n / (capacity+1). Consequence: every item with true frequency
  * > n/(capacity+1) survives in the sketch (with an underestimated
  * count). The hysteresis (trim only past 2×capacity) amortizes the
  * O(size log size) trim without weakening that bound.
  */
class MisraGries(capacity: Int)
    extends Aggregator[Seq[String], Map[String, Long], Map[String, Long]] {
  require(capacity > 0)

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], toks: Seq[String]): Map[String, Long] = {
    if (toks == null) return b
    // count the row locally first: one buffer update per DISTINCT token
    val local = scala.collection.mutable.HashMap.empty[String, Long]
    toks.foreach(t => if (t != null) local.update(t, local.getOrElse(t, 0L) + 1))
    mergeCounts(b, local)
  }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    mergeCounts(a, b)

  private def mergeCounts(a: Map[String, Long],
                          b: scala.collection.Map[String, Long]): Map[String, Long] = {
    var m = a
    b.foreach { case (k, v) => m = m.updated(k, m.getOrElse(k, 0L) + v) }
    if (m.size <= 2 * capacity) m else trim(m)
  }

  private def trim(m: Map[String, Long]): Map[String, Long] = {
    val cut = m.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
    m.collect { case (k, v) if v > cut => k -> (v - cut) }
  }

  def finish(r: Map[String, Long]): Map[String, Long] =
    if (r.size <= capacity) r else trim(r)

  def bufferEncoder: ExpressionEncoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: ExpressionEncoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

/** EXACT heavy hitters at 100 TB scale in two passes, neither of which
  * shuffles the token stream:
  *
  *   pass 1 — map-side Misra–Gries partial aggregates merge to ONE
  *     driver-sized sketch (the only exchange is sketch-sized, not
  *     data-sized). Capacity `slack × k` guarantees the candidate set
  *     is a superset of every item with frequency > n/k.
  *   pass 2 — re-scan with the candidate set as an in-predicate (a
  *     pushed-down map-side filter), exact-count ONLY the candidates
  *     (a ≤ slack·k-key shuffle), keep those above n/k.
  *
  * Contrast with the naive groupBy-every-token: that shuffles the full
  * token multiset (≈ corpus size) to count items that are overwhelmingly
  * below threshold.
  */
object HeavyHitters {

  /** Candidate sets at or under this size filter pass 2 via an in-set
    * predicate (a codegen'd hash-set probe — cheapest possible at the
    * k≈30 sketch sizes the catalog queries use). Larger sets switch to
    * a broadcast LEFT SEMI join: a multi-thousand-entry in-list bloats
    * the generated code and planning time, while a broadcast hash
    * probe costs the same per row no matter how many candidates.
    */
  val InPredicateLimit: Int = 1024

  /** Tokens with exact count × k > total token count, over
    * `split(textCol, sep)`. Returns (`word`, `cnt`). */
  def frequentTokens(docs: DataFrame, textCol: String, k: Int,
                     sep: String = " ", slack: Int = 4,
                     inPredicateLimit: Int = InPredicateLimit): DataFrame = {
    val toks = docs.select(split(col(textCol), sep).as("toks"))
    val mg = udaf(new MisraGries(slack * k), ExpressionEncoder[Seq[String]]())
    val row = toks
      .agg(mg(col("toks")).as("sketch"),
           // coalesce: an empty corpus sums to NULL, not 0
           coalesce(sum(size(col("toks"))), lit(0L)).cast("long").as("n"))
      .head()
    val candidates = row.getMap[String, Long](0).keys.toSeq
    val n = row.getLong(1)
    val words = docs.select(explode(split(col(textCol), sep)).as("word"))
    val kept =
      if (candidates.size <= inPredicateLimit)
        words.where(col("word").isInCollection(candidates))
      else {
        import docs.sparkSession.implicits._
        // candidate set is sketch-sized (slack·k rows) — always an
        // explicit broadcast, never a shuffle of the token stream
        words.join(broadcast(candidates.toDF("word")), Seq("word"),
          "left_semi")
      }
    kept.groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > n)
  }
}
