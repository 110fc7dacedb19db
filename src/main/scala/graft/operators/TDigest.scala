package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions

/** Mergeable streaming quantile sketch — Dunning & Ertl's t-digest
  * (arXiv:1902.04023), the merging-digest variant. Rounds out the
  * sketch family next to K2 (`percentile_approx`, a KLL-style sketch
  * baked into Spark): unlike K2 the digest is OURS — constructible,
  * mergeable, and serializable outside a query plan — so it can be
  * persisted per partition/day and unioned later, the monoid shape
  * every 100 TB sketch needs (same contract as HLL/Count-Min here).
  *
  * Design: points buffer unmerged until the buffer overflows, then one
  * sort + greedy merge pass bounds centroid count via the k1 scale
  * function k(q) = δ/(2π)·asin(2q−1) — accuracy is relative to qσ
  * (tightest at the tails, ~O(1/δ) at the median). Centroid state is
  * O(δ); merge is associative-enough for partial aggregation (the
  * classic t-digest caveat: results are merge-order dependent, which
  * is why query-facing outputs gate on an error bound, never on the
  * estimate's exact bits).
  */
final class TDigestSketch(val compression: Double) extends Serializable {
  require(compression >= 20, s"compression too small: $compression")

  private var means: Array[Double] = Array.empty
  private var weights: Array[Double] = Array.empty
  private var total: Double = 0.0
  private val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
  private def bufCap: Int = math.max(64, (4 * compression).toInt)

  def add(x: Double, w: Double = 1.0): this.type = {
    if (!x.isNaN) {
      buf += ((x, w))
      if (buf.size >= bufCap) compress()
    }
    this
  }

  /** Folds the other digest in as weighted points (its centroids carry
    * their weights). Mutates and returns `this`.
    */
  def merge(o: TDigestSketch): this.type = {
    var i = 0
    while (i < o.means.length) { buf += ((o.means(i), o.weights(i))); i += 1 }
    buf ++= o.buf
    if (buf.size >= bufCap) compress()
    this
  }

  private def kScale(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)

  /** Sort all (centroid + buffered) points and greedily re-merge under
    * the k1 size bound. Idempotent once the buffer is empty.
    */
  def compress(): Unit = {
    if (buf.isEmpty) return
    val all = new Array[(Double, Double)](means.length + buf.size)
    var i = 0
    while (i < means.length) { all(i) = (means(i), weights(i)); i += 1 }
    buf.copyToArray(all, means.length)
    buf.clear()
    java.util.Arrays.sort(all, Ordering.by((p: (Double, Double)) => p._1))
    total = { var s = 0.0; var j = 0; while (j < all.length) { s += all(j)._2; j += 1 }; s }
    val outM = scala.collection.mutable.ArrayBuffer.empty[Double]
    val outW = scala.collection.mutable.ArrayBuffer.empty[Double]
    var (cm, cw) = all(0)
    var wSoFar = 0.0
    i = 1
    while (i < all.length) {
      val (m, w) = all(i)
      val proposed = cw + w
      if (kScale((wSoFar + proposed) / total) - kScale(wSoFar / total) <= 1.0) {
        cm += (m - cm) * w / proposed // weighted running mean
        cw = proposed
      } else {
        outM += cm; outW += cw; wSoFar += cw
        cm = m; cw = w
      }
      i += 1
    }
    outM += cm; outW += cw
    means = outM.toArray
    weights = outW.toArray
  }

  def count: Double = { compress(); total }

  /** Quantile estimate: centroids interpolated at their weight
    * midpoints (the standard t-digest readout). NaN on empty.
    */
  def quantile(q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile out of range: $q")
    compress()
    if (total == 0) return Double.NaN
    if (means.length == 1) return means(0)
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < means.length) {
      val mid = cum + weights(i) / 2
      if (target < mid) {
        if (i == 0) return means(0)
        val prevMid = cum - weights(i - 1) / 2
        return means(i - 1) +
          (means(i) - means(i - 1)) * (target - prevMid) / (mid - prevMid)
      }
      cum += weights(i)
      i += 1
    }
    means(means.length - 1)
  }

  def centroidCount: Int = { compress(); means.length }
}

object TDigest {

  /** Untyped aggregate column: t-digest over a double column, emitting
    * the requested quantile estimates as an array. Kryo-serialized
    * sketch buffers ride the partial-aggregation shuffle, so the merge
    * tree is Spark's ordinary two-phase aggregate — map-side partials,
    * one combine per group — never a collect.
    */
  def quantilesUdaf(qs: Seq[Double],
                    compression: Double = 200): UserDefinedFunction =
    functions.udaf(new Aggregator[Double, TDigestSketch, Seq[Double]] {
      def zero: TDigestSketch = new TDigestSketch(compression)
      def reduce(b: TDigestSketch, x: Double): TDigestSketch = b.add(x)
      def merge(a: TDigestSketch, b: TDigestSketch): TDigestSketch = a.merge(b)
      def finish(b: TDigestSketch): Seq[Double] = qs.map(b.quantile)
      def bufferEncoder: Encoder[TDigestSketch] = Encoders.kryo[TDigestSketch]
      def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }, Encoders.scalaDouble)
}
