package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed `Aggregator` computing per-cell embedding centroids — the
  * coarse-quantizer training step of a real IVF index (SURVEY §7.3:
  * the extensions are where custom typed aggregates earn their keep).
  *
  * Determinism note: sums accumulate over QUANTIZED integer components
  * (exact, order-independent); the single final division per dimension
  * is IEEE-exact. A double-sum centroid would drift with partition
  * order.
  */
object Centroids {

  final case class VecBuf(sum: Array[Long], n: Long)

  /** Sums quantized (milliunit) vectors; finish yields the centroid in
    * original (float) units.
    */
  class CentroidAggregator(dim: Int)
    extends Aggregator[Seq[Long], VecBuf, Seq[Double]] {
    override def zero: VecBuf = VecBuf(new Array[Long](dim), 0L)

    override def reduce(b: VecBuf, v: Seq[Long]): VecBuf = {
      var i = 0
      while (i < dim && i < v.length) { b.sum(i) += v(i); i += 1 }
      VecBuf(b.sum, b.n + 1)
    }

    override def merge(a: VecBuf, b: VecBuf): VecBuf = {
      var i = 0
      while (i < dim) { a.sum(i) += b.sum(i); i += 1 }
      VecBuf(a.sum, a.n + b.n)
    }

    override def finish(b: VecBuf): Seq[Double] =
      if (b.n == 0) Seq.empty
      else b.sum.toSeq.map(s => s.toDouble / b.n / 1000.0)

    override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Per-cell centroids of a prepped corpus (columns `cell`, `v` from
    * `Similarity.prep`). Output: (cell, centroid: array<double>).
    */
  def perCell(prepped: DataFrame, dim: Int = 64): DataFrame = {
    val spark = prepped.sparkSession
    import spark.implicits._
    val agg = new CentroidAggregator(dim)
    prepped.select(col("cell").cast("int"), col("v"))
      .as[(Int, Seq[Long])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn.name("centroid"))
      .toDF("cell", "centroid")
  }
}
