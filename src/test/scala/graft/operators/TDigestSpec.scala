package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TDigestSpec extends SparkSpec {

  private def exactQuantile(xs: Array[Double], q: Double): Double = {
    val s = xs.sorted
    s(math.min(s.length - 1, math.ceil(q * s.length).toInt - 1).max(0))
  }

  test("quantile estimates land within 1% rank error on uniform, " +
       "normal, and exponential data") {
    val rnd = new scala.util.Random(42)
    val dists: Seq[(String, Int => Double)] = Seq(
      ("uniform", _ => rnd.nextDouble() * 1000),
      ("normal", _ => rnd.nextGaussian() * 50 + 500),
      ("exponential", _ => -math.log(rnd.nextDouble()) * 100))
    for ((name, gen) <- dists) {
      val xs = Array.tabulate(50000)(gen)
      val td = new TDigestSketch(200)
      xs.foreach(td.add(_))
      for (q <- Seq(0.05, 0.25, 0.5, 0.75, 0.95, 0.99)) {
        val est = td.quantile(q)
        // rank-space check: the estimate's actual rank must be within
        // 1% of q — the right metric for a quantile sketch (value
        // error depends on local density, rank error doesn't)
        val rank = xs.count(_ <= est).toDouble / xs.length
        assert(math.abs(rank - q) <= 0.01,
          s"$name q=$q: est=$est has rank $rank")
      }
    }
  }

  test("merging per-partition digests matches the single-digest " +
       "estimate (mergeability, the 100 TB contract)") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(40000)(rnd.nextGaussian() * 10 + 100)
    val whole = new TDigestSketch(200)
    xs.foreach(whole.add(_))
    val merged = xs.grouped(5000)
      .map { part =>
        val d = new TDigestSketch(200); part.foreach(d.add(_)); d
      }
      .reduce((a, b) => a.merge(b))
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val a = whole.quantile(q)
      val b = merged.quantile(q)
      val rankA = xs.count(_ <= a).toDouble / xs.length
      val rankB = xs.count(_ <= b).toDouble / xs.length
      assert(math.abs(rankA - rankB) <= 0.01, s"q=$q: $a vs $b")
    }
  }

  test("centroid count stays O(compression) regardless of input size") {
    val rnd = new scala.util.Random(3)
    val td = new TDigestSketch(100)
    (1 to 200000).foreach(_ => td.add(rnd.nextDouble()))
    assert(td.centroidCount <= 200,
      s"centroids must be bounded by ~2δ, got ${td.centroidCount}")
    assert(td.count === 200000.0)
  }

  test("edge cases: empty digest is NaN, single value is exact, " +
       "constant stream is exact at every quantile") {
    val empty = new TDigestSketch(100)
    assert(empty.quantile(0.5).isNaN)
    val one = new TDigestSketch(100).add(42.0)
    assert(one.quantile(0.0) === 42.0 && one.quantile(1.0) === 42.0)
    val const = new TDigestSketch(100)
    (1 to 1000).foreach(_ => const.add(5.5))
    for (q <- Seq(0.01, 0.5, 0.99)) assert(const.quantile(q) === 5.5)
  }

  test("quantiles are monotone in q") {
    val rnd = new scala.util.Random(11)
    val td = new TDigestSketch(100)
    (1 to 10000).foreach(_ => td.add(rnd.nextGaussian()))
    val qs = (0 to 20).map(_ / 20.0)
    val vs = qs.map(td.quantile)
    assert(vs === vs.sorted, s"non-monotone readout: $vs")
  }

  test("the udaf aggregates per group inside a Spark plan and matches " +
       "the driver-side digest within rank tolerance") {
    val rnd = new scala.util.Random(5)
    import spark.implicits._
    val rows = (1 to 20000).map { i =>
      val g = i % 3
      (g, rnd.nextGaussian() * (g + 1) * 10 + 100 * (g + 1))
    }
    val td = TDigest.quantilesUdaf(Seq(0.5, 0.95), 200)
    val got = rows.toDF("g", "x").repartition(8)
      .groupBy("g").agg(td(col("x")).as("est"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    for (g <- 0 to 2) {
      val xs = rows.collect { case (`g`, x) => x }.toArray
      for ((q, i) <- Seq(0.5 -> 0, 0.95 -> 1)) {
        val est = got(g)(i)
        val rank = xs.count(_ <= est).toDouble / xs.length
        assert(math.abs(rank - q) <= 0.01, s"g=$g q=$q est=$est rank=$rank")
      }
    }
  }
}
