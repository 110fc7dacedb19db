package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("MisraGries sketch retains every item above n/(capacity+1)") {
    // Zipf-ish stream: item i appears 1000/i times, i = 1..200, plus
    // uniform noise — n ≈ 1000·H(200) + noise. With capacity 50, every
    // item with freq > n/51 must survive the sketch.
    val rows: Seq[String] =
      (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"hot_$i")) ++
        (1 to 3000).map(i => s"noise_${i % 1500}")
    val grouped: Seq[Seq[String]] = rows.grouped(37).map(_.toSeq).toSeq
    val n = rows.size.toLong
    val mg = new MisraGries(50)
    // fold through reduce in two halves, merge — exercises mergeability
    val (h1, h2) = grouped.splitAt(grouped.size / 2)
    val b1 = h1.foldLeft(mg.zero)((b, d) => mg.reduce(b, d))
    val b2 = h2.foldLeft(mg.zero)((b, d) => mg.reduce(b, d))
    val sketch = mg.finish(mg.merge(b1, b2))

    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustKeep = exact.collect { case (k, v) if v > n / 51 => k }
    assert(mustKeep.nonEmpty, "test data must contain heavy hitters")
    mustKeep.foreach { k =>
      assert(sketch.contains(k), s"heavy item $k missing from sketch")
      // sketch count is a lower bound within n/(capacity+1)
      assert(sketch(k) <= exact(k))
      assert(exact(k) - sketch(k) <= n / 51 + 1)
    }
    assert(sketch.size <= 50)
  }

  test("frequentTokens on an empty corpus returns no rows") {
    val docs = Seq.empty[(String, Long)].toDF("text", "doc_id")
    assert(HeavyHitters.frequentTokens(docs, "text", k = 10).count() === 0L)
  }

  test("frequentTokens at k=5000 (broadcast semi-join candidate path) " +
       "matches the exact groupBy answer") {
    // 6k distinct background tokens + 3 genuinely heavy tokens; at
    // slack*k = 20000 the sketch keeps nearly everything, so the
    // candidate set blows far past InPredicateLimit and pass 2 must
    // take the broadcast semi-join path.
    val docs = ((1 to 6000).map(i => s"bg_$i bg_${i % 997} hot_a") ++
      (1 to 2000).map(_ => "hot_b hot_c hot_a"))
      .zipWithIndex.map { case (t, i) => (t, i.toLong) }
      .toDF("text", "doc_id")
    val got = HeavyHitters.frequentTokens(docs, "text", k = 5000)
      .as[(String, Long)].collect().toMap
    val exact = docs.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
    val n = exact.map(_._2).sum
    val want = exact.collect { case (w, c) if c * 5000 > n => (w, c) }.toMap
    assert(got === want, "broadcast-path answer diverged from exact")
    assert(got.contains("hot_a") && got.contains("hot_b"))
  }

  test("frequentTokens returns the exact over-threshold set") {
    val docs = Seq(
      ("a a a a b b c d", 1L),
      ("a a b b e f g h", 2L),
      ("a b i j k l m n", 3L)
    ).toDF("text", "doc_id")
    // 24 tokens; threshold k=6 → freq > 4: only "a" (7). "b" has 5 > 4 too.
    val hh = HeavyHitters.frequentTokens(docs, "text", k = 6)
      .orderBy("word").as[(String, Long)].collect().toSeq
    assert(hh === Seq(("a", 7L), ("b", 5L)))
  }
}
