package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bucketized overlap join must emit EXACTLY the naive theta
  * join's pairs — no duplicates from multi-bucket co-occurrence, no
  * losses at bucket boundaries, and exact behavior on negative
  * coordinates (where truncate-div widens the zero-spanning bucket —
  * harmless only because covers and canonical share the mapping).
  */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def naive(l: Seq[(Long, Long, Long)], r: Seq[(Long, Long, Long)]) =
    (for {
      (lid, ls, le) <- l
      (rid, rs, re) <- r
      if ls <= re && rs <= le
    } yield (lid, rid)).toSet

  test("matches the naive theta join on random intervals") {
    val rng = new Random(59)
    (1 to 4).foreach { round =>
      // negative starts in half the rounds; lengths straddle the
      // bucket size so intervals cover 1..several buckets
      val base = if (round % 2 == 0) -500L else 0L
      def gen(n: Int, idOff: Long) = (0 until n).map { i =>
        val s = base + rng.nextInt(1000).toLong
        (idOff + i, s, s + rng.nextInt(150).toLong)
      }
      val l = gen(40, 0)
      val r = gen(40, 1000)
      val got = IntervalJoin
        .overlapJoin(l.toDF("id", "s", "e"), r.toDF("id", "s", "e"),
                     "s", "e", bucketSize = 64)
        .select(col("l_id"), col("r_id"))
        .as[(Long, Long)].collect()
      assert(got.length === got.toSet.size,
        s"round=$round emitted duplicate pairs")
      assert(got.toSet === naive(l, r), s"round=$round")
    }
  }

  test("column names with dots survive the expr-interpolated covers") {
    val l = Seq((1L, 0L, 100L)).toDF("the.id", "t.start", "t.end")
    val r = Seq((2L, 50L, 150L)).toDF("the.id", "t.start", "t.end")
    val got = IntervalJoin.overlapJoin(l, r, "t.start", "t.end",
        bucketSize = 64)
      .select(col("`l_the.id`"), col("`r_the.id`"))
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("exact boundary touch counts as overlap; disjoint does not") {
    val l = Seq((1L, 0L, 100L)).toDF("id", "s", "e")
    val r = Seq((2L, 100L, 200L), (3L, 101L, 300L)).toDF("id", "s", "e")
    val got = IntervalJoin.overlapJoin(l, r, "s", "e", bucketSize = 64)
      .select(col("l_id"), col("r_id")).as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }
}
