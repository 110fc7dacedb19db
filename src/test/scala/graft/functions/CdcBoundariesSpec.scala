package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.CdcBoundaries

class CdcBoundariesSpec extends SparkSpec {
  import spark.implicits._

  private val (w, dv, b, m) = (16, 32, 31, 1048573)

  /** Direct windowed-sum reference — validates the O(n) rolling
    * update in CdcBoundaries.compute against the definition.
    */
  private def refBoundaries(s: String): Seq[Int] = {
    val pows = Iterator.iterate(1L)(_ * b % m).take(w).toSeq
    (w until s.length).filter { pos => // 1-based window-end positions w..n-1
      val h = (0 until w).map(j => (s.charAt(pos - 1 - j) + 1L) * pows(j) % m)
        .sum % m
      h % dv == 0
    }
  }

  test("rolling compute matches the direct windowed-sum definition") {
    val docs = Seq(
      "", "x", "a" * 15, "a" * 16, "a" * 17, "ab" * 200,
      "key agg row scan slow fast table value part hash value " * 8,
      (0 until 400).map(i => ('a' + (i * 7 % 26)).toChar).mkString)
    docs.foreach { s =>
      val got = CdcBoundaries.compute(s, w, dv, b, m).toIntArray().toSeq
      assert(got === refBoundaries(s), s"mismatch for ${s.take(30)}…")
    }
  }

  test("boundaries are in (w, n) and chunks reconstruct the text") {
    val text = (0 until 600).map(i => ('a' + (i * 11 % 26)).toChar).mkString
    val bs = CdcBoundaries.compute(text, w, dv, b, m).toIntArray().toSeq
    assert(bs.forall(p => p >= w && p < text.length))
    assert(bs === bs.sorted && bs.distinct == bs)
    val starts = 1 +: bs.map(_ + 1)
    val ends = bs :+ text.length
    val rebuilt = starts.zip(ends)
      .map { case (s0, e0) => text.substring(s0 - 1, e0) }.mkString
    assert(rebuilt === text)
  }

  test("content-defined property: a front insertion shifts every " +
       "position but preserves almost all chunk hashes") {
    // aperiodic text (a short-period string gives degenerate all-or-
    // nothing boundaries); seeded Random is deterministic
    val rnd = new scala.util.Random(42)
    val base = (0 until 800).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val edited = "Z" + base
    def chunkHashes(s: String): Seq[String] = {
      val bs = CdcBoundaries.compute(s, w, dv, b, m).toIntArray().toSeq
      val starts = 1 +: bs.map(_ + 1)
      val ends = bs :+ s.length
      starts.zip(ends).map { case (s0, e0) => s.substring(s0 - 1, e0) }
    }
    val a = chunkHashes(base)
    val e = chunkHashes(edited)
    assert(a.size >= 5, s"fixture too small: ${a.size} chunks")
    // fixed-width chunking would share ZERO chunks after the shift;
    // content-defined cuts re-sync within one window, so only the
    // first chunk differs
    val shared = a.toSet.intersect(e.toSet).size
    assert(shared >= a.size - 2,
      s"expected near-total chunk reuse after a 1-char front edit: " +
        s"shared=$shared of ${a.size}")
  }

  test("the expression is codegen'd inside the query plan") {
    // a file source, not a local relation — ConvertToLocalRelation
    // would constant-fold the projection away
    CdcBoundaries.register(spark)
    val df = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
      .select(call_function("graft_cdc_boundaries", col("text"),
        lit(w), lit(dv), lit(b), lit(m)).as("bnd"))
    df.collect() // executes THIS queryExecution
    val exec = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(exec).isDefined,
      s"cdc boundaries must run inside whole-stage codegen:\n$exec")
  }
}
