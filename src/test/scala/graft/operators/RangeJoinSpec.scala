package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bandJoin equals the theta join, including exact-tolerance and " +
       "band-boundary pairs") {
    def ts(sec: Long) = new Timestamp(sec * 1000)
    val tol = 60L * 1000000 // 60s
    val left = (0L until 200L).map(i => (i % 5, ts(i * 7), s"l$i"))
      .toDF("k", "t", "ltag")
    val right = (0L until 200L).map(i => (i % 5, ts(i * 11 + 3), s"r$i"))
      .toDF("k", "t", "rtag")
    val got = RangeJoin.bandJoin(left, right, "k", "t", "t", tol)
      .select("l_ltag", "r_rtag").as[(String, String)].collect().toSet
    val want = left.as("a").join(right.as("b"),
        $"a.k" === $"b.k" &&
        org.apache.spark.sql.functions.abs(
          org.apache.spark.sql.functions.unix_micros($"a.t") -
          org.apache.spark.sql.functions.unix_micros($"b.t")) <= tol)
      .select($"a.ltag", $"b.rtag").as[(String, String)].collect().toSet
    assert(got === want)
    assert(want.nonEmpty)
  }
}
