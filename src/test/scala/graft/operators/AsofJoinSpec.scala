package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("asofJoin: latest prior row carried, ties match, no-prior is null") {
    val left = Seq(
      (1L, ts(10), "p10"), // after r5 -> carries a
      (1L, ts(20), "p20"), // ties with r20 -> carries b (tie matches)
      (1L, ts(3), "p3"),   // before any right row -> null
      (2L, ts(50), "p50")  // key with no right rows at all -> null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(5), "a"),
      (1L, ts(20), "b")
    ).toDF("k", "rt", "v")
    val got = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[String])]
      .collect().toMap
    assert(got === Map(
      "p10" -> Some("a"), "p20" -> Some("b"),
      "p3" -> None, "p50" -> None))
  }
}
