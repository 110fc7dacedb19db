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

  test("asofJoin: all payload columns come from the SAME matched row " +
       "even when one of them is null") {
    val left = Seq((1L, ts(30), "l")).toDF("k", "t", "tag")
    // matched row (t=20) has v2 = null; the earlier row (t=10) has
    // v2 = "old". A per-column carry would mix ("newV1", "old");
    // DuckDB ASOF returns ("newV1", null).
    val right = Seq(
      (1L, ts(10), "oldV1", Option("old")),
      (1L, ts(20), "newV1", Option.empty[String])
    ).toDF("k", "rt", "v1", "v2")
    val got = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("v1", "v2"))
      .select("asof_v1", "asof_v2").as[(String, Option[String])]
      .collect().toSeq
    assert(got === Seq(("newV1", None)))
  }

  test("asofJoin: NULL keys never match (join-equality semantics)") {
    val left = Seq(
      (Option(1L), ts(10), "k1"),
      (Option.empty[Long], ts(10), "knull")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (Option(1L), ts(5), "a"),
      (Option.empty[Long], ts(5), "fromNullKey")
    ).toDF("k", "rt", "v")
    val got = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[String])]
      .collect().toMap
    assert(got === Map("k1" -> Some("a"), "knull" -> None))
  }

  test("asofJoin: NULL right times never match, NULL left times get no match") {
    val left = Seq(
      (1L, Option(ts(10)), "t10"),
      (1L, Option.empty[Timestamp], "tnull")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, Option.empty[Timestamp], "ghost"),
      (1L, Option(ts(5)), "a")
    ).toDF("k", "rt", "v")
    val got = AsofJoin.asofJoin(left, right, "k", "t", "rt", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[String])]
      .collect().toMap
    assert(got === Map("t10" -> Some("a"), "tnull" -> None))
  }
}
