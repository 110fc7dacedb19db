package graft.operators

import java.sql.Date

import graft.SparkSpec

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private val d0 = Date.valueOf("2020-01-01")
  private val d1 = Date.valueOf("2022-01-01")
  private val asOf = Date.valueOf("2024-06-01")

  test("upsert: update rows win wholesale including their NULLs") {
    val base = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0))
      .toDF("k", "name", "v")
    val updates = Seq((2L, None: Option[String], 99.0), (3L, Some("c"), 30.0))
      .toDF("k", "name", "v")
    val got = Merge.upsert(base, updates, "k").orderBy("k")
      .as[(Long, Option[String], Double)].collect().toSeq
    // key 2's update carries name=NULL — it must win (no stitching
    // the old "b" back in), key 3 inserts, key 1 carries through.
    assert(got === Seq((1L, Some("a"), 10.0), (2L, None, 99.0),
                       (3L, Some("c"), 30.0)))
  }

  test("scd2: versions changes (incl. NULL transitions), carries " +
       "unchanged/absent keys, passes closed history untouched") {
    val history = Seq(
      (1L, Some("a"), d0, None: Option[Date]),  // unchanged in snapshot
      (2L, Some("b"), d0, None),                // changed -> "c"
      (3L, None: Option[String], d0, None),     // NULL -> "z" change
      (6L, Some("q"), d0, None),                // absent from snapshot
      (4L, Some("old"), d0, Some(d1))           // closed: pure passthrough
    ).toDF("k", "seg", "valid_from", "valid_to")
    val snapshot = Seq((1L, Some("a")), (2L, Some("c")), (3L, Some("z")),
      (5L, Some("n"))).toDF("k", "seg")

    val got = Merge.scd2(history, snapshot, "k", "seg", asOf)
      .orderBy("k", "valid_from")
      .as[(Long, Option[String], Date, Option[Date])].collect().toSeq

    assert(got === Seq(
      (1L, Some("a"), d0, None),          // unchanged, still current
      (2L, Some("b"), d0, Some(asOf)),    // old version closed
      (2L, Some("c"), asOf, None),        // new version opened
      (3L, None, d0, Some(asOf)),         // NULL -> value versions too
      (3L, Some("z"), asOf, None),
      (4L, Some("old"), d0, Some(d1)),    // closed history untouched
      (5L, Some("n"), asOf, None),        // new key inserted
      (6L, Some("q"), d0, None)))         // absent from snapshot: carried
  }
}
