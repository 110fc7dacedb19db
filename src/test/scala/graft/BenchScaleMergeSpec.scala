package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scaling-artifact merge must never lose board state: a
  * SPARK_GRAFT_SCALE_ONLY dev run with the default output path once
  * replaced the full 31-row board with a single-query file (r12).
  * Pure JSON-in/JSON-out, so pinned without a SparkSession.
  */
class BenchScaleMergeSpec extends AnyFunSuite {
  private val om = new com.fasterxml.jackson.databind.ObjectMapper()
  private def q(json: String) = om.readTree(json).get("queries")

  private val prev =
    """{"metric":"scaling","runs":2,"queries":{
      |"a":{"sf1.0":1.0,"sf3.0":3.0,"top_decade_exponent":1.0},
      |"b":{"sf1.0":2.0,"top_decade_exponent":0.5}}}""".stripMargin

  test("unprobed rows and cells survive verbatim") {
    val now = """{"metric":"scaling","runs":1,"queries":{"b":{"sf3.0":5.0,"top_decade_exponent":0.8}}}"""
    val m = q(BenchScale.mergeArtifacts(prev, now, 1))
    assert(m.get("a").get("sf1.0").asDouble() == 1.0)
    assert(m.get("a").get("sf3.0").asDouble() == 3.0)
    assert(m.get("b").get("sf1.0").asDouble() == 2.0) // old cell kept
    assert(m.get("b").get("sf3.0").asDouble() == 5.0) // new cell added
    assert(m.get("b").get("top_decade_exponent").asDouble() == 0.8)
  }

  test("a JSON-null field never blanks a measured value") {
    val now = """{"metric":"scaling","runs":1,"queries":{"a":{"sf1.0":1.5,"top_decade_exponent":null}}}"""
    val m = q(BenchScale.mergeArtifacts(prev, now, 1))
    assert(m.get("a").get("sf1.0").asDouble() == 1.5)
    assert(m.get("a").get("top_decade_exponent").asDouble() == 1.0)
  }

  test("a brand-new row is added whole") {
    val now = """{"metric":"scaling","runs":1,"queries":{"c":{"sf1.0":9.0,"top_decade_exponent":null}}}"""
    val m = q(BenchScale.mergeArtifacts(prev, now, 1))
    assert(m.size() == 3)
    assert(m.get("c").get("sf1.0").asDouble() == 9.0)
  }

  test("unparseable input throws (caller falls back to overwrite, loudly)") {
    intercept[Exception] {
      BenchScale.mergeArtifacts("not json", """{"queries":{}}""", 1)
    }
  }

  // ---- renderArtifact (the run's own JSON emission) ----------------

  test("render: normal row carries cells, exponent, and per-row runs") {
    val out = BenchScale.renderArtifact(
      Seq(("a", Seq((1.0, 2.0), (3.0, 8.0)), false)), 2)
    val row = q(out).get("a")
    assert(row.get("sf1.0").asDouble() == 2.0)
    assert(row.get("sf3.0").asDouble() == 8.0)
    // slope log(8/2)/log(3/1) ≈ 1.2619
    assert(math.abs(row.get("top_decade_exponent").asDouble() - 1.2619) < 1e-3)
    assert(row.get("runs").asInt() == 2)
    assert(om.readTree(out).get("runs").asInt() == 2)
    // every emitted row self-describes its timing basis (r14 shift:
    // toRdd.count of the planned plan), so a re-probe stamps over any
    // stale count()-era basis annotation on the board row
    assert(row.get("basis").asText() == "toRdd")
  }

  test("render: a TRIMMED row emits a null exponent so the merge " +
       "preserves the adjudicated large-SF slope") {
    // fence removed sf>=1 dirs; the kept sub-sf1 decade measures a
    // different (near-linear) slope that must NOT overwrite the
    // board's measured quadratic exponent
    val out = BenchScale.renderArtifact(
      Seq(("a", Seq((0.01, 0.5), (0.1, 0.6)), true)), 1)
    assert(q(out).get("a").get("top_decade_exponent").isNull)
    // and the null-never-overwrites merge keeps the old slope
    val m = q(BenchScale.mergeArtifacts(prev, out, 1))
    assert(m.get("a").get("top_decade_exponent").asDouble() == 1.0)
    assert(m.get("a").get("sf0.01").asDouble() == 0.5) // new cells land
  }

  test("render: every cell carries a per-cell basis stamp") {
    val out = BenchScale.renderArtifact(
      Seq(("a", Seq((1.0, 2.0), (3.0, 8.0)), false)), 1)
    val row = q(out).get("a")
    assert(row.get("sf1.0_basis").asText() == "toRdd")
    assert(row.get("sf3.0_basis").asText() == "toRdd")
  }

  test("merge: a PARTIAL probe into a legacy row must NOT claim " +
       "row-level toRdd basis for the surviving count()-era cells") {
    // prev row `a` has sf1.0+sf3.0 with no per-cell stamps (pre-r16
    // board shape); re-probe only sf1.0 on the new basis
    val now = BenchScale.renderArtifact(
      Seq(("a", Seq((1.0, 1.1)), false)), 1)
    val m = q(BenchScale.mergeArtifacts(prev, now, 1))
    val row = m.get("a")
    assert(row.get("sf1.0_basis").asText() == "toRdd") // probed cell stamped
    assert(row.get("sf3.0") != null)                   // stale cell survives
    assert(row.get("sf3.0_basis") == null)             // ...unstamped
    assert(row.get("basis") == null,                   // row-level removed
      "partial probe must not misattribute provenance to the whole row")
  }

  test("merge: a FULL re-probe covering every cell restores the " +
       "row-level basis") {
    val now = BenchScale.renderArtifact(
      Seq(("a", Seq((1.0, 1.1), (3.0, 3.3)), false)), 1)
    val m = q(BenchScale.mergeArtifacts(prev, now, 1))
    assert(m.get("a").get("basis").asText() == "toRdd")
  }

  test("render: zero rows still yields parseable JSON (empty queries)") {
    // main drops fully-fenced rows BEFORE render; an all-fenced run
    // renders an empty queries object, which must parse (the old
    // code emitted `{,"top_decade_exponent":null}` — invalid — and
    // the merge fallback then clobbered the board with it)
    val out = BenchScale.renderArtifact(Nil, 1)
    assert(q(out).size() == 0)
    val m = q(BenchScale.mergeArtifacts(prev, out, 1))
    assert(m.get("a").get("sf3.0").asDouble() == 3.0) // board intact
  }
}
