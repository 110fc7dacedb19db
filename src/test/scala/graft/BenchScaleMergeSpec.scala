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
}
