package graft

/** The measured quadratic fence (Verify.measuredQuadraticReason) must
  * be a MEASUREMENT, not a name list: the same row passes the gate on
  * a corpus whose census is small and trips it only when its own
  * candidate bound crosses the 64-per-row routing rule. Pinned at
  * sf0.01, where the censuses are cheap and the numbers are known
  * (prefix bound ~13/doc, block pairs ~1/part, pinned-cell bound
  * n/16 > 64 once n > 1024 vectors).
  */
class VerifyFenceSpec extends SparkSpec {

  test("prefix census below the gate does NOT fence the exact-Jaccard " +
    "rows at sf0.01") {
    assert(Verify.measuredQuadraticReason(spark, sf("sf0.01"),
      "dedup_ngram_jaccard").isEmpty)
    assert(Verify.measuredQuadraticReason(spark, sf("sf0.01"),
      "dedup_cluster_cc").isEmpty)
  }

  test("block census below the gate does NOT fence entity_resolution_e2e " +
    "at sf0.01") {
    assert(Verify.measuredQuadraticReason(spark, sf("sf0.01"),
      "entity_resolution_e2e").isEmpty)
  }

  test("the pinned-cells bound does NOT trip at sf0.01 (500 vectors, " +
    "bound 31/vec < 64) and DOES at sf0.1 (2,000 vectors, 125/vec), " +
    "with the measured numbers in the reason") {
    assert(Verify.measuredQuadraticReason(spark, sf("sf0.01"),
      "dedup_semdedup").isEmpty)
    val r = Verify.measuredQuadraticReason(spark, sf("sf0.1"),
      "dedup_semdedup")
    assert(r.isDefined)
    assert(r.get.contains("cells=8"))
    assert(r.get.contains("dedup_semdedup_scaled"))
    // reason carries the measured vector count, not a canned string
    val n = Tables.t(spark, sf("sf0.1"), "embeddings").count()
    assert(r.get.contains(s"over $n vectors"))
  }

  test("the cdc chunk-pair census does NOT fence at sf0.01 (3.4 " +
    "cand/doc < 64) — the fence is a measurement, not the name") {
    assert(Verify.measuredQuadraticReason(spark, sf("sf0.01"),
      "dedup_cdc_chunks").isEmpty)
  }

  test("the cdc chunk-pair census DOES fence at sf1 (241 cand/doc), " +
    "naming the measured bound and the capped sibling") {
    val r = Verify.measuredQuadraticReason(spark,
      sfRepo("testdata-sf1"), "dedup_cdc_chunks")
    assert(r.isDefined)
    assert(r.get.contains("dedup_cdc_chunks_capped"))
    // 50004 = 50000 organic + the 4 r18 planted docs (LSH pair + liveness pair)
    assert(r.get.contains("over 50004 docs"))
  }

  test("unfenced names never produce a reason") {
    assert(Verify.measuredQuadraticReason(spark, sf("sf0.01"),
      "q1_agg").isEmpty)
  }
}
