package graft

/** CI gate for the runtime work-count censuses (WORKCOUNTS.json).
  *
  * The r13 IVF-PQ bug — Catalyst planned the index scan's DPP filter
  * to `dynamicpruningexpression(true)` and the "pruned" scan read all
  * 8 cells — passed the plan-shape SUBSTRING pin vacuously and was
  * only caught by a manually-run census. These asserts run the same
  * probes in `sbt test`, so the next planned-away optimization fails
  * CI instead of waiting for a human probe. Bounds cite
  * WORKCOUNTS.json (sf1/sf3/sf10 cells) and the sf0.01 values
  * measured 2026-08-15; they gate INVARIANTS (≤ bounds, contrast
  * ratios), not wall-clock.
  */
class WorkCountSpec extends SparkSpec {
  private val dir = sf("sf0.01")

  test("snm: sorted-neighborhood candidates respect the 8n bound") {
    // WORKCOUNTS sf1: 1,564,000 ≤ 1,600,000; sf0.01 measured 1,639.
    val c = WorkCount.snmCensus(spark, dir)
    assert(c.rows > 0)
    assert(c.candidates <= c.bound8n,
      s"SNM candidates ${c.candidates} exceed 8n=${c.bound8n}")
  }

  test("lsh: band-bucket candidates stay flat per doc") {
    // The routed pair path's linear claim: WORKCOUNTS pins 183-186
    // milli-candidates/doc at sf1/sf3/sf10 (sf0.01 measured 168). A
    // regression that floods buckets (hash change, band misconfig)
    // shows up as cand/doc exploding — gate an order of magnitude of
    // headroom over the pinned band, far below the exact path's
    // 13,358 here.
    val c = WorkCount.lshCensus(spark, dir)
    assert(c.nDocs > 0)
    assert(c.candPerDocE3 <= 2000,
      s"LSH cand/doc ${c.candPerDocE3}e-3 blew past the pinned " +
        "flat band (~170-190e-3; gate 2000e-3)")
  }

  test("prefix census predicts the exact path's saturation (routing contrast)") {
    // The diagnostic that justifies pairsAuto's exact->LSH routing:
    // on this corpus the exact PPJoin bound per doc dwarfs the
    // LSH-bucketed bound at every SF (sf0.01: 13,358 vs 168 e-3;
    // sf1: 1,098,435 vs 183). Gate the contrast, not absolute cost.
    val p = WorkCount.prefixCensus(spark, dir)
    val l = WorkCount.lshCensus(spark, dir)
    assert(p.candPerDocE3 > 10 * l.candPerDocE3,
      s"prefix cand/doc ${p.candPerDocE3}e-3 no longer dominates " +
        s"LSH's ${l.candPerDocE3}e-3 — the routing rationale changed; " +
        "re-measure WORKCOUNTS.json before trusting pairsAuto")
  }

  test("cdc: the fence's census still predicts the quadratic regime at sf1") {
    // dedup_cdc_chunks is census-fenced at sf >= 1 (Verify
    // .measuredQuadraticReason): the fence only holds if the census
    // keeps measuring what it measured (sf1: 12,086,120 pairs over
    // 50,000 docs = 241/doc, max chunk freq 2,494 — WORKCOUNTS.json
    // cdc_pairs). If corpus regeneration or a chunking change drops
    // the bound under the 64/doc routing gate, the fence silently
    // stops firing and the sweep pays the n² join again — surface
    // that here instead. Also pins the sibling's lever: stop-chunk
    // suppression at f <= 64 bounds pairs by 32*chunk_rows.
    val c = WorkCount.cdcCensus(spark, sfRepo("testdata-sf1"))
    // 50004 = 50000 organic + the 4 r18 planted docs (LSH pair + liveness pair)
    assert(c.nDocs == 50004L, s"sf1 corpus changed: ${c.nDocs} docs")
    assert(c.candPairsBound > 64L * c.nDocs,
      s"cdc census bound ${c.candPairsBound} no longer exceeds the " +
        s"64/doc gate over ${c.nDocs} docs — the dedup_cdc_chunks " +
        "fence has stopped firing; re-measure WORKCOUNTS.json")
    assert(c.maxFreq > 64,
      s"max chunk freq ${c.maxFreq} at sf1 — the capped sibling's " +
        "suppression would be a no-op")
  }

  test("wedge: the co-purchase graph grows linearly (no hub explosion)") {
    // The premise under every graph_* row's scale claim — and under
    // the r14 attribution of graph_clustering_coeff's sf10 cell to
    // the single box's RAM rather than the plan: wedges Σ deg(deg−1)/2
    // grow ∝ SF (measured 1.0003 sf3→sf10, 13.8M→147.8M sf0.01→sf0.1)
    // with a FLAT max degree (206→266 across three decades). If
    // testdata regeneration ever skews the co-purchase graph (a hub
    // part in every order), wedge work turns quadratic and every
    // graph row's exponent claim is stale — surface it here.
    val lo = WorkCount.wedgeCensus(spark, sf("sf0.01"))
    val hi = WorkCount.wedgeCensus(spark, sf("sf0.1"))
    val ratio = hi.wedges.toDouble / math.max(1L, lo.wedges)
    assert(ratio > 5 && ratio < 30,
      s"wedge growth $ratio for 10x data — no longer the linear band " +
        "(WORKCOUNTS.json wedge); re-attribute the graph rows' exponents")
    assert(hi.maxDeg < 10 * lo.maxDeg,
      s"max degree ${lo.maxDeg} -> ${hi.maxDeg}: hub explosion")
  }

  test("ivf: persisted-index search reads only probed cells") {
    // The r13 bug class: one query probes nprobe=2 cells, so the
    // partition-pruned scan must READ exactly ≤ 2 of the 8 on-disk
    // cells (WORKCOUNTS sf1/sf10: 2 of 8). If the static cell filter
    // is ever dropped or planned away again, the scan reads all
    // cells and this fails.
    val c = WorkCount.ivfCensus(spark, dir)
    assert(c.scansFound, "index FileSourceScanExec not found in plan")
    assert(c.totalCellsOnDisk > 2,
      s"index has ${c.totalCellsOnDisk} cells — too few for the " +
        "prune assert to mean anything")
    assert(c.oneQueryPartitionsRead <= c.nprobe,
      s"one-query search read ${c.oneQueryPartitionsRead} partitions " +
        s"of ${c.totalCellsOnDisk} (must be ≤ nprobe=${c.nprobe}: " +
        "the cell prune was planned away — the r13 DPP-to-true bug)")
    // the 5-query catalog batch may legitimately probe all cells, but
    // never MORE than its own probed-cell bound (5 queries × nprobe)
    assert(c.catalogPartitionsRead <= math.min(c.totalCellsOnDisk, 10),
      s"catalog batch read ${c.catalogPartitionsRead} partitions, " +
        s"over min(total=${c.totalCellsOnDisk}, 5*nprobe=10)")
  }

  test("bcast: the broadcast-allowlist builds stay measured, not argued") {
    // The mechanized criterion behind PlanShapeSpec's corpus-grain-
    // broadcast allowlist (r14 verdict item 5, landed r16): each
    // allowlisted query's ACTUAL runtime broadcast builds at sf1,
    // from BroadcastExchangeExec metrics. r16 measured cells
    // (WORKCOUNTS.json bcast): sql_tpch_q18's HAVING>300 key set =
    // 2,488 rows / 1.2 MB (NOT the "~60 keys/SF" the allowlist
    // comment claimed — it is a ~0.17% FRACTION of orders, so it
    // grows ∝ data); sql_in_subquery's HAVING>150 set = 275,687 rows
    // / 20 MB (~27% of orders). Both estimates GROW with input, so
    // the planner itself flips them to shuffle joins between sf1 and
    // sf10 (measured: at sf10 q18 broadcasts only the customer dim
    // and in_subquery broadcasts NOTHING) — the r14 fear of a static
    // under-estimate broadcasting an unbounded side never
    // materializes on this corpus. What this gate pins: no single
    // broadcast build of an allowlisted query at sf1 exceeds 64 MB
    // (the session threshold — a bigger ACTUAL means estimate and
    // actual diverged by enough to matter), and q18's key-set build,
    // when broadcast, stays in the low-thousands band (a selectivity
    // collapse — HAVING threshold edit, quantity-distribution skew —
    // would flood it).
    val cells = WorkCount.bcastCensus(spark, sfRepo("testdata-sf1"),
      Seq("sql_tpch_q18", "sql_in_subquery", "ann_pq_adc"))
    val byQuery = cells.toMap
    for ((q, builds) <- cells; b <- builds)
      assert(b.bytes < 64L * 1024 * 1024,
        s"$q broadcast build (${b.cols}) = ${b.bytes} bytes at sf1 — " +
          "over the 64m session threshold; the allowlist justification " +
          "no longer holds, re-measure WORKCOUNTS.json bcast")
    val q18Keys = byQuery("sql_tpch_q18")
      .filter(b => b.cols == "l_orderkey")
    q18Keys.foreach { b =>
      assert(b.rows < 25000,
        s"q18 HAVING key-set build = ${b.rows} rows at sf1 (measured " +
          "band ~2,500): selectivity collapsed, the broadcast is no " +
          "longer threshold-bounded")
    }
    // ann_pq_adc's shortlist is rank-filtered: queries × rerank = 250
    val shortlist = byQuery("ann_pq_adc")
      .filter(_.cols.startsWith("query_id"))
    assert(shortlist.nonEmpty, "ann_pq_adc shortlist build not found")
    shortlist.foreach { b =>
      assert(b.rows <= 250,
        s"ann_pq_adc shortlist = ${b.rows} rows — rank filter no " +
          "longer bounds the broadcast at queries*rerank")
    }
  }

  test("model: the expression-constant models stay vocabulary-bounded") {
    // r16 verdict item 3: the charlm/langid "bounded model" claims
    // were argued from structure; WORKCOUNTS `model` measured them —
    // 377 charlm trigram types and 250 langid profile rows (5 present
    // languages × top-50) at sf0.01, sf1 AND sf10, dead flat across
    // three decades. Gate the two-decade sf0.01→sf1 growth here (CI
    // provisions sf1; sf10 stays a manual sweep): a vocabulary that
    // starts scaling with the corpus moves LONG before it reaches the
    // 64 Ki collect cap, so this fails `sbt test` while the driver
    // collect is still a few thousand rows.
    val lo = WorkCount.modelCensus(spark, dir)
    val hi = WorkCount.modelCensus(spark, sfRepo("testdata-sf1"))
    assert(lo.charlmEntries > 0 && lo.langidEntries > 0)
    assert(hi.charlmEntries <= 4 * lo.charlmEntries,
      s"charlm model grew ${lo.charlmEntries} -> ${hi.charlmEntries} " +
        "over sf0.01 -> sf1 (measured flat at 377): the trigram " +
        "vocabulary has started scaling with the corpus — re-measure " +
        "WORKCOUNTS.json model and re-justify the collected-constant " +
        "plan before raising CharlmScore.MaxModelEntries")
    assert(hi.langidEntries == lo.langidEntries,
      s"langid profile rows ${lo.langidEntries} -> ${hi.langidEntries}: " +
        "the top-50 × languages definition no longer bounds the table")
    // the caps stay measured×margin, not round numbers nobody derived:
    // a cap raise must come with a fresh census (this asserts the
    // invariant that makes boundedCollect's gate meaningful)
    assert(graft.functions.expressions.CharlmScore.MaxModelEntries
      <= 200 * hi.charlmEntries,
      "CharlmScore.MaxModelEntries drifted past 200× the measured " +
        "model — re-run WorkCount model and re-size")
  }
}
