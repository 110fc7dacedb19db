package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

import graft.{SparkEntry, SparkSpec}

/** Plan-shape invariants for the scale claims the operators document —
  * the properties that decide 100 TB behavior, pinned so a refactor
  * that silently reintroduces a shuffle or drops a broadcast fails CI,
  * not the cluster. Assertions read the pre-execution formatted plan
  * (AQE's post-run toString elides finished query stages).
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.queryExecution.explainString(FormattedMode)
  }

  test("bloom_semi_join: bloom filter prunes BEFORE the join and the " +
       "semi join broadcasts the dimension side") {
    val p = plan("bloom_semi_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"expected broadcast left-semi join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact side must not sort-merge:\n$p")
    // the UDF probe is a Filter on the fact scan side, upstream of the
    // join (the long-key cast folds away, so match the bare UDF call)
    assert(p.contains("UDF(l_orderkey") || p.contains("UDF(cast(l_orderkey"),
      s"bloom pre-filter missing from the fact scan:\n$p")
  }

  test("decontaminate: benchmark shingles broadcast; corpus never " +
       "sort-merges") {
    val p = plan("decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast probe:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$p")
  }

  test("argmax_order aggregates without any Window/sort-per-partition") {
    val p = plan("argmax_order")
    assert(!p.contains("Window"), s"argmax must not use a window:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"expected plain aggregation:\n$p")
  }

  test("pack_chunks: the prefix sum is narrow mapPartitions over the " +
       "checkpointed range layout, never a global single-partition window") {
    val p = plan("pack_chunks")
    // the range exchange lives behind the localCheckpoint boundary
    // (freed by the ContextCleaner); the outer plan must be the narrow
    // second pass over those materialized blocks
    assert(p.contains("MapPartitions"), s"expected narrow passes:\n$p")
    assert(p.contains("Scan ExistingRDD") || p.contains("LogicalRDD"),
      s"expected the checkpointed range layout as the scan source:\n$p")
    assert(!p.contains("Window"),
      s"global-window prefix sum is the anti-pattern this operator avoids:\n$p")
  }

  test("sample_stratified: rate table broadcasts; events never " +
       "sort-merge") {
    val p = plan("sample_stratified")
    assert(p.contains("BroadcastHashJoin"), s"rate table must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"events must not sort-merge:\n$p")
  }

  test("correlated EXISTS de-correlates to a semi join (no per-row " +
       "re-execution)") {
    val p = plan("sql_exists_correlated")
    assert(p.contains("LeftSemi"), s"expected a left-semi join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"EXISTS must not plan a nested loop:\n$p")
  }

  test("NOT IN plans a null-aware anti join, not a cartesian check") {
    val p = plan("sql_not_in_subquery")
    assert(p.contains("LeftAnti"), s"expected an anti join:\n$p")
    assert(!p.contains("CartesianProduct"), s"must not be cartesian:\n$p")
  }

  test("LATERAL ... ORDER BY/LIMIT de-correlates into a partitioned " +
       "window top-k, not per-outer-row re-execution") {
    val p = plan("sql_lateral_topn")
    assert(p.contains("Window"), s"expected row_number top-k rewrite:\n$p")
    assert(!p.contains("CartesianProduct"), s"must not be cartesian:\n$p")
  }

  test("events_funnel: three stacked Window stages share ONE user_id " +
       "exchange — a funnel is not three self-joins") {
    val p = plan("events_funnel")
    assert("(?m)^.*Window".r.findAllIn(p).size >= 3,
      s"expected 3 stacked Window operators:\n$p")
    // FormattedMode separates node names from Arguments: count the
    // partitioning expressions, which only Exchange nodes print
    val exchanges = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(exchanges == 1,
      s"expected exactly one user_id exchange, got $exchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"funnel must not be join-based:\n$p")
  }

  test("correlated scalar subquery (per-group min) de-correlates to " +
       "aggregate + join — the inner query runs once") {
    val p = plan("sql_correlated_scalar_min")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"expected the grouped-min aggregate:\n$p")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"must not re-execute per outer row:\n$p")
  }

  test("events_interval_overlap: bucketized equi-join, never a " +
       "cartesian/nested-loop theta join") {
    val p = plan("events_interval_overlap")
    assert(p.contains("Generate"), s"expected the bucket-cover explode:\n$p")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"overlap join must stay an equi-join:\n$p")
  }

  test("sample_weighted_systematic: distributed prefix sum (no global " +
       "single-partition window), 1-row total broadcasts") {
    val p = plan("sample_weighted_systematic")
    assert(!p.contains("Window"),
      s"prefix sum must ride Packing.withRunningOffset, not a global window:\n$p")
    assert(p.contains("MapPartitions"), s"expected the narrow passes:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row total must broadcast:\n$p")
  }

  test("layout_hilbert_key: native expression stays inside whole-stage " +
       "codegen — no UDF, no window, no join") {
    val p = plan("layout_hilbert_key")
    assert(p.contains("graft_hilbert_index"),
      s"expected the native hilbert expression:\n$p")
    assert(!p.contains("UDF") && !p.contains("Window") &&
           !p.toLowerCase.contains("join"),
      s"hilbert key is a pure map-side projection:\n$p")
    // codegen membership only shows in the EXECUTED plan under AQE;
    // collect() executes THIS queryExecution (count() plans a new one).
    // In simpleString form a codegen'd operator is starred: `*(n) Project`.
    val df = SparkEntry.queries("layout_hilbert_key")(spark, sf("sf0.001"))
    df.collect()
    val exec = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[.*graft_hilbert_index""".r
        .findFirstIn(exec).isDefined,
      s"hilbert projection must be inside a whole-stage-codegen span:\n$exec")
  }

  test("text_pii_redact: the corpus rewrite is one scan with no data " +
       "exchange except the output sort") {
    val p = plan("text_pii_redact")
    assert(!p.contains("Join"), s"redaction must not join:\n$p")
    // exactly one Exchange node: the final rangepartitioning sort
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected only the output-sort exchange:\n$p")
    assert(p.contains("rangepartitioning"),
      s"the single exchange must be the output sort:\n$p")
  }

  test("text_gopher_repetition: one scan, one native projection, no " +
       "exchange except the output sort") {
    val p = plan("text_gopher_repetition")
    // per-doc stats computed row-locally by graft_gopher_rep: the
    // r16 rewrite replaced the explode → (doc, n, gram) shuffle →
    // per-doc reduce → spine join (two corpus-words-sized exchanges)
    // with a scan-speed projection — the pii_redact class.
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected exactly one corpus scan:\n$p")
    assert(!p.contains("Join"), s"per-doc stats must not join:\n$p")
    assert(!p.contains("Generate"),
      s"a Generate means the gram explode re-entered the plan:\n$p")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1 && p.contains("rangepartitioning"),
      s"the single exchange must be the output sort:\n$p")
    // the struct is evaluated once per row — a second graft_gopher_rep
    // in the plan means CollapseProject duplicated the expression
    assert("graft_gopher_rep".r.findAllIn(p).size <= 2, // tree + detail
      s"graft_gopher_rep must be evaluated once per row:\n$p")
  }

  test("dedup_semdedup: pairs build on a cell equi-join, never a " +
       "data-sized cartesian/nested loop") {
    val p = plan("dedup_semdedup")
    // the only BroadcastNestedLoopJoin allowed is the 1-row centroid
    // array cross (it scans no parquet on its build side beyond the
    // folded aggregate); the pair join itself must be an equi hash join
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"pair join must be an equi-join on cell:\n$p")
    assert(!p.contains("CartesianProduct"), s"must not be cartesian:\n$p")
  }

  test("text_charlm_surprisal: scoring is one scan + the native model " +
       "projection — the corpus never shuffles or joins to score") {
    // r16 rewrite: the trained model (trigram-type grain) is collected
    // — gated by CharlmScore.MaxModelEntries — and scoring became a
    // scan-speed projection; the returned frame's plan is scan →
    // graft_charlm_score → sort. (Through r13 the scoring join's
    // broadcast pin passed VACUOUSLY while Catalyst broadcast the
    // exploded corpus — r14 audit; the join no longer exists to get
    // wrong.) The train subplan runs eagerly inside the builder, so
    // Bench still times it — countPrunedScans cannot prune it either.
    val p = plan("text_charlm_surprisal")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected exactly one scoring scan:\n$p")
    assert(!p.contains("Join"), s"scoring must not join:\n$p")
    assert(!p.contains("Generate"),
      s"a Generate means the score-side explode re-entered the plan:\n$p")
    assert(p.contains("graft_charlm_score"),
      s"scoring must be the native model projection:\n$p")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1 && p.contains("rangepartitioning"),
      s"the single exchange must be the output sort:\n$p")
  }

  test("bucketed_join_colocated: the sort-merge join reads aligned " +
       "buckets with no Exchange of its own") {
    val p = plan("bucketed_join_colocated")
    assert(p.contains("SortMergeJoin"), s"expected a sort-merge join:\n$p")
    // the only shuffles allowed are the post-join aggregate and the
    // final sort — the join inputs come straight from bucketed scans
    val exchanges = p.linesIterator
      .count(l => l.matches(""".*\(\d+\) Exchange.*"""))
    assert(exchanges <= 2,
      s"join sides must not shuffle (found $exchanges exchanges):\n$p")
    assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
      s"scan must be bucket-aware:\n$p")
  }

  test("graph_triangle_count: wedge closing is equi-joins only — no " +
       "cartesian, no broadcast of the edge list") {
    val p = plan("graph_triangle_count")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"triangle joins must be hash/merge equi-joins:\n$p")
  }

  // ---- one-corpus-scan invariants: a frame that feeds two consumers
  // must be materialized, never re-derived from a second scan of the
  // corpus. The checkpointed subtree shows up as Scan ExistingRDD; the
  // residual parquet scans are counted exactly.

  test("text_tfidf_topk: the corpus is exploded once — tf is " +
       "materialized, df/join read it, only the 1-row N re-scans") {
    val p = plan("text_tfidf_topk")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1,
      s"expected one residual parquet scan (the N count), got $scans:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"tf frame must be the materialized scan source:\n$p")
    assert(!p.contains("Generate"),
      s"a Generate means the corpus explode re-entered the plan:\n$p")
  }

  // charlm/langid train on ONE corpus explode (never checkpointed —
  // the exploded frame is 10-20× its input; the r6 checkpoint was a
  // stable 10× bench regression) and since r16 SCORE row-locally:
  // charlm ships its vocabulary-grain model inside a native
  // expression, langid intersects against the 1-row profile
  // broadcast. The score side of both is pinned join-free above.

  test("text_langid_ngram: scoring is one scan + the native profile " +
       "projection — the corpus never shuffles or joins to score") {
    // r16 rewrite: the score side's (doc_id, tri) distinct + profile
    // join + per-doc reduce + spine join became graft_langid_score
    // with the ≤200-entry profile table (bounded by DEFINITION:
    // top-50 × 4 langs) shipped as an expression constant; the train
    // explode runs eagerly inside the builder, so the returned
    // frame's plan is scan → score → sort.
    val p = plan("text_langid_ngram")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected exactly one scoring scan:\n$p")
    assert(!p.contains("Join"), s"scoring must not join:\n$p")
    assert(!p.contains("Generate"),
      s"a Generate means the score-side explode re-entered the plan:\n$p")
    assert(p.contains("graft_langid_score"),
      s"scoring must be the native profile projection:\n$p")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1 && p.contains("rangepartitioning"),
      s"the single exchange must be the output sort:\n$p")
  }

  test("text_pmi_bigrams: bigram/unigram aggregates are materialized — " +
       "totals and marginal joins re-read them, never the corpus") {
    val p = plan("text_pmi_bigrams")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 0,
      s"every consumer must read the materialized counts, got $scans corpus scans:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"count frames must be the materialized scan sources:\n$p")
  }

  test("agg_topk_heap: per-group top-k is a bounded-heap aggregate — " +
       "no Window, no per-group sort before the aggregate") {
    val p = plan("agg_topk_heap")
    assert(!p.contains("Window"),
      s"heap top-k must not plan a window sort:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate") ||
           p.contains("HashAggregate"),
      s"expected the two-phase aggregate:\n$p")
  }

  test("graph_common_neighbors: adjacency and degrees read materialized " +
       "frames — the pp self-join never re-evaluates, pairs stay " +
       "equi-joined") {
    val p = plan("graph_common_neighbors")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 0,
      s"the lineitem scan must live behind the checkpoint, got $scans:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"canonical edges + degrees must be materialized scan sources:\n$p")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"the wedge join must be an equi-join on the middle node:\n$p")
  }

  test("graph_clustering_coeff: the pp self-join is evaluated once — " +
       "degree, orientation and the final join all read materialized " +
       "frames") {
    val p = plan("graph_clustering_coeff")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 0,
      s"the lineitem scan must live behind the checkpoint, got $scans:\n$p")
    assert(p.contains("Scan ExistingRDD"),
      s"canonical edges + degrees must be materialized scan sources:\n$p")
  }

  test("ann_ivfpq_adc: the ADC candidate scan is a hash join on the " +
       "probed cell key — never a full-corpus cross join") {
    val p = plan("ann_ivfpq_adc")
    // the candidate join carries the self-exclusion residual; in the
    // brute-force ADC form (Pq.topK) that residual sits on a
    // BroadcastNestedLoopJoin streaming the WHOLE encoded corpus —
    // here it must sit on a hash join keyed by the probed cell, so
    // only probed-cell rows are ADC-scored (and with the encoded
    // table persisted partitioned by cell, unprobed cells are never
    // even read)
    val blocks = p.split("\n\n")
    val adcJoin = blocks.find(b => b.contains("BroadcastHashJoin") &&
      b.contains("Join condition: NOT (id#"))
    assert(adcJoin.isDefined,
      s"ADC candidate join (with the id != query_id residual) must be " +
        s"a BroadcastHashJoin:\n$p")
    assert(adcJoin.get.contains("Left keys [1]: [cell#") ||
           adcJoin.get.contains("Right keys [1]: [cell#"),
      s"ADC candidate join must be keyed on cell:\n${adcJoin.get}")
  }

  test("ann_ivfpq_residual: the residual ADC candidate scan is also a " +
       "hash join on the probed cell key") {
    val p = plan("ann_ivfpq_residual")
    val blocks = p.split("\n\n")
    val adcJoin = blocks.find(b => b.contains("BroadcastHashJoin") &&
      b.contains("Join condition: NOT (id#"))
    assert(adcJoin.isDefined,
      s"residual ADC candidate join must be a BroadcastHashJoin:\n$p")
    assert(adcJoin.get.contains("Left keys [1]: [cell#") ||
           adcJoin.get.contains("Right keys [1]: [cell#"),
      s"residual ADC candidate join must be keyed on cell:\n${adcJoin.get}")
  }

  test("ann_ivfpq_persisted: the cell-partitioned index scan carries a " +
       "LITERAL cell IN (...) partition filter — unprobed cells never " +
       "listed, let alone read") {
    // The r13 WorkCount runtime census caught the previous pin
    // matching vacuously: the plan DID contain "dynamicpruning", but
    // as dynamicpruningexpression(true) — Catalyst's broadcast-reuse
    // lookup fails for this plan in both AQE modes and the rewritten
    // filter read ALL 8 cells (20k rows for a 2-cell probe). The
    // operator now plants the probed cells as a STATIC IN on the
    // partition column (searchIvfPq collects the bounded
    // nprobe·|queries| cell ids first), so the pin asserts the
    // literal filter and rejects the planned-away DPP form.
    val p = plan("ann_ivfpq_persisted")
    val idxScan = p.split("\n\n").find(b =>
      b.contains("Scan parquet") && b.contains("graft_ivfpq_idx"))
    assert(idxScan.isDefined, s"persisted index scan missing:\n$p")
    assert(idxScan.get.contains("cell") && idxScan.get.contains(" IN ("),
      s"expected a literal cell IN (...) PartitionFilter on the index " +
        s"scan:\n${idxScan.get}")
  }

  test("dedup_repeated_spans: the shared-span census aggregates min/max " +
       "per hash — no distinct-Expand, and the doc aggregate partial-" +
       "combines map-side") {
    val p = plan("dedup_repeated_spans")
    // count_distinct plans an Expand that shuffles the full span set;
    // the min≠max census must keep the exchange one-row-per-hash
    assert(!p.contains("Expand"),
      s"distinct-expand reintroduced into the span census:\n$p")
    // the census must reach the exchange as a partial aggregate
    // (map-side combine), not shuffle raw span rows
    assert(p.contains("HashAggregate"), s"expected hash aggregates:\n$p")
    // assembly stays an inner join on the hash (a cardinality-
    // preserving outer assembly is optimized away under count() and
    // the bench rows then measure nothing)
    assert(!p.contains("LeftOuter"),
      s"outer assembly is count()-prunable; keep the inner join:\n$p")
    // hstats is one row per DISTINCT SPAN HASH — data-sized (∝ corpus
    // bytes), never broadcastable: at sf10 Catalyst's compile-time
    // estimate slipped under the 64m threshold, the broadcast collect
    // shipped >1 GiB of build rows to the driver and the query DIED on
    // spark.driver.maxResultSize (r14 sweep). The join must stay a
    // shuffle join (both sides hash-partition on h; the census side
    // reuses its groupBy exchange) at EVERY sf.
    assert(!p.contains("BroadcastHashJoin"),
      s"the data-sized span census must never broadcast:\n$p")
  }

  test("catalog-wide: no corpus-grain broadcast build with a guessed " +
       "size estimate (the spans/charlm maxResultSize class)") {
    // A broadcast build whose output carries a raw per-entity key,
    // whose subtree scans a fact table unfiltered, and whose
    // cardinality passes through an aggregate/explode/window/join has
    // a GUESSED row estimate ∝ data: at some SF the estimate dips
    // under the threshold and the build-side collect ships the corpus
    // to the driver. r14 found and fixed five: dedup_repeated_spans
    // (died on maxResultSize at sf10), text_charlm_surprisal (the
    // exploded corpus as build side — the "lm must broadcast" pin was
    // passing vacuously), text_gopher_repetition, dedup_incremental,
    // join_left_enrich, plus the two SQL-text IN-subquery rows. This
    // sweeps the corpus-joining families so the next estimate flip
    // fails CI. Scan+filter-only builds are exempt (file-size-based
    // estimates self-correct across SFs).
    val allow = Map(
      // the exact-rerank shortlist: carries vec_id and derives through
      // a window, but is BOUNDED at queries×rerank rows by its rank
      // filter — broadcast(shortlist) is the intended plan (Pq.scala)
      "ann_pq_adc" -> "rank-filtered shortlist, ≤ queries×rerank rows",
      // the HAVING-qualifying orderkey sets: aggregate-derived, and
      // (r16 bcast census, WORKCOUNTS.json) a constant FRACTION of
      // orders — q18 2,488 rows / 1.2 MB at sf1 (~0.17%),
      // in_subquery 275,687 / 20 MB (~27%) — so they grow ∝ data,
      // NOT the "~60 keys/SF" this comment used to claim. The
      // broadcast stays correct because the agg's row ESTIMATE grows
      // with input too: by sf10 both builds exceed the 64m threshold
      // and the planner itself flips them to shuffle joins (measured:
      // q18 broadcasts only the customer dim at sf10, in_subquery
      // broadcasts nothing). r14 MEASURED the MERGE guard instead:
      // it made q18's sf10 cell 2.7 s → 51.5 s (19×) by forcing the
      // flip at every SF — reverted; the WorkCountSpec bcast gate now
      // asserts the sf1 sizes stay inside the threshold band.
      "sql_tpch_q18" -> "HAVING>300 set, small fraction; planner flips to shuffle by sf10 (bcast census)",
      "sql_in_subquery" -> "HAVING>150 set, 20 MB at sf1; planner flips to shuffle by sf10 (bcast census)")
    val fams = "^(text_|dedup_|ann_|corpus_|events_|sql_|join_)".r
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => fams.findFirstIn(n).isDefined)
      .filterNot(allow.contains)
    // A query that fails to BUILD is a Verify problem, not a
    // broadcast-shape problem — but swallowing it silently would let
    // the gate pass vacuously for that query (advisor r14). Collect
    // failures and fail loudly: the gate either audited a query or
    // names why it could not.
    val buildFailures = Seq.newBuilder[String]
    val offenders = names.flatMap { n =>
      val hits =
        try graft.PlanAudit.corpusGrainBroadcasts(
          SparkEntry.queries(n)(spark, sf("sf0.001")))
        catch { case t: Throwable =>
          buildFailures += s"$n: ${t.getClass.getSimpleName} ${t.getMessage}"
          Nil
        }
      if (hits.isEmpty) Nil else Seq(s"$n: ${hits.mkString("; ")}")
    }
    // One combined assert: a single build failure must not mask real
    // offenders found in the same run (advisor r15) — the message
    // carries BOTH lists so one CI run surfaces all gate information.
    val failed = buildFailures.result()
    val problems =
      failed.map(f => s"BUILD-FAILURE (gate could not audit): $f") ++
        offenders.map(o => s"CORPUS-GRAIN BROADCAST (hint the shuffle " +
          s"join or justify in the allowlist): $o")
    assert(problems.isEmpty,
      s"broadcast gate found ${failed.size} build failure(s) and " +
        s"${offenders.size} offender(s):\n${problems.mkString("\n")}")
  }

  test("catalog-wide: no partition-less WindowExec outside the bounded-" +
       "frame allowlist (the single-reducer total-order scale-killer)") {
    // `Window.orderBy` with no partitionBy moves ALL data to one
    // partition. The only acceptable carriers are frames PROVABLY
    // bounded at any data scale; everything raw- or aggregate-grain
    // must go through graft.operators.TotalOrder (range exchange +
    // per-partition offset broadcast). A new query that reintroduces
    // a global window fails here, not on the cluster.
    val allow = Map(
      "basket_size_distribution" -> 1, // distinct basket sizes: bounded histogram
      "interpolate_linear_days" -> 3,  // calendar day spine: bounded by span
      "text_zipf_slope" -> 1           // top-1000 token ranks: fixed k
    )
    val bad = SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
      val g = graft.PlanAudit.globalWindowCount(
        SparkEntry.queries(n)(spark, sf("sf0.001")))
      if (g != allow.getOrElse(n, 0)) Some(s"$n: $g global windows " +
        s"(allowed ${allow.getOrElse(n, 0)})") else None
    }
    assert(bad.isEmpty,
      s"partition-less WindowExec outside the allowlist:\n${bad.mkString("\n")}")
  }

  test("try_arith: one scan + native projection — no exception-path " +
       "cast, no exchange except the output sort") {
    // r17 rewrite: try_cast(... AS INT) reaches null through a thrown-
    // and-caught exception per failing value (~15 µs each; every
    // l_returnflag fails) — the row spent 10.2 of its 9.4 s sf0.1
    // wall in that one column. graft_try_int parses exception-free.
    val p = plan("try_arith")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected exactly one scan:\n$p")
    assert(p.contains("graft_try_int"),
      s"the int parse must be the native exception-free expression:\n$p")
    assert(!p.contains("try_cast(l_returnflag"),
      s"the exception-path string->int try_cast re-entered the plan:\n$p")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1 && p.contains("rangepartitioning"),
      s"the single exchange must be the output sort:\n$p")
  }

  test("sketch_hll_distinct: no Expand — the sketch buffer must never " +
       "be keyed per distinct value") {
    // r17 rewrite: countDistinct + HLL in one aggregate plans through
    // Expand, whose partial aggregate builds a ~12 KB rsd-1% HLL
    // register array PER DISTINCT KEY (~1.2 GB at sf0.1; an OOM, not
    // a slowdown, at 1 B keys). The distinct-first shape keeps the
    // sketch at the group grain.
    val p = plan("sketch_hll_distinct")
    assert(!p.contains("Expand"),
      s"Expand means the mixed distinct/sketch aggregate is back:\n$p")
    assert(p.contains("approx_count_distinct") || p.contains("HyperLogLog"),
      s"the sketch side disappeared:\n$p")
  }

  test("text_dedup_tokens_ordered: one scan, native projection, no " +
       "exchange except the output sort") {
    // r17 rewrite of the O(k²)-per-row filter-with-index HOF onto the
    // native one-pass dedup — same scan-speed class as gopher.
    val p = plan("text_dedup_tokens_ordered")
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected exactly one scan:\n$p")
    assert(!p.contains("Join"), s"per-doc stats must not join:\n$p")
    assert(p.contains("graft_token_dedup_ordered"),
      s"the dedup must be the native projection:\n$p")
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges == 1 && p.contains("rangepartitioning"),
      s"the single exchange must be the output sort:\n$p")
  }

  test("text_ngram_topk: the type frame explodes native distinct " +
       "shingles — no corpus-wide distinct exchange, no HOF transform") {
    val p = plan("text_ngram_topk")
    assert(p.contains("graft_shingles"),
      s"the shingle build must be the native expression:\n$p")
    // one exchange for the doc_freq aggregate (vocabulary grain) +
    // the top-k sort; a third means the corpus-wide (doc, gram)
    // distinct re-entered
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 2,
      s"expected agg + sort exchanges only (corpus distinct is back?):\n$p")
  }
}
