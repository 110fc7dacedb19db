package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.t

/** Statistical testing / profiling surface (round 6): rank statistics
  * (Spearman, Mann–Whitney), Welch's t, lag autocorrelation, marketing
  * attribution, neighborhood similarity, sentence-level text stats,
  * and Benford first-digit profiling.
  *
  * Exactness strategy (the house float-determinism recipes): every
  * statistic is assembled from EXACT integer operands — total-order
  * ranks (row_number with a full tiebreak, so no average-rank float),
  * cent-scaled bigint sums — and leaves integer arithmetic in at most
  * one final double expression with the IDENTICAL shape on the DuckDB
  * side, or a fixed-point rounding of it. Overflow notes are per-query
  * (bigint Σx² and Σd² fit to ~10¹⁰ rows·cents; swap to DECIMAL(38,0)
  * past that — same plan).
  */
object Stats {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "stats_spearman_corr" -> ((s, d) => {
      // A29: Spearman rank correlation between order value and order
      // date per priority (is spend drifting over time?). Ranks are
      // TOTAL-ORDER row_numbers tiebroken by the UNIQUE o_orderkey —
      // a documented, deterministic treatment of ties that keeps both
      // rank vectors exact permutations, so ρ = 1 − 6Σd²/(n(n²−1))
      // holds verbatim and Σd² is an exact bigint (DECIMAL(38,0) past
      // ~10⁶ rows/group: Σd² grows as n³). The tiebreak column MUST
      // be unique — a non-total order assigns tied rows arbitrarily,
      // differently per engine (lineitem's (orderkey, linenumber) is
      // NOT unique in this data; that bug is why this query ranks
      // orders). Two windows share one priority exchange.
      val wp = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("p"), col("o_orderkey"))
      val wd = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("dt"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice") * 100, 0).cast("long").as("p"),
          unix_timestamp(col("o_orderdate")).as("dt"))
        .withColumn("rp", row_number().over(wp).cast("long"))
        .withColumn("rd", row_number().over(wd).cast("long"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum((col("rp") - col("rd")) * (col("rp") - col("rd")))
            .as("sum_d2"))
        .select(col("o_orderpriority"), col("n"), col("sum_d2"),
          (lit(1.0) - lit(6.0) * col("sum_d2").cast("double")
            / (col("n") * (col("n") * col("n") - 1)).cast("double"))
            .as("rho"))
        .orderBy("o_orderpriority")
    }),
    "stats_mannwhitney_u" -> ((s, d) => {
      // A30: Mann–Whitney U comparing URGENT vs LOW order values
      // inside each market segment — the nonparametric two-sample
      // location test next to A27's KS. Combined total-order ranks
      // (cents, then orderkey: no average-rank float), U₁ from the
      // rank sum of sample 1; U₁+U₂ = n₁n₂ is the built-in self-check
      // and everything is exact bigint.
      val o = t(s, d, "orders")
        .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      val c = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("x"), col("o_orderkey"))
      o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"), col("o_orderkey"),
          col("o_orderpriority"),
          round(col("o_totalprice") * 100, 0).cast("long").as("x"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .groupBy(col("c_mktsegment"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT", 1L)
            .otherwise(0L)).as("n1"),
          sum(when(col("o_orderpriority") === "5-LOW", 1L)
            .otherwise(0L)).as("n2"),
          sum(when(col("o_orderpriority") === "1-URGENT", col("rk"))
            .otherwise(0L)).as("r1"))
        .select(col("c_mktsegment"), col("n1"), col("n2"),
          (col("r1") - (col("n1") * (col("n1") + 1) / 2).cast("long"))
            .as("u1"),
          (col("n1") * col("n2")
            - (col("r1") - (col("n1") * (col("n1") + 1) / 2).cast("long")))
            .as("u2"))
        .orderBy("c_mktsegment")
    }),
    "stats_welch_ttest" -> ((s, d) => {
      // A31: Welch's unequal-variance t — each event type's value
      // distribution against the 'view' baseline. Group moments are
      // exact bigint cent sums; mean/variance/t are ONE double
      // expression with the oracle's exact shape, emitted fixed-point
      // e6. The baseline side is a 1-row broadcast cross join.
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("x"))
      val m = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
             sum(col("x") * col("x")).as("sxx"))
      val base = m.where(col("event_type") === "view")
        .select(col("n").as("n0"), col("sx").as("sx0"),
                col("sxx").as("sxx0"))
      def mean(sx: String, n: String) =
        col(sx).cast("double") / col(n).cast("double")
      def variance(n: String, sx: String, sxx: String) =
        (col(n) * col(sxx) - col(sx) * col(sx)).cast("double") /
          (col(n) * (col(n) - 1)).cast("double")
      m.where(col("event_type") =!= "view").crossJoin(base)
        .select(col("event_type"), col("n"), col("n0"),
          round(lit(1000000.0) *
            (mean("sx", "n") - mean("sx0", "n0")) /
            sqrt(variance("n", "sx", "sxx") / col("n").cast("double") +
                 variance("n0", "sx0", "sxx0") / col("n0").cast("double")),
            0).cast("long").as("t_fp_e6"))
        .orderBy("event_type")
    }),
    "window_autocorr_lag1" -> ((s, d) => {
      // W22: lag-1 autocorrelation of event values per type — the
      // memory-of-the-series signal. One ts-ordered window produces
      // (xₜ₋₁, xₜ) pairs; Pearson r over the pairs from five exact
      // bigint sums, one double expression, fixed-point e6.
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_type"), col("ts"), col("event_id"),
          round(col("value") * 100, 0).cast("long").as("y"))
        .withColumn("x", lag(col("y"), 1).over(w))
        .where(col("x").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("np"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("event_type"), col("np"),
          round(lit(1000000.0) *
            (col("np") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("np") * col("sxx") - col("sx") * col("sx")).cast("double") *
                 (col("np") * col("syy") - col("sy") * col("sy")).cast("double")),
            0).cast("long").as("r_fp_e6"))
        .orderBy("event_type")
    }),
    "events_attribution" -> ((s, d) => {
      // B5: first/last-touch attribution — for every purchase, the
      // user's first event ever and the most recent NON-purchase
      // event before the purchase (classic marketing attribution).
      // One user_id exchange, two frames over the same sort; the
      // IGNORE NULLS last() is W17's LOCF machinery pointed at a
      // conditional column. Purchases with no prior touch → 'none'.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"))
        .withColumn("first_touch", first(col("event_type")).over(w))
        .withColumn("last_touch",
          last(when(col("event_type") =!= "purchase", col("event_type")),
               ignoreNulls = true).over(w))
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          coalesce(col("first_touch"), lit("none")).as("first_touch"),
          coalesce(col("last_touch"), lit("none")).as("last_touch"))
        .orderBy("event_id")
    }),
    "graph_common_neighbors" -> ((s, d) => {
      // G8: neighborhood Jaccard similarity over the part co-purchase
      // graph — the link-prediction/people-also-bought signal. Common
      // neighbors are wedge counts through shared neighbors (adjacency
      // joined to itself on the middle node, endpoints ordered);
      // |N∪N| = du+dv−common by inclusion-exclusion, so ONE extra
      // degree join prices the union without materializing sets. The
      // wedge fan-out is deg² per middle node — fine under this data's
      // bounded degrees; at power-law 100 TB swap in minhashed
      // neighbor sketches (operators/Dedup machinery) instead.
      // pair generation: one-shuffle group-to-array expansion
      // (operators/CoPurchase, r20 -- identical pair multiset, 3
      // input-sized exchanges -> 1)
      val raw = graft.operators.CoPurchase.pairs(t(s, d, "lineitem"),
        col("l_orderkey"), col("l_partkey"))
      val canon = graft.operators.Triangles.orientById(raw).localCheckpoint()
      val deg = graft.operators.Triangles.degrees(canon).localCheckpoint()
      val adj = canon.select(col("u").as("node"), col("v").as("nbr"))
        .union(canon.select(col("v").as("node"), col("u").as("nbr")))
      val common = adj.as("x")
        .join(adj.as("y"),
          col("x.nbr") === col("y.nbr") && col("x.node") < col("y.node"))
        .groupBy(col("x.node").as("u"), col("y.node").as("v"))
        .agg(count(lit(1)).as("common"))
        .where(col("common") >= 2)
      common
        .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
        .select(col("u"), col("v"), col("common"),
          (col("common").cast("double") /
            (col("du") + col("dv") - col("common")).cast("double"))
            .as("jaccard"))
        .orderBy(col("jaccard").desc, col("u"), col("v"))
        .limit(50)
    }),
    "text_sentence_stats" -> ((s, d) => {
      // T16: sentence-level shape stats — the readability-gate
      // companion to word-level text_quality_score: segment each doc,
      // drop empty segments, emit count / max / fixed-point mean
      // lengths. Row-local HOFs, zero shuffle before the output sort.
      //
      // The delimiter is a RUN OF THE TOKEN 'a', not terminal
      // punctuation (r20 campaign 6c): the synthetic corpus contains
      // ZERO '.', '!' or '?' characters at every SF (measured sf0.01
      // + sf1), so the original '[.!?] +' splitter NEVER split —
      // n_sent was the constant 1 and the row verified doc-length
      // stats while the whole splitting/empty-filter machinery was
      // dead (the recode_map absent-key class). 'a' is corpus-native
      // and three-armed at every SF: multi-segment docs (388/500 at
      // sf0.01), no-delimiter single-segment docs (112), and
      // leading/trailing/doubled delimiter runs whose empty segments
      // exercise the filter (37). Text is space-wrapped so edge
      // delimiters match; segments are trimmed before the length
      // filter; n_sent = 0 emits NULL stats on BOTH sides (DuckDB
      // list_max of an empty list is NULL). GateSensitivitySpec pins
      // all three arms.
      val sents = filter(
        transform(split(concat(lit(" "), col("text"), lit(" ")),
          " a( a)* "), x => trim(x)),
        x => length(x) > 0)
      t(s, d, "documents")
        .select(col("doc_id"), sents.as("ss"))
        .select(col("doc_id"),
          size(col("ss")).cast("long").as("n_sent"),
          aggregate(col("ss"), lit(0L), (acc, x) => acc + length(x))
            .as("sum_chars"),
          aggregate(col("ss"), lit(0L),
            (acc, x) => greatest(acc, length(x).cast("long")))
            .as("max_chars_raw"))
        .select(col("doc_id"), col("n_sent"),
          when(col("n_sent") > 0, col("max_chars_raw"))
            .as("max_sent_chars"),
          when(col("n_sent") > 0,
            round(lit(1000.0) * col("sum_chars").cast("double")
              / col("n_sent").cast("double"), 0).cast("long"))
            .as("avg_sent_chars_fp_e3"))
        .orderBy("doc_id")
    }),
    "fuzzy_damerau_pairs" -> ((s, d) => {
      // T17: transposition-aware fuzzy matching — the native
      // unrestricted Damerau–Levenshtein expression (swapped letters
      // are the dominant human typo class; plain levenshtein prices
      // them as 2 edits) over T2's successor-key banded self-join.
      // Both distances are exact integer DPs; emitting their delta
      // makes the transposition credit itself oracle-checked.
      graft.functions.expressions.DamerauLevenshtein.register(s)
      val dl = call_function("graft_damerau_levenshtein",
        col("x.p_name"), col("y.p_name"))
      t(s, d, "part").as("x")
        .join(t(s, d, "part").as("y"),
          col("y.p_partkey") === col("x.p_partkey") + 1)
        .select(col("x.p_partkey").as("p1"),
          dl.as("dl_dist"),
          levenshtein(col("x.p_name"), col("y.p_name")).as("lev_dist"),
          (levenshtein(col("x.p_name"), col("y.p_name")) - dl)
            .as("transposition_credit"))
        .orderBy("p1")
    }),
    "agg_winsorized_mean" -> ((s, d) => {
      // A33: winsorized mean — the robust location estimate that clips
      // (not drops) the tails at the discrete p05/p95 before
      // averaging. Thresholds are actual data values at ceil(n·q)
      // ranks (exact cents, zero interpolation float); the clipped sum
      // is exact bigint and the mean leaves integer arithmetic in one
      // rounded division. One window sort, a 1-row-per-group threshold
      // join, one aggregate.
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("x"), col("o_orderkey"))
      val ranked = t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), cents.as("x"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("o_orderpriority"))))
      val thresholds = ranked.groupBy(col("o_orderpriority"))
        .agg(
          max(when(col("rn") === ceil(col("n") * 0.05), col("x")))
            .as("p05"),
          max(when(col("rn") === ceil(col("n") * 0.95), col("x")))
            .as("p95"))
      ranked.join(thresholds, "o_orderpriority")
        .select(col("o_orderpriority"),
          greatest(col("p05"), least(col("p95"), col("x"))).as("cx"),
          col("p05"), col("p95"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), max(col("p05")).as("p05_cents"),
          max(col("p95")).as("p95_cents"), sum(col("cx")).as("sum_w"),
          round(lit(10000.0) * sum(col("cx")).cast("double")
            / count(lit(1)).cast("double"), 0).cast("long")
            .as("wmean_fp_e4"))
        .orderBy("o_orderpriority")
    }),
    "hourly_load_p95" -> ((s, d) => {
      // A49: p95 hourly event load per type — the capacity-planning
      // readout (provision for p95, not mean). A percentile OF an
      // aggregate: the hour grid collapses map-side first, then the
      // discrete p95 (value at ⌈0.95n⌉ on a total order) picks an
      // actual observed hour count — exact integers end to end.
      val hourly = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("c"), col("hour"))
      hourly
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
        .where(col("rn") === ceil(col("n") * 0.95))
        .select(col("event_type"), col("n").as("n_hours"),
          col("c").as("p95_hourly_load"))
        .orderBy("event_type")
    }),
    "basket_size_distribution" -> ((s, d) => {
      // P16: order basket-size distribution — distinct parts per
      // order, histogrammed. The denominator behind every co-purchase
      // graph cost estimate in this catalog (pair fan-out is
      // per-order quadratic in THIS distribution's tail — the probe
      // that proves the tail is bounded). Two nested aggregates, both
      // map-side combinable; share fixed-point e6.
      val wAll = Window.partitionBy(lit(1))
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(countDistinct(col("l_partkey")).as("basket"))
        .groupBy(col("basket")).agg(count(lit(1)).as("n_orders"))
        .withColumn("share_fp_e6",
          round(lit(1000000.0) * col("n_orders").cast("double")
            / sum(col("n_orders")).over(wAll).cast("double"), 0)
            .cast("long"))
        .orderBy("basket")
    }),
    "agg_trimmed_mean" -> ((s, d) => {
      // A47: 5%-trimmed mean per priority — the tails are DROPPED
      // (winsorized's sibling clips them): average over ranks in
      // (⌈0.05n⌉, ⌈0.95n⌉]. Rank bounds are exact integers off one
      // window sort; the kept-sum is exact cents and the mean is one
      // rounded division, fixed-point e4. Identical rank semantics to
      // the winsorized thresholds so the two row counts reconcile.
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("x"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), cents.as("x"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("o_orderpriority"))))
        .where(col("rn") > ceil(col("n") * 0.05) &&
               col("rn") <= ceil(col("n") * 0.95))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_kept"), sum(col("x")).as("sum_kept"))
        .select(col("o_orderpriority"), col("n_kept"), col("sum_kept"),
          round(lit(10000.0) * col("sum_kept").cast("double")
            / col("n_kept").cast("double"), 0).cast("long")
            .as("tmean_fp_e4"))
        .orderBy("o_orderpriority")
    }),
    "interorder_gap_median" -> ((s, d) => {
      // A48: median days between a customer's consecutive orders, per
      // segment — the repeat-purchase cadence. Gaps from one
      // customer-ordered lag pass (exact integer days); the median is
      // DISCRETE (value at ⌈n/2⌉ on a total order) so the output is
      // an actual observed gap, exact in both engines.
      val wC = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val gaps = t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .withColumn("gap_days",
          datediff(col("o_orderdate"),
            lag(col("o_orderdate"), 1).over(wC)).cast("long"))
        .where(col("gap_days").isNotNull)
        .select(col("c_mktsegment"), col("o_orderkey"), col("gap_days"))
      val wM = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("gap_days"), col("o_orderkey"))
      gaps
        .withColumn("rn", row_number().over(wM))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("c_mktsegment"))))
        .where(col("rn") === ceil(col("n") * 0.5))
        .select(col("c_mktsegment"), col("n").as("n_gaps"),
          col("gap_days").as("median_gap_days"))
        .orderBy("c_mktsegment")
    }),
    "source_language_mixture" -> ((s, d) => {
      // P14: per-source language mixture + its Shannon entropy — is a
      // source monolingual (entropy ~0, safe for single-language
      // mixture weights) or mixed (route through language ID first)?
      // Entropy terms are fixed-pointed e6 per (source, lang) cell
      // BEFORE summing (the char-entropy recipe lifted to group
      // level), so the per-source sum is exact integer arithmetic.
      val cell = t(s, d, "documents")
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
      val tot = cell.groupBy(col("source")).agg(sum(col("c")).as("n"))
      cell.join(tot, "source")
        .select(col("source"), col("n"),
          round(lit(1000000.0) * (col("c").cast("double") / col("n").cast("double"))
            * log(col("n").cast("double") / col("c").cast("double")), 0)
            .cast("long").as("term"))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_docs"), count(lit(1)).as("n_langs"),
          sum(col("term")).as("mix_entropy_fp_e6"))
        .orderBy("source")
    }),
    "agg_mode" -> ((s, d) => {
      // A46: mode (most frequent value) per group — absent from both
      // engines' deterministic aggregate sets (DuckDB's mode() leaves
      // ties unspecified). Ties broken by SMALLEST value via one
      // total-order row_number over the (group, value) count frame —
      // which is value-cardinality-sized, not data-sized.
      val cnt = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity").cast("long").as("q"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("c").desc, col("q"))
      cnt.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("l_returnflag"), col("q").as("mode_quantity"),
          col("c").as("mode_count"))
        .orderBy("l_returnflag")
    }),
    "coverage_docs_embeddings" -> ((s, d) => {
      // P15: referential-coverage audit between the document and
      // embedding tables — the pre-join sanity check every multimodal
      // pipeline needs (train on doc+embedding pairs: how many of
      // each side would silently drop?). Two anti-join counts + the
      // matched count, all from one full outer join on the key.
      val docs = t(s, d, "documents").select(col("doc_id"))
      val embs = t(s, d, "embeddings").select(col("vec_id"))
      docs.join(embs, col("doc_id") === col("vec_id"), "full_outer")
        .agg(
          sum(when(col("doc_id").isNotNull && col("vec_id").isNotNull, 1L)
            .otherwise(0L)).as("n_matched"),
          sum(when(col("vec_id").isNull, 1L).otherwise(0L))
            .as("n_docs_without_embedding"),
          sum(when(col("doc_id").isNull, 1L).otherwise(0L))
            .as("n_embeddings_without_doc"))
    }),
    "stats_crosstype_correlation" -> ((s, d) => {
      // A45: cross-series correlation matrix — pairwise Pearson of
      // DAILY event counts between every pair of event types (do
      // errors co-move with clicks?). The daily grid is
      // days×types-sized, so the pairwise self-join on day is tiny;
      // counts are exact integers, five sums per pair, one shaped
      // expression fixed-pointed e6. Upper triangle only (the matrix
      // is symmetric and the diagonal is 1 by definition).
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // both sides of the pair join
      daily.as("a")
        .join(daily.as("b"),
          col("a.day") === col("b.day") &&
          col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("t1"),
          col("b.event_type").as("t2"))
        .agg(count(lit(1)).as("nd"), sum(col("a.c")).as("sx"),
          sum(col("b.c")).as("sy"),
          sum(col("a.c") * col("a.c")).as("sxx"),
          sum(col("b.c") * col("b.c")).as("syy"),
          sum(col("a.c") * col("b.c")).as("sxy"))
        .select(col("t1"), col("t2"), col("nd"),
          round(lit(1000000.0) *
            (col("nd") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("nd") * col("sxx") - col("sx") * col("sx")).cast("double") *
                 (col("nd") * col("syy") - col("sy") * col("sy")).cast("double")),
            0).cast("long").as("corr_fp_e6"))
        .orderBy("t1", "t2")
    }),
    "top_movers_mom" -> ((s, d) => {
      // A44: month-over-month top movers — the 20 parts whose revenue
      // changed most between two fixed months (the ops-review "what
      // moved" query). Per-month sums are exact cents; the delta and
      // its magnitude ordering are pure integers with a total
      // tiebreak, and FULL OUTER month alignment keeps parts that
      // traded in only one month (their whole revenue IS the delta).
      val li = t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
               col("l_shipdate") < lit("1996-03-01").cast("timestamp"))
        .select(col("l_partkey"),
          (col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
            .as("is_m1"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      li.groupBy(col("l_partkey"))
        .agg(sum(when(col("is_m1"), col("cents")).otherwise(0L)).as("m1"),
          sum(when(!col("is_m1"), col("cents")).otherwise(0L)).as("m2"))
        .select(col("l_partkey"), col("m1"), col("m2"),
          (col("m2") - col("m1")).as("delta_cents"))
        .orderBy(abs(col("delta_cents")).desc, col("l_partkey"))
        .limit(20)
    }),
    "dedup_cluster_size_hist" -> ((s, d) => {
      // C9: dedup observability — the size distribution of EXACT
      // duplicate clusters (md5-of-normalized-text groups): how much
      // of the corpus is singletons vs heavy boilerplate clusters.
      // Two nested aggregates on content-hash keys, both map-side
      // combinable; the histogram row count is the distinct cluster
      // sizes, i.e. tiny.
      val fp = md5(lower(trim(col("text"))))
      t(s, d, "documents")
        .select(fp.as("fp"))
        .groupBy(col("fp")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
        .select(col("sz"), col("n_clusters"),
          (col("sz") * col("n_clusters")).as("n_docs"))
        .orderBy("sz")
    }),
    "seasonality_dow_profile" -> ((s, d) => {
      // A42: day-of-week seasonality index — each weekday's mean
      // event value over the global mean (the multiplicative seasonal
      // factor a forecaster divides out). Means never materialize:
      // the index is (sum_d · n) / (sum · n_d) evaluated from four
      // exact integers in one shaped expression, fixed-point e6.
      // Weekday numbering pinned to ISO (1=Mon..7=Sun) on both
      // engines.
      val ev = Tables.events(s, d)
        .select(dayofweek(col("ts")).as("dow_sun1"),
          round(col("value") * 100, 0).cast("long").as("x"))
        // Spark dayofweek: 1=Sunday..7=Saturday → ISO 1=Mon..7=Sun
        .select(((col("dow_sun1") + 5) % 7 + 1).cast("long").as("dow_iso"),
          col("x"))
      val perDow = ev.groupBy(col("dow_iso"))
        .agg(count(lit(1)).as("nd"), sum(col("x")).as("sd"))
      val tot = ev.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      perDow.crossJoin(tot)
        .select(col("dow_iso"), col("nd"), col("sd"),
          round(lit(1000000.0) *
            (col("sd") * col("n")).cast("double")
            / (col("s") * col("nd")).cast("double"), 0).cast("long")
            .as("seasonal_idx_fp_e6"))
        .orderBy("dow_iso")
    }),
    "agg_geometric_mean" -> ((s, d) => {
      // A43: geometric mean of order values per priority — the right
      // average for multiplicative quantities, absent from both
      // engines' aggregate sets. exp(mean ln x) with each ln
      // fixed-pointed e6 per row first (charlm recipe), so the sum is
      // an exact integer and both engines exponentiate the SAME
      // rational; emitted as cents fixed-point e2.
      val lx = round(lit(1000000.0) *
        log(round(col("o_totalprice") * 100, 0)), 0).cast("long")
      t(s, d, "orders")
        .select(col("o_orderpriority"), lx.as("lx"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("lx")).as("slx"))
        .select(col("o_orderpriority"), col("n"),
          round(lit(100.0) * exp(col("slx").cast("double")
            / (lit(1000000.0) * col("n").cast("double"))), 0).cast("long")
            .as("geo_mean_cents_fp_e2"))
        .orderBy("o_orderpriority")
    }),
    "graph_assortativity" -> ((s, d) => {
      // G10: degree assortativity — Pearson correlation of endpoint
      // degrees over UNDIRECTED edges (both orientations, the Newman
      // 2002 definition): positive = hubs attach to hubs, negative =
      // hub-and-spoke. Degrees are exact bigints from the shared
      // Triangles.degrees frame; the five sums feed one shaped double
      // expression fixed-pointed e6. Degree products stay < 2^63 here
      // (deg ≤ ~200); DECIMAL(38,0) at power-law scale.
      // pair generation: one-shuffle group-to-array expansion
      // (operators/CoPurchase, r20 -- identical pair multiset, 3
      // input-sized exchanges -> 1)
      val raw = graft.operators.CoPurchase.pairs(t(s, d, "lineitem"),
        col("l_orderkey"), col("l_partkey"))
      val canon = graft.operators.Triangles.orientById(raw).localCheckpoint()
      val deg = graft.operators.Triangles.degrees(canon).localCheckpoint()
      val both = canon.union(canon.select(col("v").as("u"), col("u").as("v")))
      both
        .join(deg.select(col("node").as("u"), col("deg").as("dx")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("dy")), "v")
        .agg(count(lit(1)).as("m2"), sum(col("dx")).as("sx"),
          sum(col("dy")).as("sy"), sum(col("dx") * col("dx")).as("sxx"),
          sum(col("dy") * col("dy")).as("syy"),
          sum(col("dx") * col("dy")).as("sxy"))
        .select(col("m2"),
          round(lit(1000000.0) *
            (col("m2") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("m2") * col("sxx") - col("sx") * col("sx")).cast("double") *
                 (col("m2") * col("syy") - col("sy") * col("sy")).cast("double")),
            0).cast("long").as("assortativity_fp_e6"))
    }),
    "stats_hhi_concentration" -> ((s, d) => {
      // A41: Herfindahl–Hirschman concentration of revenue across
      // customers, per market segment — the market-power screen
      // (10000·Σ share² in the antitrust convention). Σc² needs
      // DECIMAL(38,0) (customer cents squared overflow bigint); the
      // index is one shaped division of exact decimals, fixed-point
      // e2 to match the 0–10000 convention.
      import org.apache.spark.sql.types.DecimalType
      def d38(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val rev = t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
          .as("cents"))
      rev.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(d38(col("cents"))).as("s1"),
          sum(d38(col("cents")) * d38(col("cents"))).as("s2"))
        .select(col("c_mktsegment"), col("n_customers"),
          round(lit(100.0) * lit(10000.0) * col("s2").cast("double")
            / (col("s1") * col("s1")).cast("double"), 0).cast("long")
            .as("hhi_fp_e2"))
        .orderBy("c_mktsegment")
    }),
    "rfm_segments" -> ((s, d) => {
      // A40: RFM segmentation — the classic CRM triad: Recency (last
      // order date), Frequency (order count), Monetary (exact cent
      // total) per customer, each cut into quintiles over a TOTAL
      // order (value, then custkey — ntile needs the total order or
      // engines tie-break differently), concatenated into the
      // familiar 3-digit segment code. Each quintile cut is
      // TotalOrder.withNtile — distributed global rank + the SQL
      // NTILE bucket formula — because a partition-less ntile window
      // sorts the whole customer aggregate through one reducer; the
      // three cuts join back on the unique custkey. Rollup by
      // segment.
      val per = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_dt"),
          count(lit(1)).as("freq"),
          sum(round(col("o_totalprice") * 100, 0).cast("long"))
            .as("cents"))
        .localCheckpoint() // feeds three independent total-order cuts
      import graft.operators.TotalOrder
      def cut(key: org.apache.spark.sql.Column, out: String) =
        TotalOrder.withNtile(per.select(col("o_custkey"), key),
            Seq(key, col("o_custkey")), 5, out)
          .select(col("o_custkey"), col(out))
      per
        .join(cut(col("last_dt"), "r"), "o_custkey")
        .join(cut(col("freq"), "f"), "o_custkey")
        .join(cut(col("cents"), "m"), "o_custkey")
        .withColumn("segment",
          concat(col("r").cast("string"), col("f").cast("string"),
            col("m").cast("string")))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("segment_cents"))
        .orderBy("segment")
    }),
    "corpus_vocab_stats" -> ((s, d) => {
      // T21: corpus vocabulary profile — token count, vocabulary
      // size, hapax legomena (frequency-1 types: the Heaps'-law
      // leading edge and the OOV-rate driver for tokenizer design),
      // and the type-token ratio. One explode, one token-key
      // aggregate, one roll-up row; ratios fixed-point e6.
      val tf = t(s, d, "documents")
        .select(explode(graft.functions.TextFns.tokens(col("text")))
          .as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      tf.agg(
          sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        .select(col("n_tokens"), col("n_types"), col("n_hapax"),
          round(lit(1000000.0) * col("n_types").cast("double")
            / col("n_tokens").cast("double"), 0).cast("long")
            .as("ttr_fp_e6"),
          round(lit(1000000.0) * col("n_hapax").cast("double")
            / col("n_types").cast("double"), 0).cast("long")
            .as("hapax_frac_fp_e6"))
    }),
    "abc_pareto_classes" -> ((s, d) => {
      // A39: ABC/Pareto classification — customers ranked by revenue,
      // classed A/B/C at 70%/90% cumulative share. The class test is
      // CROSS-MULTIPLIED integer arithmetic (cum·100 ≤ 70·total on
      // exact cents — the zscore-exact trick applied to running
      // shares), so boundaries cannot drift between engines. The
      // running revenue share under the (cents DESC, custkey) total
      // order is TotalOrder.withRunningSum — range exchange +
      // per-partition offsets, not a partition-less window that
      // would drag every customer through one reducer — and the same
      // pass returns the grand total, so no second full-frame window
      // for the denominator. Per-class rollup emits counts and share
      // fixed-point e6.
      val rev = t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
          .as("cents"))
      val ord = graft.operators.TotalOrder.withRunningSum(rev,
        Seq(col("cents").desc, col("o_custkey")), col("cents"), "cum")
      ord.df
        .withColumn("total", lit(ord.totalSums(0)))
        .withColumn("cls",
          when(col("cum") * 100 <= col("total") * 70, "A")
            .when(col("cum") * 100 <= col("total") * 90, "B")
            .otherwise("C"))
        .groupBy(col("cls"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("class_cents"),
          max(col("total")).as("total_cents"))
        .select(col("cls"), col("n_customers"), col("class_cents"),
          round(lit(1000000.0) * col("class_cents").cast("double")
            / col("total_cents").cast("double"), 0).cast("long")
            .as("share_fp_e6"))
        .orderBy("cls")
    }),
    "stats_two_proportion_z" -> ((s, d) => {
      // A38: two-proportion z-test — the A/B-test readout: does each
      // market segment's URGENT-order rate differ from the pooled
      // rest? Counts are exact; the pooled-variance z statistic is
      // ONE shaped double expression over five integers, emitted
      // fixed-point e6. The "rest" side is this-segment subtracted
      // from 1-row broadcast totals — no second scan.
      val o = t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
            .as("hit"))
      val seg = o.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n1"), sum(col("hit")).as("x1"))
      val tot = o.agg(count(lit(1)).as("nt"), sum(col("hit")).as("xt"))
      seg.crossJoin(tot)
        .select(col("c_mktsegment"), col("n1"), col("x1"),
          (col("nt") - col("n1")).as("n2"),
          (col("xt") - col("x1")).as("x2"))
        .select(col("c_mktsegment"), col("n1"), col("x1"), col("n2"),
          col("x2"),
          round(lit(1000000.0) *
            (col("x1").cast("double") / col("n1").cast("double")
              - col("x2").cast("double") / col("n2").cast("double")) /
            sqrt((col("x1") + col("x2")).cast("double")
                   / (col("n1") + col("n2")).cast("double")
                 * (lit(1.0) - (col("x1") + col("x2")).cast("double")
                     / (col("n1") + col("n2")).cast("double"))
                 * (lit(1.0) / col("n1").cast("double")
                    + lit(1.0) / col("n2").cast("double"))),
            0).cast("long").as("z_fp_e6"))
        .orderBy("c_mktsegment")
    }),
    "integrity_partition_checksums" -> ((s, d) => {
      // P13: order-independent content fingerprints per source — the
      // replication/migration integrity check: XOR of per-row 60-bit
      // md5 hashes is invariant to row order and partitioning, so two
      // copies of a dataset compare by k tiny rows instead of a
      // row-level diff. Rows hash over (id | content) so duplicate
      // content can't XOR-cancel in pairs. One scan, one aggregate.
      import graft.functions.TextFns.hash60
      t(s, d, "documents")
        .select(col("source"),
          hash60(concat(col("doc_id").cast("string"), lit("|"),
            col("text"))).as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("content_xor"))
        .orderBy("source")
    }),
    "stats_survival_nelson_aalen" -> ((s, d) => {
      // A37: survival analysis — Nelson–Aalen cumulative hazard of
      // signup→first-purchase conversion, with users who never buy
      // RIGHT-CENSORED at their last observed event (dropping them
      // would bias conversion fast; survival machinery exists exactly
      // to keep them). Per-user times from one user-partitioned
      // window pass; the risk table is distinct-time-sized, so its
      // unpartitioned windows are tiny at any data scale. Each
      // hazard increment d/n is fixed-pointed e6 BEFORE the ordered
      // cumsum — integer arithmetic end to end (the charlm recipe;
      // the KM product would need the same trick in log space).
      val byU = Window.partitionBy(col("user_id"))
      val ev = Tables.events(s, d)
        .withColumn("signup",
          min(when(col("event_type") === "signup", col("ts"))).over(byU))
        .withColumn("death",
          min(when(col("event_type") === "purchase" &&
                   col("ts") >= col("signup"), col("ts"))).over(byU))
        .withColumn("lastts", max(col("ts")).over(byU))
      val users = ev.where(col("signup").isNotNull)
        .select(col("user_id"), col("signup"), col("death"), col("lastts"))
        .distinct()
        .select(col("user_id"),
          floor((unix_timestamp(coalesce(col("death"), col("lastts")))
            - unix_timestamp(col("signup"))).cast("double") / 60.0)
            .cast("long").as("t_min"),
          col("death").isNotNull.as("event"))
      val times = users.groupBy(col("t_min"))
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("event"), 1L).otherwise(0L)).as("d"))
      // The risk table is distinct-minute-sized — proportional to the
      // observation SPAN, so both ordered cumsums go through
      // TotalOrder (range exchange + offset broadcast) rather than a
      // partition-less window: a year of events is half a million
      // rows through one reducer, a non-issue; a decade of seconds
      // wouldn't be. Pass 1 also returns the grand cnt total (the
      // at-risk denominator), pass 2 accumulates the filtered hazard
      // terms.
      import graft.operators.TotalOrder
      val cum = TotalOrder.withRunningSum(times, Seq(col("t_min")),
        col("cnt"), "cum_cnt")
      val atRisk = cum.df
        .withColumn("n_risk",
          lit(cum.totalSums(0)) - col("cum_cnt") + col("cnt"))
        .where(col("d") > 0)
        .withColumn("term",
          round(lit(1000000.0) * col("d").cast("double")
            / col("n_risk").cast("double"), 0).cast("long"))
      TotalOrder.withRunningSum(atRisk, Seq(col("t_min")),
          col("term"), "cumhaz_fp_e6").df
        .select(col("t_min"), col("n_risk"), col("d"), col("cumhaz_fp_e6"))
        .orderBy("t_min")
    }),
    "entity_resolution_e2e" -> ((s, d) => {
      // C8: end-to-end entity resolution — the three-stage composition
      // every record-linkage pipeline runs, each stage an operator
      // already in the catalog: (1) BLOCK on (brand, size) so the
      // candidate space is Σ|block|² instead of n²; (2) SCORE block
      // pairs with the native Damerau–Levenshtein (≤ 2 edits =
      // same entity — typo-class matching); (3) CLUSTER matches with
      // Components.connectedAuto (driver union-find below the
      // broadcast-sized gate, O(log n) star contraction above it) and
      // canonicalize to the min part key. Singletons (no match edge) keep
      // themselves as canonical via the left join + coalesce.
      graft.functions.expressions.DamerauLevenshtein.register(s)
      val p = t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("p_name"))
      val pairs = p.as("a")
        .join(p.as("b"),
          col("a.p_brand") === col("b.p_brand") &&
          col("a.p_size") === col("b.p_size") &&
          col("a.p_partkey") < col("b.p_partkey") &&
          call_function("graft_damerau_levenshtein",
            col("a.p_name"), col("b.p_name")) <= 2)
        .select(col("a.p_partkey").as("x"), col("b.p_partkey").as("y"))
      val clusters = graft.operators.Components.connectedAuto(pairs, "x", "y")
      p.join(clusters.select(col("node").as("p_partkey"),
              col("component")), Seq("p_partkey"), "left")
        .select(col("p_partkey"),
          coalesce(col("component"), col("p_partkey"))
            .as("canonical_key"))
        .orderBy("p_partkey")
    }),
    "entity_resolution_snm" -> ((s, d) => {
      // C8b: the SCALE path for entity resolution. The e2e variant
      // blocks on (brand, size) — a FIXED key space, so block sizes
      // grow ∝ corpus and the within-block pair join grows ∝ n²
      // (measured: candidate pairs 20M → 180M for 3× input, sf1→sf3
      // time exponent 1.65). The sorted-neighborhood method
      // (Hernández & Stolfo 1995) replaces the all-pairs block join:
      // sort each block by (name, key) and compare every record to
      // its next W = 8 neighbors only — candidates are exactly 8n,
      // the sort is a partition-parallel window (one per block, no
      // global order), and the match rule + clustering are unchanged.
      // Like graph_common_neighbors_capped and dedup_cluster_cc_auto,
      // the W-window is part of the operator's DEFINITION (the oracle
      // applies the identical rule), so the result is exact for the
      // SNM semantics; matches sorting farther than W apart are the
      // documented recall trade.
      graft.functions.expressions.DamerauLevenshtein.register(s)
      val p = t(s, d, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("p_name"))
      val w = Window.partitionBy(col("p_brand"), col("p_size"))
        .orderBy(col("p_name"), col("p_partkey"))
      val withLeads = p.withColumn("nbrs", array((1 to 8).map(i =>
        struct(lead(col("p_name"), i).over(w).as("n"),
               lead(col("p_partkey"), i).over(w).as("k"))): _*))
      val pairs = withLeads
        .select(col("p_partkey"), col("p_name"), explode(col("nbrs")).as("nb"))
        .where(col("nb.k").isNotNull &&
          call_function("graft_damerau_levenshtein",
            col("p_name"), col("nb.n")) <= 2)
        .select(least(col("p_partkey"), col("nb.k")).as("x"),
                greatest(col("p_partkey"), col("nb.k")).as("y"))
        .distinct()
      val clusters = graft.operators.Components.connectedAuto(pairs, "x", "y")
      p.join(clusters.select(col("node").as("p_partkey"),
              col("component")), Seq("p_partkey"), "left")
        .select(col("p_partkey"),
          coalesce(col("component"), col("p_partkey"))
            .as("canonical_key"))
        .orderBy("p_partkey")
    }),
    "anomaly_rolling_zscore" -> ((s, d) => {
      // A36: streaming-shaped anomaly detection — each event scored
      // against the PRECEDING 20 events of its type (never itself:
      // self-inclusion dilutes the very spike being tested). The
      // z-test is evaluated in cross-multiplied integer form,
      // (n·x − S₁)² vs 4·(n·S₂ − S₁²) — the anomaly_zscore_exact
      // recipe moved onto a sliding frame: zero floats, zero
      // libm, engine-exact booleans.
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-20, -1)
      Tables.events(s, d)
        .select(col("event_type"), col("ts"), col("event_id"),
          round(col("value") * 100, 0).cast("long").as("x"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s1", sum(col("x")).over(w))
        .withColumn("s2", sum(col("x") * col("x")).over(w))
        .where(col("n") >= 5) // too little history → no verdict
        .select(col("event_id"), col("event_type"), col("x"),
          col("n"),
          ((col("n") * col("x") - col("s1")) *
           (col("n") * col("x") - col("s1")) >
            lit(4L) * (col("n") * col("s2") - col("s1") * col("s1")) &&
           col("n") * col("x") > col("s1")).as("is_spike"))
        .orderBy("event_id")
    }),
    "window_rolling_slope" -> ((s, d) => {
      // W25: rolling 7-event OLS slope of value vs time per event
      // type — the windowed trend detector. Time is MINUTES since a
      // fixed epoch (small exact ints: centering the regressor keeps
      // nΣxx − (Σx)² inside bigint; raw epoch seconds would overflow
      // at frame size 7), values exact cents; all five frame sums are
      // order-independent integers and the slope is one shaped double
      // division fixed-pointed e6. Degenerate frames (fewer than 2
      // points or zero time variance) emit NULL explicitly.
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      val tMin = ((unix_timestamp(col("ts"))
        - unix_timestamp(lit("2024-01-01 00:00:00").cast("timestamp")))
        / 60L).cast("long")
      val base = Tables.events(s, d)
        .select(col("event_type"), col("ts"), col("event_id"),
          tMin.as("x"), round(col("value") * 100, 0).cast("long").as("y"))
      base
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum(col("x")).over(w))
        .withColumn("sy", sum(col("y")).over(w))
        .withColumn("sxx", sum(col("x") * col("x")).over(w))
        .withColumn("sxy", sum(col("x") * col("y")).over(w))
        .select(col("event_id"), col("event_type"),
          when(col("n") >= 2 &&
               col("n") * col("sxx") - col("sx") * col("sx") =!= 0L,
            round(lit(1000000.0) *
              (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
              0).cast("long"))
            .as("slope_fp_e6"))
        .orderBy("event_id")
    }),
    "profile_selfjoin_size_f2" -> ((s, d) => {
      // P11: join-size estimation via the second frequency moment —
      // the self-join on l_suppkey produces exactly F₂ = Σₖ c(k)²
      // rows, so the per-key count aggregate PREDICTS the join's
      // output size without running it (the cardinality-estimation
      // primitive query planners sketch with AMS/CountSketch; exact
      // here, the sketch is the 100 TB substitution). The oracle
      // carries the identity itself: estimate ≡ executed join count.
      val cnts = t(s, d, "lineitem")
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // feeds the F2 aggregate AND the verify join
      val f2 = cnts.agg(
        count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        sum(col("c") * col("c")).as("f2_est"))
      val actual = cnts.as("a")
        .join(cnts.as("b"), col("a.l_suppkey") === col("b.l_suppkey"))
        .agg(sum(col("a.c") * col("b.c")).as("actual"))
      f2.crossJoin(actual)
        .select(col("n_keys"), col("n_rows"), col("f2_est"),
          (col("f2_est") === col("actual")).as("estimate_exact"))
    }),
    "agg_topk_heap" -> ((s, d) => {
      // A35: per-group top-k as a bounded-heap aggregate
      // (operators/TopK) instead of the window sort — the window form
      // sorts every group's FULL row set to keep 3 rows; the heap
      // holds 3 rows of state per group, bounds map-side partials at
      // k before the shuffle, and merges k∪k. Total (score desc, id
      // asc) order makes the result hash-identical to the window
      // oracle. No Window, no per-group sort anywhere in the plan
      // (pinned in PlanShapeSpec).
      val tk = graft.operators.TopK.topKUdaf(3)
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      t(s, d, "orders")
        .select(col("o_orderpriority"), cents.as("cents"),
          col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(tk(col("cents"), col("o_orderkey")).as("top"))
        .select(col("o_orderpriority"),
          posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("o_orderpriority"), (col("pos") + 1).as("rk"),
          col("e._1").as("cents"), col("e._2").as("o_orderkey"))
        .orderBy("o_orderpriority", "rk")
    }),
    "graph_common_neighbors_capped" -> ((s, d) => {
      // G8b: the SCALE path for neighborhood similarity — identical to
      // graph_common_neighbors but middles are capped at degree ≤ 96
      // BEFORE the wedge join. Rationale: exact all-pairs common
      // neighbors is inherently Σ_mid (deg choose 2) — a hub shared
      // by everyone generates most of the wedges while carrying
      // almost no similarity signal (its Jaccard contribution is
      // 1/union for every pair). The cap is part of the operator's
      // DEFINITION (the oracle applies the same cap), so the result
      // is still exact for the capped semantics; it bounds wedges per
      // middle at cap²/2 — LINEAR total in n for any constant cap —
      // where uncapped is Σdeg² (~148M wedge rows at sf0.1, ~90 s).
      // The fully-exact variant stays available as
      // graph_common_neighbors, correctness-gated.
      // Cap 32→96 (r16 adversarial audit of the correctness gate):
      // this co-purchase graph is near-REGULAR (min degree 42 at
      // sf0.01, SF-invariant mean ~117), so deg ≤ 32 kept ZERO
      // middles and the row hash-matched a 0-row oracle at every
      // gate SF — a vacuous pass, and the bench timed only the edge
      // build. 96 sits inside the distribution (keeps ~20% of nodes
      // at sf0.01, measured 350k qualifying pairs; 12.3M wedges at
      // sf0.1 ≈ 8% of uncapped) and still excludes the hub tail.
      // Pair generation: one-shuffle group-to-array expansion
      // (operators/CoPurchase, r20 — identical pair multiset, 3
      // input-sized exchanges → 1).
      val raw = graft.operators.CoPurchase.pairs(t(s, d, "lineitem"),
        col("l_orderkey"), col("l_partkey"))
      val canon = graft.operators.Triangles.orientById(raw).localCheckpoint()
      val deg = graft.operators.Triangles.degrees(canon).localCheckpoint()
      val lowMid = deg.where(col("deg") <= 96)
        .select(col("node").as("nbr"))
      val adj = canon.select(col("u").as("node"), col("v").as("nbr"))
        .union(canon.select(col("v").as("node"), col("u").as("nbr")))
        .join(lowMid, Seq("nbr"), "left_semi")
      // working-set-bounded wedge top-k (census-gated u-hash slicing
      // — exact, see operators/CommonNeighbors): B = 1 at every SF
      // here except sf10, where the (u,v) aggregate is ~59 GB
      // unsliced (measured: 242.7 s single-pass vs 173.1 s sliced).
      // adj stays UN-checkpointed — the operator materializes it only
      // on the sliced path (measured 2.3x sf3 cost otherwise).
      graft.operators.CommonNeighbors.cappedTopK(adj, deg, cap = 96L,
        minCommon = 2L, k = 50)
    }),
    "table_diff_audit" -> ((s, d) => {
      // P12: snapshot diff — the release-regression audit (the
      // relational core of gdp_compare_with_old_data, generalized):
      // classify every key as added / removed / changed between two
      // deterministic derivations of orders, via ONE full outer join
      // on the key; unchanged rows are filtered out so the report is
      // delta-sized. Values compared in exact cents.
      val base = t(s, d, "orders")
        .select(col("o_orderkey").as("k"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      val old = base.where(col("k") % 11 =!= 0)
      val neu = base.where(col("k") % 13 =!= 0)
        .select(col("k"),
          (col("cents") + when(col("k") % 5 === 0, 1L).otherwise(0L))
            .as("cents"))
      old.select(col("k"), col("cents").as("old_cents"))
        .join(neu.select(col("k"), col("cents").as("new_cents")),
          Seq("k"), "full_outer")
        .withColumn("status",
          when(col("old_cents").isNull, "added")
            .when(col("new_cents").isNull, "removed")
            .when(col("old_cents") =!= col("new_cents"), "changed"))
        .where(col("status").isNotNull)
        .select(col("k"), col("status"), col("old_cents"), col("new_cents"))
        .orderBy("k")
    }),
    "quantile_normalize_sources" -> ((s, d) => {
      // C6: cross-source score calibration — map each doc's quality
      // proxy (n_chars) to the GLOBAL value at its within-source
      // quantile, so a threshold means the same thing for every
      // source (per-source scorers drift; quantile matching is the
      // standard fix). ENTIRELY integer: within-source rank rn of ns,
      // target global index ⌈N·rn/ns⌉ via the (a+b−1)/b trick (exact
      // under 2^53), one join against the globally-ranked values —
      // no doubles anywhere. The global ranking of values is the
      // distributed total-order pass (TotalOrder.withRowNumber:
      // range-partitioned sort + per-partition offset broadcast), not
      // a partition-less window — a corpus-sized single-reducer sort
      // at 100 TB. The per-source rank keeps its partitionBy(source)
      // window: that one scales (state is per-source).
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .localCheckpoint() // feeds the per-source AND global rankings
      val wS = Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))
      val n = docs.count()
      val ranked = docs
        .withColumn("rn", row_number().over(wS).cast("long"))
        .withColumn("ns", count(lit(1)).over(
          Window.partitionBy(col("source"))))
        .withColumn("gidx",
          floor((lit(n) * col("rn") + col("ns") - 1)
            .cast("double") / col("ns").cast("double")).cast("long"))
      val globalVals = graft.operators.TotalOrder.withRowNumber(
          docs.select(col("n_chars").as("cal_n_chars"),
            col("doc_id").as("gd")),
          Seq(col("cal_n_chars"), col("gd")), "gidx")
        .select(col("gidx"), col("cal_n_chars"))
      ranked.join(globalVals, "gidx")
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("cal_n_chars"))
        .orderBy("doc_id")
    }),
    "assoc_rules_pairs" -> ((s, d) => {
      // A34: market-basket association rules at the pair level —
      // support, confidence, and lift for co-purchased parts (the
      // A-priori first rung; deeper itemsets iterate the same
      // candidate-join + min-support prune). The min-support filter
      // IS the a-priori trick: it prunes the pair candidates before
      // the heavy joins back to item supports. All counts exact;
      // confidence/lift are shaped divisions fixed-pointed e6;
      // deterministic top-20 by (lift, antecedent, consequent).
      // Min-support 5→2 (r16 LIMIT-binding census, PLANS.md audit):
      // absolute support dilutes as the part key space grows ∝ SF
      // (max pair co-occurrence is 5 at sf0.01 but 3 at sf1), so ≥5
      // left 1 row at sf0.01 and ZERO at sf1 — the top-20's
      // ORDER/LIMIT semantics were never exercised by either gate.
      // ≥2 still prunes 97% of candidate pairs (115,729 → 3,445 at
      // sf0.01) and the LIMIT binds at both gate SFs.
      // basket build: one-shuffle group-to-array (operators/
      // CoPurchase, r20) — the checkpointed basket frame is ORDER-
      // grain (147k rows at sf0.1) instead of the old (ok, pk)-grain
      // distinct (600k rows), and feeds pairs, item supports AND the
      // order count without any further wide exchange; pair multiset
      // identical, oracle unchanged.
      val baskets = graft.operators.CoPurchase.baskets(
          t(s, d, "lineitem"), col("l_orderkey"), col("l_partkey"))
        .localCheckpoint() // basket list feeds pairs AND item supports
      val nOrders = baskets.count()
      val item = baskets.select(explode(col("ps")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("supp"))
      val pair = graft.operators.CoPurchase.pairsFromBaskets(baskets)
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("supp_uv"))
        .where(col("supp_uv") >= 2)
      pair
        .join(item.select(col("pk").as("u"), col("supp").as("supp_u")), "u")
        .join(item.select(col("pk").as("v"), col("supp").as("supp_v")), "v")
        .select(col("u"), col("v"), col("supp_uv"), col("supp_u"),
          col("supp_v"),
          round(lit(1000000.0) * col("supp_uv").cast("double")
            / col("supp_u").cast("double"), 0).cast("long")
            .as("conf_fp_e6"),
          round(lit(1000000.0) * lit(nOrders) * col("supp_uv").cast("double")
            / (col("supp_u") * col("supp_v")).cast("double"), 0).cast("long")
            .as("lift_fp_e6"))
        .orderBy(col("lift_fp_e6").desc, col("u"), col("v"))
        .limit(20)
    }),
    "sketch_ams_f2" -> ((s, d) => {
      // K9: AMS/tug-of-war sketch of the second frequency moment —
      // the O(1)-space substitute for P11's exact Σc² at 100 TB
      // (Alon–Matias–Szegedy 1996). Each estimator j is (Σₖ sⱼ(k)·
      // c(k))² with ±1 signs derived from salted md5 (engine-portable,
      // no RNG), so all 8 estimates are DETERMINISTIC integers the
      // oracle reproduces bit-for-bit — the estimator's unbiasedness
      // is a theorem, its arithmetic is what's checked. At stream
      // scale the sign multiply folds into the per-key partial
      // aggregate: 8 longs of state, mergeable.
      val cnts = t(s, d, "lineitem")
        .groupBy(col("l_suppkey")).agg(count(lit(1)).as("c"))
      val withJ = cnts.select(col("l_suppkey"), col("c"),
        explode(sequence(lit(0), lit(7))).as("j"))
      val sign = when(
        conv(substring(md5(concat(col("j").cast("string"), lit("|"),
          col("l_suppkey").cast("string"))), 1, 15), 16, 10)
          .cast("long") % 2 === 0L, 1L).otherwise(-1L)
      val exact = cnts.agg(sum(col("c") * col("c")).as("f2_exact"))
      withJ.groupBy(col("j"))
        .agg(sum(sign * col("c")).as("z"))
        .select(col("j"), (col("z") * col("z")).as("est"))
        .crossJoin(exact)
        .orderBy("j")
    }),
    "interpolate_linear_days" -> ((s, d) => {
      // W24: the third member of the gap-fill family — day spine (N4)
      // fills with zeros, LOCF (W17) carries forward, THIS
      // interpolates linearly between the flanking known days (the
      // sensor/finance resample). Known daily sums are exact cents;
      // the two flanking values come from one ordered window pair
      // (LOCF frame + its mirror); the interpolated value is one
      // shaped double expression emitted fixed-point e4. Leading/
      // trailing gaps (no flank on one side) stay NULL — explicit,
      // not extrapolated. The unpartitioned window is over the DAY
      // SPINE (≤ tens of thousands of rows at any data scale — the
      // fact table was already aggregated away), so the single
      // partition it implies is spine-sized, never corpus-sized; with
      // many series, partition the windows by series key.
      //
      // The series is ONE USER's purchases, not the whole stream's:
      // the corpus-wide daily sum has a purchase on every day at
      // every SF (density grows with the corpus), so the
      // interpolation arm NEVER fired and the gate verified a pure
      // pass-through (r18 degeneracy sweep: known=true on all 30
      // days). Events-per-user is scale-invariant (~67 over 30 days,
      // ~13 purchases), so user 0's series has real gaps at every SF
      // and both arms — pass-through and interpolation — stay live.
      val daily = Tables.events(s, d)
        .where(col("event_type") === "purchase" && col("user_id") === 0L)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(round(col("value") * 100, 0).cast("long")).as("x"))
        .localCheckpoint(false)
      val spine = daily
        .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("day"))
      val wPrev = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wNext = Window.orderBy(col("day"))
        .rowsBetween(1, Window.unboundedFollowing)
      val joined = spine.join(daily, Seq("day"), "left")
        .withColumn("prev_x", last(col("x"), ignoreNulls = true).over(wPrev))
        .withColumn("prev_day",
          last(when(col("x").isNotNull, col("day")), ignoreNulls = true)
            .over(wPrev))
        .withColumn("next_x", first(col("x"), ignoreNulls = true).over(wNext))
        .withColumn("next_day",
          first(when(col("x").isNotNull, col("day")), ignoreNulls = true)
            .over(wNext))
      joined.select(col("day"), col("x").isNotNull.as("known"),
          when(col("x").isNotNull,
            round(lit(10000.0) * col("x").cast("double"), 0).cast("long"))
          .otherwise(
            round(lit(10000.0) *
              (col("prev_x").cast("double") +
                ((col("next_x") - col("prev_x"))
                  * datediff(col("day"), col("prev_day"))).cast("double")
                / datediff(col("next_day"), col("prev_day")).cast("double")),
              0).cast("long"))
          .as("value_fp_e4"))
        .orderBy("day")
    }),
    "profile_key_skew" -> ((s, d) => {
      // P9: join-key skew profiler — the diagnostic that decides
      // between a plain shuffle join, AQE skew split, and
      // Skew.saltedJoin BEFORE the job runs. Per candidate key:
      // cardinality, the heaviest key's share, and the max/avg skew
      // factor (≥ ~8 means one reducer eats the key). Two aggregates
      // per key column over one scan each; exact integers plus one
      // shaped double division.
      def profile(tbl: DataFrame, keyCol: String) = {
        val cnts = tbl.groupBy(col(keyCol).as("k"))
          .agg(count(lit(1)).as("c"))
        cnts.agg(
            lit(keyCol).as("key_col"),
            sum(col("c")).as("n_rows"),
            count(lit(1)).as("n_keys"),
            max(col("c")).as("max_cnt"))
          .select(col("key_col"), col("n_rows"), col("n_keys"),
            col("max_cnt"),
            round(lit(1000.0) * col("max_cnt").cast("double")
              / (col("n_rows").cast("double") / col("n_keys").cast("double")),
              0).cast("long").as("skew_fp_e3"))
      }
      val li = t(s, d, "lineitem")
      profile(li, "l_suppkey")
        .unionByName(profile(li, "l_partkey"))
        .unionByName(profile(li, "l_orderkey"))
        .orderBy("key_col")
    }),
    "profile_null_report" -> ((s, d) => {
      // P10: column-completeness report — per column of the events
      // table: nulls, fill rate. ONE scan: count(col) counts only
      // non-nulls, so the whole report is a single aggregate row
      // unpivoted to (column, n_null, fill_fp_e6) — never one scan
      // per column (at 100 TB a per-column loop is k full scans).
      val ev = Tables.events(s, d)
      val agged = ev.agg(
        count(lit(1)).as("n"),
        count(col("ts")).as("c_ts"),
        count(col("user_id")).as("c_user_id"),
        count(col("event_type")).as("c_event_type"),
        count(col("value")).as("c_value"),
        count(col("props")).as("c_props"))
      val cols = Seq("ts", "user_id", "event_type", "value", "props")
      val stacked = cols.map(c =>
        agged.select(lit(c).as("column_name"),
          (col("n") - col(s"c_$c")).as("n_null"),
          round(lit(1000000.0) * col(s"c_$c").cast("double")
            / col("n").cast("double"), 0).cast("long").as("fill_fp_e6")))
      stacked.reduce(_ unionByName _).orderBy("column_name")
    }),
    "split_train_val_test" -> ((s, d) => {
      // C5: deterministic 80/10/10 train/val/test split — the one
      // pipeline op every training run needs. The split key is a pure
      // content-free hash of the doc id (md5 → top-60-bit int → mod
      // 100), so membership is stable across runs, machines, and
      // engine versions — never a Math.random. Emitted as per
      // (source, split) counts so leakage across sources is auditable.
      val h = conv(substring(md5(col("doc_id").cast("string")), 1, 15),
        16, 10).cast("long") % 100
      t(s, d, "documents")
        .select(col("source"),
          when(h < 80, "train").when(h < 90, "val").otherwise("test")
            .as("split"))
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("source", "split")
    }),
    "window_ewma_halflife" -> ((s, d) => {
      // W23: bounded exponentially-weighted moving average with
      // half-life decay (β = ½) over each event type's value series.
      // A true EWMA is a sequential recurrence — hostile to a
      // distributed engine — but with β = ½ the 8-term truncation is
      // an INTEGER dot product: weights 128..1 over the lag window,
      // exact bigint, zero float anywhere (the tail beyond 8 lags is
      // below half a cent). One window exchange, 8 codegen'd lags.
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val cents = round(col("value") * 100, 0).cast("long")
      val terms = (0 to 7).map(k =>
        coalesce(lag(col("x"), k).over(w), lit(0L)) * lit(1L << (7 - k)))
      Tables.events(s, d)
        .select(col("event_type"), col("ts"), col("event_id"),
          cents.as("x"))
        .withColumn("ewma_x256", terms.reduce(_ + _))
        .select(col("event_id"), col("event_type"), col("x"),
          col("ewma_x256"))
        .orderBy("event_id")
    }),
    "profile_benford_digits" -> ((s, d) => {
      // A32: Benford first-significant-digit profile of order values
      // per priority — the fraud/data-quality screen. The digit comes
      // from the DECIMAL STRING of exact cents (no log10: libm
      // rounding at powers of ten is exactly the cross-engine trap
      // fixed-point recipes exist to avoid). Share-of-group is one
      // windowed sum over the 9-row-per-group aggregate.
      val wp = Window.partitionBy(col("o_orderpriority"))
      t(s, d, "orders")
        .select(col("o_orderpriority"),
          substring(round(col("o_totalprice") * 100, 0).cast("long")
            .cast("string"), 1, 1).as("digit"))
        .groupBy(col("o_orderpriority"), col("digit"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("freq_fp_e6",
          round(lit(1000000.0) * col("cnt").cast("double")
            / sum(col("cnt")).over(wp).cast("double"), 0).cast("long"))
        .orderBy("o_orderpriority", "digit")
    }))

  val oracles: Map[String, String] = Map(
    "stats_spearman_corr" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT),
        |               o_orderkey) AS rp,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(epoch(o_orderdate) AS BIGINT),
        |               o_orderkey) AS rd
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum((rp - rd) * (rp - rd)) AS BIGINT) AS sum_d2,
        |  1.0 - 6.0 * CAST(sum((rp - rd) * (rp - rd)) AS DOUBLE)
        |    / CAST(count(*) * (count(*) * count(*) - 1) AS DOUBLE) AS rho
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "stats_mannwhitney_u" ->
      """WITH r AS (
        |  SELECT c_mktsegment, o_orderpriority,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT),
        |               o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |a AS (
        |  SELECT c_mktsegment,
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN o_orderpriority = '5-LOW'
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |             THEN rk ELSE 0 END) AS BIGINT) AS r1
        |  FROM r GROUP BY 1)
        |SELECT c_mktsegment, n1, n2,
        |  CAST(r1 - n1 * (n1 + 1) // 2 AS BIGINT) AS u1,
        |  CAST(n1 * n2 - (r1 - n1 * (n1 + 1) // 2) AS BIGINT) AS u2
        |FROM a ORDER BY 1""".stripMargin,
    "stats_welch_ttest" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS sx,
        |    sum(CAST(round(value * 100) AS BIGINT)
        |        * CAST(round(value * 100) AS BIGINT)) AS sxx
        |  FROM events GROUP BY 1),
        |b AS (SELECT n AS n0, sx AS sx0, sxx AS sxx0 FROM m
        |      WHERE event_type = 'view')
        |SELECT event_type, n, n0,
        |  CAST(round(1000000.0 *
        |    (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
        |      - CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE)) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |           / CAST(n * (n - 1) AS DOUBLE) / CAST(n AS DOUBLE) +
        |         CAST(n0 * sxx0 - sx0 * sx0 AS DOUBLE)
        |           / CAST(n0 * (n0 - 1) AS DOUBLE) / CAST(n0 AS DOUBLE)))
        |    AS BIGINT) AS t_fp_e6
        |FROM m, b WHERE event_type <> 'view' ORDER BY 1""".stripMargin,
    "window_autocorr_lag1" ->
      """WITH p AS (
        |  SELECT event_type,
        |    lag(CAST(round(value * 100) AS BIGINT)) OVER
        |      (PARTITION BY event_type ORDER BY ts, event_id) AS x,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events),
        |a AS (
        |  SELECT event_type, count(*) AS np, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        |  FROM p WHERE x IS NOT NULL GROUP BY 1)
        |SELECT event_type, np,
        |  CAST(round(1000000.0 *
        |    CAST(np * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
        |         * CAST(np * syy - sy * sy AS DOUBLE))) AS BIGINT)
        |    AS r_fp_e6
        |FROM a ORDER BY 1""".stripMargin,
    "events_attribution" ->
      """WITH w AS (
        |  SELECT event_id, user_id, event_type,
        |    first_value(event_type) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS first_touch,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |                    THEN event_type END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS last_touch
        |  FROM events)
        |SELECT event_id, user_id,
        |  coalesce(first_touch, 'none') AS first_touch,
        |  coalesce(last_touch, 'none') AS last_touch
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "graph_common_neighbors" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |      FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk),
        |adj AS (SELECT u AS node, v AS nbr FROM e
        |        UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT node, count(*) AS deg FROM adj GROUP BY 1),
        |cm AS (
        |  SELECT x.node AS u, y.node AS v, count(*) AS common
        |  FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT cm.u, cm.v, cm.common,
        |  CAST(cm.common AS DOUBLE)
        |    / CAST(du.deg + dv.deg - cm.common AS DOUBLE) AS jaccard
        |FROM cm JOIN deg du ON cm.u = du.node
        |        JOIN deg dv ON cm.v = dv.node
        |ORDER BY jaccard DESC, cm.u, cm.v LIMIT 50""".stripMargin,
    "text_sentence_stats" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    list_filter(
        |      list_transform(
        |        regexp_split_to_array(' ' || text || ' ', ' a( a)* '),
        |        x -> trim(x)),
        |      x -> length(x) > 0) AS ss
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(ss) AS BIGINT) AS n_sent,
        |  CASE WHEN len(ss) > 0 THEN
        |    CAST(list_max(list_transform(ss, x -> length(x))) AS BIGINT)
        |  END AS max_sent_chars,
        |  CASE WHEN len(ss) > 0 THEN
        |    CAST(round(1000.0 *
        |      CAST(list_aggregate(list_transform(ss, x -> length(x)), 'sum')
        |           AS DOUBLE) / CAST(len(ss) AS DOUBLE)) AS BIGINT)
        |  END AS avg_sent_chars_fp_e3
        |FROM s ORDER BY doc_id""".stripMargin,
    "fuzzy_damerau_pairs" ->
      """SELECT x.p_partkey AS p1,
        |  CAST(damerau_levenshtein(x.p_name, y.p_name) AS INT) AS dl_dist,
        |  CAST(levenshtein(x.p_name, y.p_name) AS INT) AS lev_dist,
        |  CAST(levenshtein(x.p_name, y.p_name)
        |       - damerau_levenshtein(x.p_name, y.p_name) AS INT)
        |    AS transposition_credit
        |FROM part x JOIN part y ON y.p_partkey = x.p_partkey + 1
        |ORDER BY p1""".stripMargin,
    "agg_winsorized_mean" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority, o_orderkey,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT),
        |               o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders),
        |t AS (
        |  SELECT o_orderpriority,
        |    max(CASE WHEN rn = ceil(n * 0.05) THEN x END) AS p05,
        |    max(CASE WHEN rn = ceil(n * 0.95) THEN x END) AS p95
        |  FROM ranked GROUP BY 1)
        |SELECT r.o_orderpriority, count(*) AS n,
        |  max(t.p05) AS p05_cents, max(t.p95) AS p95_cents,
        |  CAST(sum(greatest(t.p05, least(t.p95, r.x))) AS BIGINT) AS sum_w,
        |  CAST(round(10000.0 *
        |    CAST(sum(greatest(t.p05, least(t.p95, r.x))) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS wmean_fp_e4
        |FROM ranked r JOIN t ON r.o_orderpriority = t.o_orderpriority
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "hourly_load_p95" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, hour, c,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY c, hour) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM hourly)
        |SELECT event_type, CAST(n AS BIGINT) AS n_hours,
        |  CAST(c AS BIGINT) AS p95_hourly_load
        |FROM r WHERE rn = ceil(n * 0.95) ORDER BY event_type""".stripMargin,
    "basket_size_distribution" ->
      """WITH b AS (
        |  SELECT l_orderkey, count(DISTINCT l_partkey) AS basket
        |  FROM lineitem GROUP BY 1),
        |h AS (SELECT basket, count(*) AS n_orders FROM b GROUP BY 1)
        |SELECT basket, n_orders,
        |  CAST(round(1000000.0 * CAST(n_orders AS DOUBLE)
        |    / CAST(sum(n_orders) OVER () AS DOUBLE)) AS BIGINT)
        |    AS share_fp_e6
        |FROM h ORDER BY basket""".stripMargin,
    "agg_trimmed_mean" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT),
        |               o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n_kept,
        |  CAST(sum(x) AS BIGINT) AS sum_kept,
        |  CAST(round(10000.0 * CAST(sum(x) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS tmean_fp_e4
        |FROM ranked
        |WHERE rn > ceil(n * 0.05) AND rn <= ceil(n * 0.95)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "interorder_gap_median" ->
      """WITH g AS (
        |  SELECT c_mktsegment, o_orderkey,
        |    date_diff('day',
        |      lag(o_orderdate) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey),
        |      o_orderdate) AS gap_days
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (
        |  SELECT c_mktsegment, gap_days,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY gap_days, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS n
        |  FROM g WHERE gap_days IS NOT NULL)
        |SELECT c_mktsegment, CAST(n AS BIGINT) AS n_gaps,
        |  CAST(gap_days AS BIGINT) AS median_gap_days
        |FROM r WHERE rn = ceil(n * 0.5) ORDER BY c_mktsegment""".stripMargin,
    "source_language_mixture" ->
      """WITH cell AS (
        |  SELECT source, lang, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
        |        FROM cell GROUP BY 1),
        |t AS (
        |  SELECT cell.source, n,
        |    CAST(round(1000000.0 * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |      * ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))) AS BIGINT)
        |      AS term
        |  FROM cell JOIN tot ON cell.source = tot.source)
        |SELECT source, max(n) AS n_docs, count(*) AS n_langs,
        |  CAST(sum(term) AS BIGINT) AS mix_entropy_fp_e6
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_mode" ->
      """WITH c AS (
        |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q,
        |    count(*) AS c
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT l_returnflag, q, c,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY c DESC, q) AS rn
        |  FROM c)
        |SELECT l_returnflag, q AS mode_quantity,
        |  CAST(c AS BIGINT) AS mode_count
        |FROM r WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,
    "coverage_docs_embeddings" ->
      """SELECT
        |  CAST(sum(CASE WHEN doc_id IS NOT NULL AND vec_id IS NOT NULL
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |  CAST(sum(CASE WHEN vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_docs_without_embedding,
        |  CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_embeddings_without_doc
        |FROM (SELECT doc_id FROM documents) d
        |FULL OUTER JOIN (SELECT vec_id FROM embeddings) e
        |  ON d.doc_id = e.vec_id""".stripMargin,
    "stats_crosstype_correlation" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |j AS (
        |  SELECT a.event_type AS t1, b.event_type AS t2,
        |    a.c AS x, b.c AS y
        |  FROM daily a JOIN daily b
        |    ON a.day = b.day AND a.event_type < b.event_type),
        |s AS (
        |  SELECT t1, t2, count(*) AS nd,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(y * y) AS BIGINT) AS syy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM j GROUP BY 1, 2)
        |SELECT t1, t2, nd,
        |  CAST(round(1000000.0 *
        |    CAST(nd * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(nd * sxx - sx * sx AS DOUBLE)
        |         * CAST(nd * syy - sy * sy AS DOUBLE))) AS BIGINT)
        |    AS corr_fp_e6
        |FROM s ORDER BY t1, t2""".stripMargin,
    "top_movers_mom" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |    l_shipdate < TIMESTAMP '1996-02-01 00:00:00' AS is_m1,
        |    CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-03-01 00:00:00')
        |SELECT l_partkey,
        |  CAST(sum(CASE WHEN is_m1 THEN cents ELSE 0 END) AS BIGINT)
        |    AS m1,
        |  CAST(sum(CASE WHEN NOT is_m1 THEN cents ELSE 0 END) AS BIGINT)
        |    AS m2,
        |  CAST(sum(CASE WHEN is_m1 THEN -cents ELSE cents END) AS BIGINT)
        |    AS delta_cents
        |FROM li GROUP BY 1
        |ORDER BY abs(CAST(sum(CASE WHEN is_m1 THEN -cents ELSE cents END)
        |                  AS BIGINT)) DESC, l_partkey
        |LIMIT 20""".stripMargin,
    "dedup_cluster_size_hist" ->
      """WITH c AS (
        |  SELECT md5(lower(trim(text))) AS fp, count(*) AS sz
        |  FROM documents GROUP BY 1)
        |SELECT sz, count(*) AS n_clusters,
        |  CAST(sz * count(*) AS BIGINT) AS n_docs
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "seasonality_dow_profile" ->
      """WITH v AS (
        |  SELECT CAST(isodow(ts) AS BIGINT) AS dow_iso,
        |    CAST(round(value * 100) AS BIGINT) AS x
        |  FROM events),
        |p AS (SELECT dow_iso, count(*) AS nd,
        |        CAST(sum(x) AS BIGINT) AS sd
        |      FROM v GROUP BY 1),
        |t AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS s FROM v)
        |SELECT dow_iso, nd, sd,
        |  CAST(round(1000000.0 * CAST(sd * n AS DOUBLE)
        |    / CAST(s * nd AS DOUBLE)) AS BIGINT) AS seasonal_idx_fp_e6
        |FROM p, t ORDER BY dow_iso""".stripMargin,
    "agg_geometric_mean" ->
      """WITH l AS (
        |  SELECT o_orderpriority,
        |    CAST(round(1000000.0 *
        |      ln(CAST(round(o_totalprice * 100, 0) AS BIGINT)))
        |      AS BIGINT) AS lx
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(round(100.0 * exp(CAST(sum(lx) AS DOUBLE)
        |    / (1000000.0 * CAST(count(*) AS DOUBLE)))) AS BIGINT)
        |    AS geo_mean_cents_fp_e2
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin,
    "graph_assortativity" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |      FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk),
        |adj AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT u AS node, count(*) AS deg
        |        FROM adj GROUP BY 1),
        |j AS (
        |  SELECT du.deg AS dx, dv.deg AS dy
        |  FROM adj JOIN deg du ON adj.u = du.node
        |           JOIN deg dv ON adj.v = dv.node),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS m2,
        |    CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
        |    CAST(sum(dx * dx) AS BIGINT) AS sxx,
        |    CAST(sum(dy * dy) AS BIGINT) AS syy,
        |    CAST(sum(dx * dy) AS BIGINT) AS sxy
        |  FROM j)
        |SELECT m2,
        |  CAST(round(1000000.0 *
        |    CAST(m2 * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(m2 * sxx - sx * sx AS DOUBLE)
        |         * CAST(m2 * syy - sy * sy AS DOUBLE))) AS BIGINT)
        |    AS assortativity_fp_e6
        |FROM a""".stripMargin,
    "stats_hhi_concentration" ->
      """WITH rev AS (
        |  SELECT c_mktsegment, c_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, count(*) AS n_customers,
        |  CAST(round(100.0 * 10000.0 *
        |    CAST(sum(cents * cents) AS DOUBLE)
        |    / CAST(sum(cents) * sum(cents) AS DOUBLE)) AS BIGINT)
        |    AS hhi_fp_e2
        |FROM rev GROUP BY 1 ORDER BY 1""".stripMargin,
    "rfm_segments" ->
      """WITH per AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_dt,
        |    count(*) AS freq,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |q AS (
        |  SELECT cents,
        |    ntile(5) OVER (ORDER BY last_dt, o_custkey) AS r,
        |    ntile(5) OVER (ORDER BY freq, o_custkey) AS f,
        |    ntile(5) OVER (ORDER BY cents, o_custkey) AS m
        |  FROM per)
        |SELECT CAST(r AS VARCHAR) || CAST(f AS VARCHAR)
        |    || CAST(m AS VARCHAR) AS segment,
        |  count(*) AS n_customers,
        |  CAST(sum(cents) AS BIGINT) AS segment_cents
        |FROM q GROUP BY 1 ORDER BY 1""".stripMargin,
    "corpus_vocab_stats" ->
      """WITH tf AS (
        |  SELECT t.tok, count(*) AS c
        |  FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
        |  GROUP BY 1)
        |SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
        |  count(*) AS n_types,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hapax,
        |  CAST(round(1000000.0 * CAST(count(*) AS DOUBLE)
        |    / CAST(sum(c) AS DOUBLE)) AS BIGINT) AS ttr_fp_e6,
        |  CAST(round(1000000.0 *
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE)) AS BIGINT) AS hapax_frac_fp_e6
        |FROM tf""".stripMargin,
    "abc_pareto_classes" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
        |      AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT o_custkey, cents,
        |    sum(cents) OVER (ORDER BY cents DESC, o_custkey
        |                     ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(cents) OVER () AS total
        |  FROM rev),
        |k AS (
        |  SELECT cents, total,
        |    CASE WHEN cum * 100 <= total * 70 THEN 'A'
        |         WHEN cum * 100 <= total * 90 THEN 'B'
        |         ELSE 'C' END AS cls
        |  FROM c)
        |SELECT cls, count(*) AS n_customers,
        |  CAST(sum(cents) AS BIGINT) AS class_cents,
        |  CAST(round(1000000.0 * CAST(sum(cents) AS DOUBLE)
        |    / CAST(max(total) AS DOUBLE)) AS BIGINT) AS share_fp_e6
        |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    "stats_two_proportion_z" ->
      """WITH o AS (
        |  SELECT c_mktsegment,
        |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
        |      AS hit
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |seg AS (
        |  SELECT c_mktsegment, count(*) AS n1,
        |    CAST(sum(hit) AS BIGINT) AS x1
        |  FROM o GROUP BY 1),
        |tot AS (SELECT count(*) AS nt, CAST(sum(hit) AS BIGINT) AS xt
        |        FROM o)
        |SELECT c_mktsegment, n1, x1,
        |  CAST(nt - n1 AS BIGINT) AS n2,
        |  CAST(xt - x1 AS BIGINT) AS x2,
        |  CAST(round(1000000.0 *
        |    (CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(xt - x1 AS DOUBLE) / CAST(nt - n1 AS DOUBLE)) /
        |    sqrt(CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE)
        |         * (1.0 - CAST(xt AS DOUBLE) / CAST(nt AS DOUBLE))
        |         * (1.0 / CAST(n1 AS DOUBLE)
        |            + 1.0 / CAST(nt - n1 AS DOUBLE)))) AS BIGINT)
        |    AS z_fp_e6
        |FROM seg, tot ORDER BY c_mktsegment""".stripMargin,
    "integrity_partition_checksums" ->
      """WITH h AS (
        |  SELECT source,
        |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
        |      '|', text)), 1, 15)) AS BIGINT) AS h
        |  FROM documents)
        |SELECT source, count(*) AS n_rows,
        |  CAST(bit_xor(h) AS BIGINT) AS content_xor
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    "stats_survival_nelson_aalen" ->
      """WITH s1 AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN ts END) AS signup,
        |    max(ts) AS lastts
        |  FROM events GROUP BY 1),
        |d1 AS (
        |  SELECT e.user_id, min(e.ts) AS death
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s1.signup
        |  GROUP BY 1),
        |users AS (
        |  SELECT s1.user_id,
        |    CAST(floor((floor(epoch(coalesce(death, lastts)))
        |                - floor(epoch(signup))) / 60.0) AS BIGINT) AS t_min,
        |    death IS NOT NULL AS event
        |  FROM s1 LEFT JOIN d1 ON s1.user_id = d1.user_id
        |  WHERE signup IS NOT NULL),
        |times AS (
        |  SELECT t_min, count(*) AS cnt,
        |    sum(CASE WHEN event THEN 1 ELSE 0 END) AS d
        |  FROM users GROUP BY 1),
        |r AS (
        |  SELECT t_min, d,
        |    sum(cnt) OVER () - sum(cnt) OVER
        |      (ORDER BY t_min ROWS UNBOUNDED PRECEDING) + cnt AS n_risk
        |  FROM times),
        |f AS (
        |  SELECT t_min, n_risk, d,
        |    CAST(round(1000000.0 * CAST(d AS DOUBLE)
        |      / CAST(n_risk AS DOUBLE)) AS BIGINT) AS term
        |  FROM r WHERE d > 0)
        |SELECT t_min, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS d,
        |  CAST(sum(term) OVER (ORDER BY t_min ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS cumhaz_fp_e6
        |FROM f ORDER BY t_min""".stripMargin,
    "entity_resolution_e2e" ->
      """WITH RECURSIVE p AS (
        |  SELECT p_partkey, p_brand, p_size, p_name FROM part),
        |pairs AS (
        |  SELECT a.p_partkey AS x, b.p_partkey AS y
        |  FROM p a JOIN p b
        |    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |   AND a.p_partkey < b.p_partkey
        |   AND damerau_levenshtein(a.p_name, b.p_name) <= 2),
        |edges AS (SELECT x AS a, y AS b FROM pairs
        |          UNION SELECT y, x FROM pairs),
        |reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node),
        |cl AS (SELECT node, min(r) AS component FROM reach GROUP BY 1)
        |SELECT p.p_partkey,
        |  CAST(coalesce(cl.component, p.p_partkey) AS BIGINT)
        |    AS canonical_key
        |FROM p LEFT JOIN cl ON p.p_partkey = cl.node
        |ORDER BY p.p_partkey""".stripMargin,
    // AS MATERIALIZED: DuckDB 1.0 inlines CTEs per reference, and the
    // recursive reach member would re-run the neighbor scoring per
    // iteration — pin single evaluation (same fix as the
    // dedup_cluster_cc_auto oracle).
    "entity_resolution_snm" ->
      """WITH RECURSIVE p AS (
        |  SELECT p_partkey, p_brand, p_size, p_name FROM part),
        |o AS (
        |  SELECT p_partkey, p_brand, p_size, p_name,
        |    row_number() OVER (PARTITION BY p_brand, p_size
        |                       ORDER BY p_name, p_partkey) AS rn
        |  FROM p),
        |pairs AS MATERIALIZED (
        |  SELECT DISTINCT least(a.p_partkey, b.p_partkey) AS x,
        |         greatest(a.p_partkey, b.p_partkey) AS y
        |  FROM o a JOIN o b
        |    ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        |   AND b.rn BETWEEN a.rn + 1 AND a.rn + 8
        |  WHERE damerau_levenshtein(a.p_name, b.p_name) <= 2),
        |edges AS MATERIALIZED (SELECT x AS a, y AS b FROM pairs
        |          UNION SELECT y, x FROM pairs),
        |reach(node, r) AS (
        |  SELECT a, a FROM edges
        |  UNION
        |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node),
        |cl AS (SELECT node, min(r) AS component FROM reach GROUP BY 1)
        |SELECT p.p_partkey,
        |  CAST(coalesce(cl.component, p.p_partkey) AS BIGINT)
        |    AS canonical_key
        |FROM p LEFT JOIN cl ON p.p_partkey = cl.node
        |ORDER BY p.p_partkey""".stripMargin,
    "anomaly_rolling_zscore" ->
      """WITH v AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(round(value * 100) AS BIGINT) AS x
        |  FROM events),
        |f AS (
        |  SELECT event_id, event_type, x,
        |    count(*) OVER w AS n,
        |    sum(x) OVER w AS s1,
        |    sum(x * x) OVER w AS s2
        |  FROM v
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |               ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, event_type, x, n,
        |  ((n * x - s1) * (n * x - s1) > 4 * (n * s2 - s1 * s1)
        |   AND n * x > s1) AS is_spike
        |FROM f WHERE n >= 5 ORDER BY event_id""".stripMargin,
    "window_rolling_slope" ->
      """WITH v AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(floor((epoch(ts) - epoch(TIMESTAMP '2024-01-01 00:00:00'))
        |               / 60) AS BIGINT) AS x,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events),
        |f AS (
        |  SELECT event_id, event_type,
        |    count(*) OVER w AS n,
        |    sum(x) OVER w AS sx, sum(y) OVER w AS sy,
        |    sum(x * x) OVER w AS sxx, sum(x * y) OVER w AS sxy
        |  FROM v
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT event_id, event_type,
        |  CASE WHEN n >= 2 AND n * sxx - sx * sx <> 0
        |    THEN CAST(round(1000000.0 *
        |      CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
        |  END AS slope_fp_e6
        |FROM f ORDER BY event_id""".stripMargin,
    "profile_selfjoin_size_f2" ->
      """WITH c AS (
        |  SELECT l_suppkey, count(*) AS c FROM lineitem GROUP BY 1),
        |f AS (
        |  SELECT count(*) AS n_keys,
        |    CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(sum(c * c) AS BIGINT) AS f2_est
        |  FROM c),
        |a AS (
        |  SELECT CAST(sum(x.c * y.c) AS BIGINT) AS actual
        |  FROM c x JOIN c y ON x.l_suppkey = y.l_suppkey)
        |SELECT n_keys, n_rows, f2_est,
        |  f2_est = actual AS estimate_exact
        |FROM f, a""".stripMargin,
    "agg_topk_heap" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
        |    o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice * 100, 0) AS BIGINT) DESC,
        |               o_orderkey) AS rk
        |  FROM orders)
        |SELECT o_orderpriority, CAST(rk AS INT) AS rk, cents, o_orderkey
        |FROM r WHERE rk <= 3 ORDER BY o_orderpriority, rk""".stripMargin,
    "graph_common_neighbors_capped" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |      FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk),
        |adj0 AS (SELECT u AS node, v AS nbr FROM e
        |         UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT node, count(*) AS deg FROM adj0 GROUP BY 1),
        |adj AS (SELECT a.node, a.nbr FROM adj0 a
        |        JOIN deg dm ON a.nbr = dm.node AND dm.deg <= 96),
        |cm AS (
        |  SELECT x.node AS u, y.node AS v, count(*) AS common
        |  FROM adj x JOIN adj y ON x.nbr = y.nbr AND x.node < y.node
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT cm.u, cm.v, cm.common,
        |  CAST(cm.common AS DOUBLE)
        |    / CAST(du.deg + dv.deg - cm.common AS DOUBLE) AS jaccard
        |FROM cm JOIN deg du ON cm.u = du.node
        |        JOIN deg dv ON cm.v = dv.node
        |ORDER BY jaccard DESC, cm.u, cm.v LIMIT 50""".stripMargin,
    "table_diff_audit" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k,
        |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |old AS (SELECT k, cents AS old_cents FROM base WHERE k % 11 <> 0),
        |neu AS (SELECT k, cents + CASE WHEN k % 5 = 0 THEN 1 ELSE 0 END
        |          AS new_cents
        |        FROM base WHERE k % 13 <> 0),
        |j AS (
        |  SELECT coalesce(old.k, neu.k) AS k, old_cents, new_cents,
        |    CASE WHEN old_cents IS NULL THEN 'added'
        |         WHEN new_cents IS NULL THEN 'removed'
        |         WHEN old_cents <> new_cents THEN 'changed' END AS status
        |  FROM old FULL OUTER JOIN neu ON old.k = neu.k)
        |SELECT k, status, old_cents, CAST(new_cents AS BIGINT) AS new_cents
        |FROM j WHERE status IS NOT NULL ORDER BY k""".stripMargin,
    "quantile_normalize_sources" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |n AS (SELECT count(*) AS n FROM d),
        |r AS (
        |  SELECT doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY source) AS ns
        |  FROM d),
        |g AS (
        |  SELECT n_chars AS cal_n_chars,
        |    row_number() OVER (ORDER BY n_chars, doc_id) AS gidx
        |  FROM d)
        |SELECT r.doc_id, r.source, r.n_chars, g.cal_n_chars
        |FROM r, n
        |JOIN g ON g.gidx = CAST(floor(
        |  CAST(n.n * r.rn + r.ns - 1 AS DOUBLE) / CAST(r.ns AS DOUBLE))
        |  AS BIGINT)
        |ORDER BY r.doc_id""".stripMargin,
    "assoc_rules_pairs" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |n AS (SELECT count(DISTINCT ok) AS n_orders FROM pp),
        |item AS (SELECT pk, count(*) AS supp FROM pp GROUP BY 1),
        |pair AS (
        |  SELECT a.pk AS u, b.pk AS v, count(*) AS supp_uv
        |  FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT u, v,
        |  CAST(supp_uv AS BIGINT) AS supp_uv,
        |  CAST(iu.supp AS BIGINT) AS supp_u,
        |  CAST(iv.supp AS BIGINT) AS supp_v,
        |  CAST(round(1000000.0 * CAST(supp_uv AS DOUBLE)
        |    / CAST(iu.supp AS DOUBLE)) AS BIGINT) AS conf_fp_e6,
        |  CAST(round(1000000.0 * n_orders * CAST(supp_uv AS DOUBLE)
        |    / CAST(iu.supp * iv.supp AS DOUBLE)) AS BIGINT) AS lift_fp_e6
        |FROM pair
        |JOIN item iu ON pair.u = iu.pk
        |JOIN item iv ON pair.v = iv.pk
        |CROSS JOIN n
        |ORDER BY lift_fp_e6 DESC, u, v LIMIT 20""".stripMargin,
    "sketch_ams_f2" ->
      """WITH c AS (
        |  SELECT l_suppkey, count(*) AS c FROM lineitem GROUP BY 1),
        |f AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM c),
        |z AS (
        |  SELECT CAST(j AS INT) AS j,
        |    CAST(sum(CASE WHEN CAST(concat('0x',
        |        substr(md5(concat(CAST(j AS VARCHAR), '|',
        |                          CAST(l_suppkey AS VARCHAR))), 1, 15))
        |        AS BIGINT) % 2 = 0 THEN c ELSE -c END) AS BIGINT) AS zz
        |  FROM c, UNNEST(range(8)) AS u(j) GROUP BY 1)
        |SELECT j, CAST(zz * zz AS BIGINT) AS est, f2_exact
        |FROM z, f ORDER BY j""".stripMargin,
    "interpolate_linear_days" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS x
        |  FROM events WHERE event_type = 'purchase' AND user_id = 0
        |  GROUP BY 1),
        |spine AS (
        |  SELECT unnest(generate_series(min(day), max(day),
        |                                INTERVAL 1 DAY)) AS day
        |  FROM daily),
        |j AS (
        |  SELECT CAST(s.day AS DATE) AS day, d.x,
        |    last_value(d.x IGNORE NULLS) OVER
        |      (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING
        |       AND 1 PRECEDING) AS prev_x,
        |    last_value(CASE WHEN d.x IS NOT NULL
        |               THEN CAST(s.day AS DATE) END IGNORE NULLS) OVER
        |      (ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING
        |       AND 1 PRECEDING) AS prev_day,
        |    first_value(d.x IGNORE NULLS) OVER
        |      (ORDER BY s.day ROWS BETWEEN 1 FOLLOWING
        |       AND UNBOUNDED FOLLOWING) AS next_x,
        |    first_value(CASE WHEN d.x IS NOT NULL
        |                THEN CAST(s.day AS DATE) END IGNORE NULLS) OVER
        |      (ORDER BY s.day ROWS BETWEEN 1 FOLLOWING
        |       AND UNBOUNDED FOLLOWING) AS next_day
        |  FROM spine s LEFT JOIN daily d ON CAST(s.day AS DATE) = d.day)
        |SELECT day, x IS NOT NULL AS known,
        |  CASE WHEN x IS NOT NULL
        |    THEN CAST(round(10000.0 * CAST(x AS DOUBLE)) AS BIGINT)
        |    ELSE CAST(round(10000.0 *
        |      (CAST(prev_x AS DOUBLE) +
        |        CAST((next_x - prev_x)
        |             * date_diff('day', prev_day, day) AS DOUBLE)
        |        / CAST(date_diff('day', prev_day, next_day) AS DOUBLE)))
        |      AS BIGINT) END AS value_fp_e4
        |FROM j ORDER BY day""".stripMargin,
    "profile_key_skew" ->
      """WITH p AS (
        |  SELECT 'l_orderkey' AS key_col, count(*) AS c
        |  FROM lineitem GROUP BY l_orderkey
        |  UNION ALL
        |  SELECT 'l_partkey', count(*) FROM lineitem GROUP BY l_partkey
        |  UNION ALL
        |  SELECT 'l_suppkey', count(*) FROM lineitem GROUP BY l_suppkey)
        |SELECT key_col,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  count(*) AS n_keys,
        |  CAST(max(c) AS BIGINT) AS max_cnt,
        |  CAST(round(1000.0 * CAST(max(c) AS DOUBLE)
        |    / (CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE)))
        |    AS BIGINT) AS skew_fp_e3
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "profile_null_report" ->
      """WITH a AS (
        |  SELECT count(*) AS n, count(ts) AS c_ts,
        |    count(user_id) AS c_user_id,
        |    count(event_type) AS c_event_type,
        |    count(value) AS c_value, count(props) AS c_props
        |  FROM events),
        |u AS (
        |  SELECT n, column_name,
        |    CASE column_name
        |      WHEN 'ts' THEN c_ts WHEN 'user_id' THEN c_user_id
        |      WHEN 'event_type' THEN c_event_type
        |      WHEN 'value' THEN c_value ELSE c_props END AS c
        |  FROM a, (VALUES ('ts'), ('user_id'), ('event_type'), ('value'),
        |                  ('props')) AS v(column_name))
        |SELECT column_name,
        |  CAST(n - c AS BIGINT) AS n_null,
        |  CAST(round(1000000.0 * CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |    AS BIGINT) AS fill_fp_e6
        |FROM u ORDER BY column_name""".stripMargin,
    "split_train_val_test" ->
      """WITH s AS (
        |  SELECT source,
        |    CASE WHEN CAST(concat('0x',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |           % 100 < 80 THEN 'train'
        |         WHEN CAST(concat('0x',
        |           substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        |           % 100 < 90 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT source, split, count(*) AS cnt
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "window_ewma_halflife" ->
      """WITH v AS (
        |  SELECT event_id, event_type, ts,
        |    CAST(round(value * 100) AS BIGINT) AS x
        |  FROM events)
        |SELECT event_id, event_type, x,
        |  coalesce(lag(x, 0) OVER w, 0) * 128 +
        |  coalesce(lag(x, 1) OVER w, 0) * 64 +
        |  coalesce(lag(x, 2) OVER w, 0) * 32 +
        |  coalesce(lag(x, 3) OVER w, 0) * 16 +
        |  coalesce(lag(x, 4) OVER w, 0) * 8 +
        |  coalesce(lag(x, 5) OVER w, 0) * 4 +
        |  coalesce(lag(x, 6) OVER w, 0) * 2 +
        |  coalesce(lag(x, 7) OVER w, 0) AS ewma_x256
        |FROM v
        |WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "profile_benford_digits" ->
      """WITH d AS (
        |  SELECT o_orderpriority,
        |    substring(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
        |              AS VARCHAR), 1, 1) AS digit
        |  FROM orders),
        |c AS (SELECT o_orderpriority, digit, count(*) AS cnt
        |      FROM d GROUP BY 1, 2)
        |SELECT o_orderpriority, digit, cnt,
        |  CAST(round(1000000.0 * CAST(cnt AS DOUBLE) /
        |    CAST(sum(cnt) OVER (PARTITION BY o_orderpriority) AS DOUBLE))
        |    AS BIGINT) AS freq_fp_e6
        |FROM c ORDER BY 1, 2""".stripMargin)
}
