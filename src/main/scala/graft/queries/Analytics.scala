package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.Tables.t
import graft.functions.Fns._
import graft.operators.Skew

/** Second-wave analytics operators (round 2): the relational surface a
  * reference user would expect beyond SURVEY §2's literal inventory —
  * semi/anti joins, EXCEPT/INTERSECT, grouping sets (ROLLUP/CUBE),
  * exact percentiles, running/moving/lag windows, ntile, deterministic
  * hash sampling, two-phase distinct counts, date arithmetic and regex
  * cleanup. All follow the determinism rules in [[Relational]] (decimal
  * money sums, total-order tiebreaks, engine-portable md5 hashing).
  *
  * Scale notes are on each query; the common theme is that every one
  * of these is a single shuffle (or none): semi/anti joins prune
  * payload columns before the exchange, grouping sets share one
  * scan+shuffle for all grouping levels, window queries sort once per
  * partition key, and the hash sample is a pure map-side filter.
  */
object Analytics {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- graph: triangle counting ---------------------------------------
    "graph_triangle_count" -> ((s, d) => {
      // G5: exact triangle count over the part co-purchase graph
      // (parts sharing an order are adjacent). Edges oriented by
      // DEGREE (low -> high), which bounds every out-neighbourhood at
      // O(√m) even under power-law hubs; the count is then the
      // sorted-adjacency intersection (Triangles.countAdjacency):
      // Σ_edges |N⁺(u) ∩ N⁺(v)| via the native merge-scan expression
      // — the wedge set (Σ outdeg², 1.4 B rows at sf1) is never
      // materialized or shuffled, unlike the two-equi-join wedge
      // formulation (kept as Triangles.count, equality pinned in
      // TrianglesSpec). Edge building dedups (order, part) first so
      // M:N lineitems don't multiply pairs.
      // pair generation: one-shuffle group-to-array expansion
      // (operators/CoPurchase, r20 -- identical pair multiset, 3
      // input-sized exchanges -> 1)
      val e = graft.operators.CoPurchase.pairs(t(s, d, "lineitem"),
        col("l_orderkey"), col("l_partkey"))
      graft.operators.Triangles.countAdjacency(
        graft.operators.Triangles.orientByDegree(e))
    }),
    "bucketed_join_colocated" -> ((s, d) => {
      // S19: co-located join via bucketed tables — both sides written
      // bucketBy(8, join key) + sortBy, one file per bucket
      // (repartition on the same hash before write), so the
      // sort-merge join aligns buckets 1:1 and the join itself needs
      // NO Exchange (pinned in PlanShapeSpec: the only shuffles in
      // the plan belong to the aggregate and final sort). At 100 TB
      // this is the difference between re-shuffling the fact table on
      // every join and a scan-local merge — the layout cost is paid
      // once at write time. Table names carry the applicationId (two
      // concurrent JVMs over one warehouse never collide on a name)
      // and creation goes through Layout.createTableOnce (a JVM-wide
      // guard: concurrent invocations within a session — parallel
      // Verify, bench loops — run the DROP + stale-dir clear + write
      // exactly once and then reuse, so nothing can race the rewrite
      // and repeat invocations pay only the scan, matching the
      // pay-once layout cost model).
      val tag = (d + "_" + s.sparkContext.applicationId)
        .replaceAll("[^a-zA-Z0-9]", "_")
      val ob = s"graft_bkt_orders_$tag"
      val cb = s"graft_bkt_cust_$tag"
      val hconf = s.sparkContext.hadoopConfiguration
      val wh = s.conf.get("spark.sql.warehouse.dir")
      def createBucketed(tn: String, src: String, key: String): Unit =
        graft.sources.Layout.createTableOnce(s, tn) {
          s.sql(s"DROP TABLE IF EXISTS $tn")
          // the in-memory catalog forgets tables across sessions but
          // the filesystem doesn't — clear the stale dir too
          val p = new org.apache.hadoop.fs.Path(wh, tn)
          p.getFileSystem(hconf).delete(p, true)
          t(s, d, src).repartition(8, col(key))
            .write.format("parquet")
            .bucketBy(8, key).sortBy(key).saveAsTable(tn)
        }
      createBucketed(ob, "orders", "o_custkey")
      createBucketed(cb, "customer", "c_custkey")
      s.table(cb).hint("merge")
        .join(s.table(ob), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
             dbl(sum(money(col("o_totalprice")))).as("revenue"))
        .orderBy("c_mktsegment")
    }),
    "stats_gini" -> ((s, d) => {
      // A25: Gini inequality coefficient of order value per priority
      // class via the rank formula G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx)
      // over EXACT cents and total-order ranks — numerator and
      // denominator are bigint, the single double division is the only
      // float op. One window sort + one aggregate. (At 100 TB the
      // bigint Σi·x can overflow ~2^63 around 10¹⁰ rows·cents — swap
      // the two sums to DECIMAL(38,0) there; same plan.)
      val cents = round(col("o_totalprice") * 100, 0).cast("long")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("x"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), cents.as("x"))
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
             sum(col("i") * col("x")).as("six"))
        .select(col("o_orderpriority"), col("n"),
          ((lit(2L) * col("six") - (col("n") + 1) * col("sx")).cast("double")
            / (col("n") * col("sx")).cast("double")).as("gini"))
        .orderBy("o_orderpriority")
    }),
    "anomaly_mad_exact" -> ((s, d) => {
      // A26: median absolute deviation per event type — the robust
      // outlier scale zscores can't give under heavy tails. Both
      // medians are DISCRETE (value at ceil(n/2) on a total-order
      // key), so every output is an actual data value in exact cents;
      // two window sorts on the same partition key (one shuffle,
      // Spark reuses the hash partitioning for the second window).
      val cents = round(col("value") * 100, 0).cast("long")
      val w1 = Window.partitionBy(col("event_type"))
        .orderBy(col("x"), col("event_id"))
      val ranked = Tables.events(s, d)
        // null values are NOT observations: without the filter a null
        // measurement enters rank and n — and Spark ranks nulls FIRST
        // (ascending) where DuckDB ranks them LAST, so the two medians
        // silently pick different elements. Caught by the r18 planted
        // null-payload event at the sf1 gate; the explicit drop is the
        // statistical definition, pinned on both sides.
        .where(col("value").isNotNull)
        .select(col("event_type"), col("event_id"), cents.as("x"))
        .withColumn("rn", row_number().over(w1))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      val med = ranked.where(col("rn") === ceil(col("n") * 0.5))
        .select(col("event_type"), col("x").as("med"))
      val w2 = Window.partitionBy(col("event_type"))
        .orderBy(col("dev"), col("event_id"))
      ranked.join(med, "event_type")
        .withColumn("dev", abs(col("x") - col("med")))
        .withColumn("rn2", row_number().over(w2))
        .where(col("rn2") === ceil(col("n") * 0.5))
        .select(col("event_type"), col("n"), col("med").as("med_cents"),
                col("dev").as("mad_cents"))
        .orderBy("event_type")
    }),
    "graph_clustering_coeff" -> ((s, d) => {
      // G7: local clustering coefficient per part — per-node triangle
      // credit via sorted-adjacency intersection
      // (Triangles.perNodeAdjacency: only credit rows, 3×#triangles,
      // reach the aggregate — no wedge-sized shuffle; degree
      // orientation bounds each row's merge scan at O(√m)) over
      // (deg choose 2). The coefficient is one double division of
      // exact integers, identical in both engines. The expensive pp
      // self-join feeds degree, orientation, AND the final join, so
      // the canonical edge list is materialized ONCE and its degree
      // frame (node-sized) shared between the orientation and the
      // (deg choose 2) denominator. Pair generation is the one-shuffle
      // group-to-array expansion (operators/CoPurchase — r20: replaces
      // the distinct + self-join prologue, 3 input-sized exchanges → 1,
      // identical pair multiset).
      val raw = graft.operators.CoPurchase.pairs(t(s, d, "lineitem"),
        col("l_orderkey"), col("l_partkey"))
      val canon = graft.operators.Triangles.orientById(raw).localCheckpoint()
      val deg = graft.operators.Triangles.degrees(canon).localCheckpoint()
      // batched variant: identical plan below the Σ outdeg² budget
      // (every bench SF except sf10); above it, hash-sliced with
      // eagerly-drained node-grain partials so the wedge-sized
      // exchange never outgrows the page cache (the r14 sf10 cliff)
      val tri = graft.operators.Triangles.perNodeAdjacencyBatched(
        graft.operators.Triangles.orientByDegreeCanonical(canon, deg))
      deg.where(col("deg") >= 2)
        .join(tri, Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("tri_cnt"), lit(0L)).as("tri_cnt"),
          ((coalesce(col("tri_cnt"), lit(0L)) * 2).cast("double")
            / (col("deg") * (col("deg") - 1)).cast("double")).as("cc"))
        .orderBy("node")
    }),
    "graph_kcore" -> ((s, d) => {
      // G9: 3-core of the co-purchase graph (operators/KCore,
      // bulk-synchronous peeling) — the graph-density curation signal:
      // high cores are boilerplate/spam rings, core-less nodes are
      // long tail. The DuckDB oracle unrolls the bulk-synchronous peel
      // as chained CTEs (kcorePeelSql — the peel is idempotent at its
      // fixpoint, so unrolling past the measured depth computes the
      // exact k-core); KCoreSpec adds closed forms, a cascading peel,
      // and sequential-reference agreement.
      // pair generation: one-shuffle group-to-array expansion
      // (operators/CoPurchase, r20 -- identical pair multiset, 3
      // input-sized exchanges -> 1)
      val raw = graft.operators.CoPurchase.pairs(t(s, d, "lineitem"),
        col("l_orderkey"), col("l_partkey"))
      graft.operators.KCore.nodes(
          graft.operators.Triangles.orientById(raw), 3)
        .orderBy("node")
    }),
    "graph_ktruss" -> ((s, d) => {
      // G11: 4-truss edges of the co-purchase graph (operators/
      // KTruss) — edge-level cohesion: every surviving edge closes
      // ≥ 2 triangles, which kills bridges and stars that the k-core
      // keeps. The DuckDB oracle unrolls the support peel as chained
      // CTEs (ktrussPeelSql — idempotent at the fixpoint, unrolled
      // past the measured depth); KTrussSpec adds closed forms, the
      // cascade case, sequential-reference agreement, truss⊂core
      // nesting.
      // pair generation: one-shuffle group-to-array expansion
      // (operators/CoPurchase, r20 -- identical pair multiset, 3
      // input-sized exchanges -> 1)
      val raw = graft.operators.CoPurchase.pairs(t(s, d, "lineitem"),
        col("l_orderkey"), col("l_partkey"))
      graft.operators.KTruss.edges(
          graft.operators.Triangles.orientById(raw), 4)
        .orderBy("u", "v")
    }),
    "graph_core_decomposition" -> ((s, d) => {
      // G10b: core NUMBER per node (max k with the node in the
      // k-core), capped at k=8 — the node-level sibling of
      // graph_truss_decomposition's edge profile. The input is the
      // REPEAT co-purchase graph (part pairs co-ordered in ≥ 2
      // distinct orders): the full co-purchase projection is so dense
      // its minimum coreness is 42 at sf0.01, which makes any capped
      // profile flat — the support threshold is the standard
      // association-graph noise cut and leaves a real erosion band
      // (degrees 1–13, median 3). Incremental peel: level k+1 starts
      // from level k's surviving edges ((k+1)-core ⊆ k-core). Oracle:
      // coreDecompSql, the same incremental unroll in CTEs; coreness
      // = count of level fixpoints containing the node (nesting makes
      // count ≡ max level).
      // pair generation: one-shuffle group-to-array expansion
      // (operators/CoPurchase, r20 -- identical pair multiset, 3
      // input-sized exchanges -> 1)
      val raw = graft.operators.CoPurchase.pairs(t(s, d, "lineitem"),
        col("l_orderkey"), col("l_partkey"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
        .select(col("u"), col("v"))
      graft.operators.KCore.coreness(
          graft.operators.Triangles.orientById(raw), 8)
        .orderBy("node")
    }),
    "graph_truss_decomposition" -> ((s, d) => {
      // G11b: truss NUMBER per co-purchase edge (max k with the edge
      // in the k-truss), capped at k=6 — the full cohesion profile
      // next to graph_ktruss's single slice. Incremental peel: level
      // k+1 starts from level k's surviving edges ((k+1)-truss ⊆
      // k-truss), so each level's work follows the shrinking truss,
      // not the full graph. The cap bounds the level count the same
      // way graph_common_neighbors_capped bounds hub fan-out.
      // Input is the REPEAT co-purchase graph (pairs co-ordered in
      // ≥ 2 distinct orders) — the same association-graph noise cut
      // graph_core_decomposition applies, and for the same reasons:
      // the raw projection is so dense the capped profile saturates
      // flat, and its per-round triangle recount put the sf1 DuckDB
      // mirror past any sane budget (>1200 s — the r10 sweep's one
      // structural skip). On the thresholded graph the profile has a
      // real erosion band and the mirror verifies at every SF.
      // graph_ktruss keeps the raw dense graph as the single-slice
      // coverage. Oracle: trussDecompSql, the same incremental
      // unroll in CTEs.
      // pair generation: one-shuffle group-to-array expansion
      // (operators/CoPurchase, r20 -- identical pair multiset, 3
      // input-sized exchanges -> 1)
      val raw = graft.operators.CoPurchase.pairs(t(s, d, "lineitem"),
        col("l_orderkey"), col("l_partkey"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
        .select(col("u"), col("v"))
      graft.operators.KTruss.trussness(
          graft.operators.Triangles.orientById(raw), 6)
        .orderBy("u", "v")
    }),
    "graph_degree_topk" -> ((s, d) => {
      // G6: top-20 hub parts by co-purchase degree (distinct
      // neighbours in the same graph as graph_triangle_count). One
      // edge-sized dedup + one count per node; p_partkey breaks ties
      // totally under the LIMIT.
      // pair generation: one-shuffle group-to-array expansion
      // (operators/CoPurchase, r20 -- identical pair multiset, 3
      // input-sized exchanges -> 1)
      val e = graft.operators.CoPurchase.pairs(t(s, d, "lineitem"),
        col("l_orderkey"), col("l_partkey"))
      graft.operators.Triangles.orientById(e)
        .select(explode(array(col("u"), col("v"))).as("node")) // 1 scan
        .groupBy("node").agg(count(lit(1)).as("degree"))
        .orderBy(col("degree").desc, col("node"))
        .limit(20)
    }),

    // ---- windows: distribution / share ----------------------------------
    "window_cume_dist" -> ((s, d) => {
      // W20: cumulative distribution of account balance inside each
      // market segment. The ORDER BY key includes c_custkey so ranks
      // are total (no tie plateaus) and cume_dist is the exact
      // rational n/m evaluated in IEEE double identically by both
      // engines; scaled to integer e9 for a byte-stable hash.
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          round(cume_dist().over(w) * lit(1e9)).cast("long").as("cd_e9"))
        .orderBy("c_custkey")
    }),
    "window_ratio_to_report" -> ((s, d) => {
      // W21: each supplier's share of its nation's shipped quantity
      // (ratio-to-report). Numerator and denominator are both EXACT
      // decimal sums (group sum + window re-sum of it), so the final
      // double division is bit-identical at any parallelism; only
      // then does the value leave exact arithmetic.
      val rev = t(s, d, "lineitem")
        .groupBy(col("l_suppkey"))
        .agg(sum(money(col("l_quantity"))).as("qty"))
      val bySupp = t(s, d, "supplier")
        .join(rev, col("s_suppkey") === col("l_suppkey"))
      val w = Window.partitionBy(col("s_nationkey"))
      bySupp.select(col("s_nationkey"), col("s_suppkey"),
          (dbl(col("qty")) / dbl(sum(col("qty")).over(w))).as("share"))
        .orderBy("s_nationkey", "s_suppkey")
    }),

    // ---- skew-mitigated join (operators/Skew) ---------------------------
    "join_skew_salted" -> ((s, d) => {
      // J15: Skew.saltedJoin end-to-end — the broadcast-ineligible
      // skewed-key pattern: big side salted deterministically, small
      // side replicated `factor` times, join on (key, salt). The
      // result is provably the plain inner join (the oracle IS the
      // plain join), so correctness of the rewrite is what's checked.
      val big = t(s, d, "lineitem")
        .select(col("l_suppkey").as("s_suppkey"),
                money(col("l_quantity")).as("qty"))
      val small = t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))
      Skew.saltedJoin(big, small, Seq("s_suppkey"), factor = 8)
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(dbl(sum(col("qty"))).as("sum_qty"))
        .orderBy("s_suppkey")
    }),

    "join_null_safe" -> ((s, d) => {
      // J16: null-safe equality join (<=> / IS NOT DISTINCT FROM) —
      // NULL keys match EACH OTHER, unlike ordinary equi-joins where
      // they match nothing. Catalyst still plans <=> as a hash-join
      // key (coalesce-normalized), so this stays an equi-join, never
      // a nested loop. NULLS FIRST pinned in the sort (engines
      // disagree on defaults).
      val o = t(s, d, "orders")
        .select(expr("nullif(o_orderstatus, 'O')").as("k"))
      val dim = o.distinct()
      o.as("l").join(dim.as("r"), col("l.k") <=> col("r.k"))
        .groupBy(col("r.k").as("k_grp"))
        .agg(count(lit(1)).as("cnt"))
        .withColumnRenamed("k_grp", "k")
        .orderBy(col("k").asc_nulls_first)
    }),

    // ---- semi / anti joins ----------------------------------------------
    "join_semi" -> ((s, d) => {
      // J8: existence check WITHOUT fanout — left_semi never duplicates
      // left rows and never carries right columns, so only the join key
      // shuffles (at 100 TB: semi-join beats join+distinct by the width
      // of the payload).
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),
    "join_anti" -> ((s, d) => {
      // J9: NOT EXISTS — customers with no URGENT order.
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").where(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),

    // ---- set ops beyond UNION ---------------------------------------------
    "except_distinct" -> ((s, d) => {
      // U2: EXCEPT (distinct semantics) — ordering customers outside
      // the BUILDING segment.
      val a = t(s, d, "orders").select(col("o_custkey").as("custkey")).distinct()
      val b = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      a.except(b).orderBy("custkey")
    }),
    "intersect_distinct" -> ((s, d) => {
      // U3: INTERSECT (distinct semantics).
      val a = t(s, d, "orders").select(col("o_custkey").as("custkey")).distinct()
      val b = t(s, d, "customer").where(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      a.intersect(b).orderBy("custkey")
    }),

    // ---- grouping sets ------------------------------------------------------
    "grouping_rollup" -> ((s, d) =>
      // A9: ROLLUP — every grouping level computed from ONE scan and
      // one shuffle (vs. a union of per-level aggregates). Labels are
      // coalesced so output carries no engine-ordering-sensitive nulls.
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(moneySum(col("l_extendedprice")).as("sum_price"),
             count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
                coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
                col("sum_price"), col("cnt"))
        .orderBy("returnflag", "linestatus")),
    "grouping_cube" -> ((s, d) =>
      // A10: CUBE with the grouping_id bitmask (same bit order as SQL
      // GROUPING(a, b)).
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), grouping_id().cast("int").as("gid"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
                coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
                col("cnt"), col("gid"))
        .orderBy("returnflag", "linestatus")),

    // ---- percentiles / distribution -----------------------------------------
    "agg_weighted_median" -> ((s, d) => {
      // A24: WEIGHTED percentiles (median + p90 of extended price,
      // weighted by quantity) by integer cumulative-weight crossing:
      // the answer is min(v) among rows with k·cum ≥ q·k·tot, all in
      // exact integer arithmetic — no interpolation, no doubles in the
      // selection rule, so both engines pick the identical row. One
      // windowed pass per group; the RANGE frame makes tied values
      // share their cumulative weight, so ties cannot split the
      // crossing.
      val w = Window.partitionBy(col("g")).orderBy(col("v"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.partitionBy(col("g"))
      val c = t(s, d, "lineitem").select(
        col("l_returnflag").as("g"), col("l_extendedprice").as("v"),
        col("l_quantity").cast("long").as("wt"))
      val cum = c.withColumn("cum", sum(col("wt")).over(w))
        .withColumn("tot", sum(col("wt")).over(all))
      cum.groupBy(col("g").as("l_returnflag"))
        .agg(
          min(when(col("cum") * 2 >= col("tot"), col("v")))
            .as("wmedian"),
          min(when(col("cum") * 10 >= col("tot") * 9, col("v")))
            .as("wp90"),
          max(col("tot")).as("total_weight"))
        .orderBy("l_returnflag")
    }),
    "percentile_grouped" -> ((s, d) =>
      // A11: EXACT linear-interpolation percentiles per group (Spark
      // `percentile`, not approx_percentile — quartile fractions on
      // integer-valued quantities interpolate to exactly-representable
      // doubles, so the hash compare is meaningful).
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
             expr("percentile(l_quantity, 0.5)").as("p50"),
             expr("percentile(l_quantity, 0.75)").as("p75"))
        .orderBy("l_returnflag")),

    // ---- windows --------------------------------------------------------------
    "window_running_sum" -> ((s, d) => {
      // W5: cumulative sum per key under a total order; decimal
      // accumulation keeps every prefix independent of plan layout.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          dbl(sum(money(col("o_totalprice"))).over(w)).as("running_total"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    "window_lag_delta" -> ((s, d) => {
      // W6: lag/lead — spend delta vs. the customer's previous order.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          (col("o_totalprice") - lag(col("o_totalprice"), 1).over(w))
            .as("delta_prev"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    "window_moving_sum" -> ((s, d) => {
      // W7: bounded moving frame (3-row trailing sum + frame size).
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          dbl(sum(money(col("o_totalprice"))).over(w)).as("mov_sum3"),
          count(lit(1)).over(w).as("mov_n"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    "window_range_frame" -> ((s, d) => {
      // W11: value-RANGE frame — trailing-90-DAY spend per customer,
      // framed by the ORDER BY *value* (epoch days), not row offsets,
      // so ties (same-day orders) are peers in both engines. One sort
      // per customer partition, no self-join (the naive formulation is
      // a range self-join; the window form sweeps each partition once).
      val days = datediff(col("o_orderdate"), lit("1970-01-01").cast("date"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(days)
        .rangeBetween(-90, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          dbl(sum(money(col("o_totalprice"))).over(w)).as("trailing_90d"))
        .orderBy("o_custkey", "o_orderkey")
    }),
    "gap_fill_days" -> ((s, d) => {
      // densification (gap filling): per-day purchase counts with
      // explicit zero rows for silent days — sequence() + explode
      // generates the day spine from the 2-row bounds aggregate
      // (broadcast), so the fact table is scanned once and nothing
      // driver-side loops over dates.
      // lazy localCheckpoint: both the bounds aggregate (spine side)
      // and the join probe read `daily`, so the fact table is scanned
      // once, not twice — and unlike persist(), the day-count-sized
      // blocks are freed by the ContextCleaner when the query is
      // dropped instead of accumulating across invocations.
      // USER 0's purchase days, not the whole stream's (r19 campaign
      // 5e): the corpus-wide daily series has a purchase on EVERY day
      // at every SF (density grows with the corpus), so the zero-fill
      // arm — the row's entire reason to exist — never fired and a
      // fill-value mutation survived both gate tiers (the
      // interpolate_linear_days class, fixed the same way: per-user
      // event counts are scale-invariant, ~10 purchase days over a
      // ~28-day span, so silent days are real at every SF).
      val daily = Tables.events(s, d)
        .where(col("event_type") === "purchase" && col("user_id") === 0L)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(false)
      val spine = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy("day")
    }),
    "gap_fill_months" -> ((s, d) => {
      // month-grain densification: same spine pattern as gap_fill_days
      // but stepping by calendar months (28–31-day steps — interval
      // arithmetic, not a fixed divisor). Zero rows for silent months.
      // ONE customer's F-orders, not the whole table's (r19 campaign
      // 5e, same dead-arm class as gap_fill_days): every month of the
      // corpus span carries F-orders at every SF, so the zero-fill
      // never fired. Customer 1's F-orders are sparse at any SF
      // (5 active months over a 52-month span at sf0.01, 2/21 at sf1
      // — per-customer order counts are scale-invariant), so silent
      // months are real.
      val monthly = t(s, d, "orders")
        .where(col("o_orderstatus") === "F" && col("o_custkey") === 1L)
        .groupBy(date_trunc("month", col("o_orderdate")).cast("date")
          .as("month"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(false)
      val spine = monthly
        .agg(min(col("month")).as("lo"), max(col("month")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 month"))).as("month"))
      spine.join(monthly, Seq("month"), "left")
        .select(col("month"), coalesce(col("cnt"), lit(0L)).as("cnt"))
        .orderBy("month")
    }),
    "rank_dense_rank" -> ((s, d) => {
      // W12: rank vs dense_rank under heavy ties (50 distinct
      // quantities over 60k rows) — peer semantics are deterministic
      // with no arbitrary tiebreak, unlike row_number.
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          rank().over(w).as("rk"), dense_rank().over(w).as("drk"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "ntile_quartiles" -> ((s, d) => {
      // W8: ntile bucketing under a total order (price quartile within
      // each return flag).
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          ntile(4).over(w).as("price_quartile"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    "stats_moments" -> ((s, d) => {
      // A13: order-insensitive second moments. Spark's stddev/corr
      // merge partial states in partition order (nondeterministic at
      // scale); computing from EXACT decimal power sums makes variance,
      // stddev and correlation independent of cluster layout — and
      // bit-comparable to the oracle, which uses the same formula.
      val q = money(col("l_quantity"))
      val p = money(col("l_extendedprice"))
      val moments = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          dbl(sum(q)).as("sx"), dbl(sum(q * q)).as("sxx"),
          dbl(sum(p)).as("sy"), dbl(sum(p * p)).as("syy"),
          dbl(sum(q * p)).as("sxy"))
      val varQty = (col("n") * col("sxx") - col("sx") * col("sx")) /
        (col("n") * (col("n") - 1))
      val corr = (col("n") * col("sxy") - col("sx") * col("sy")) /
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
             (col("n") * col("syy") - col("sy") * col("sy")))
      // The closed forms chain several double ops; identical operands
      // still round differently across engines once sf1 magnitudes
      // enter (measured: 2-4 ulp on corr at sf1 — DuckDB contracts
      // the multiply-subtract). Fixed-point the emitted statistics
      // with the identical floor(x*scale + 0.5) formula on both sides
      // so the artifact is an integer, bit-comparable at any SF.
      // The drift-prone ~1-magnitude values (corr here, r² in
      // regr_fit) are emitted at e9, a few orders below the drift
      // margin: the 2-4-ulp cross-engine drift (~1e-15 absolute)
      // scaled by 1e9 is ~1e-6 of a quantum, so the two engines'
      // doubles can no longer straddle an integer boundary in
      // practice (at e12 the odds were ~1e-3 per value — the r10
      // documented residual, closed in r11). e9 still resolves corr
      // to a part per billion, far tighter than any analytic use.
      def fp(c: org.apache.spark.sql.Column, scale: Double) =
        floor(c * scale + 0.5).cast("long")
      moments.select(col("l_returnflag"),
          fp(varQty, 1e6).as("var_qty_e6"),
          fp(sqrt(varQty), 1e6).as("stddev_qty_e6"),
          fp(corr, 1e9).as("corr_qty_price_e9"))
        .orderBy("l_returnflag")
    }),
    "percent_rank_price" -> ((s, d) => {
      // W9: percent_rank + cume_dist under a total order — both are
      // exact rational values ((rank-1)/(n-1), rank/n), so doubles
      // compare bit-for-bit across engines.
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- sampling / distinct at scale ------------------------------------------
    "sample_hash" -> ((s, d) =>
      // S9: deterministic ~1/16 sample via md5 prefix — reproducible
      // across engines and runs, pure map-side filter (no sort, no
      // shuffle, no RNG seed coordination across 1000 executors).
      t(s, d, "orders")
        .where(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy("o_orderkey")),
    "argmax_order" -> ((s, d) =>
      // A16: argmax WITHOUT a window — max(struct(value, key)) rides
      // the normal partial/final aggregation (one shuffle of one
      // struct per group, map-side combined), where the row_number
      // formulation sorts every partition. Struct ordering is
      // lexicographic, so ties on value resolve to the larger key —
      // deterministic by construction.
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(struct(col("o_totalprice"), col("o_orderkey"))).as("m"))
        .select(col("o_custkey"), col("m.o_orderkey").as("top_orderkey"),
          col("m.o_totalprice").as("top_price"))
        .orderBy("o_custkey")),
    "merge_upsert" -> ((s, d) => {
      // SCD-1 MERGE (operators/Merge): every 10th customer updated
      // (renamed + credited), plus one brand-new key inserted; update
      // rows win wholesale on match. One full-outer shuffle.
      import s.implicits._
      val base = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val updates = base.where(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), upper(col("c_name")).as("c_name"),
          (col("c_acctbal") + 100.0).as("c_acctbal"))
        .unionByName(Seq((9999999L, "Customer#new", 0.0))
          .toDF("c_custkey", "c_name", "c_acctbal"))
      graft.operators.Merge.upsert(base, updates, "c_custkey")
        .orderBy("c_custkey")
    }),
    "merge_scd2" -> ((s, d) => {
      // SCD-2 history merge (operators/Merge.scd2): market-segment
      // history vs a snapshot where every 7th customer moved segment
      // and one new customer appears; changed keys get their current
      // row closed and a new version opened, closed history never
      // shuffles.
      import s.implicits._
      val asOf = java.sql.Date.valueOf("2024-06-01")
      val history = t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          lit(java.sql.Date.valueOf("2020-01-01")).as("valid_from"),
          lit(null).cast("date").as("valid_to"))
      val snapshot = t(s, d, "customer")
        .select(col("c_custkey"),
          when(col("c_custkey") % 7 === 0, lit("MOVED"))
            .otherwise(col("c_mktsegment")).as("c_mktsegment"))
        .unionByName(Seq((8888888L, "BUILDING"))
          .toDF("c_custkey", "c_mktsegment"))
      graft.operators.Merge
        .scd2(history, snapshot, "c_custkey", "c_mktsegment", asOf)
        .orderBy("c_custkey", "valid_from")
    }),
    "sample_stratified" -> ((s, d) => {
      // S12: per-stratum deterministic sampling — each event_type keeps
      // a different fraction (256ths of the md5-hash space), the rate
      // table rides along as broadcast data (config-as-data, not a
      // hardcoded when-chain). Same map-side, shuffle-free,
      // engine-reproducible properties as sample_hash; the grouped
      // counts keep the oracle output small.
      import s.implicits._
      val rates = Seq(("purchase", 256), ("click", 64), ("view", 16))
        .toDF("event_type", "keep_of_256")
      val h = conv(substring(md5(col("event_id").cast("string")), 1, 2),
        16, 10).cast("int")
      Tables.events(s, d)
        .join(broadcast(rates), Seq("event_type"), "left")
        .where(h < coalesce(col("keep_of_256"), lit(0)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("sampled_cnt"),
             moneySum(col("value")).as("sum_value"))
        .orderBy("event_type")
    }),
    "distinct_count_two_phase" -> ((s, d) =>
      // A12: count-distinct via two-phase (distinct-then-count) — the
      // formulation that spreads a skewed COUNT(DISTINCT) over all
      // reducers instead of one hot one (graft.operators.Skew).
      Skew.twoPhaseDistinctCount(t(s, d, "lineitem"),
          col("l_returnflag"), col("l_partkey"), "distinct_parts")
        .select(col("key").as("l_returnflag"), col("distinct_parts"))
        .orderBy("l_returnflag")),

    "intersect_all_parts" -> ((s, d) =>
      // U5: INTERSECT ALL (multiset semantics): each partkey kept
      // min(multiplicity-left, multiplicity-right) times — one
      // aggregate per side + a generator, never a row-level join.
      t(s, d, "lineitem").select(col("l_partkey"))
        .intersectAll(t(s, d, "lineitem")
          .where(col("l_returnflag") === "R").select(col("l_partkey")))
        .groupBy("l_partkey").agg(count(lit(1)).as("multiplicity"))
        .orderBy("l_partkey")),
    "stats_ks_statistic" -> ((s, d) => {
      // A27: exact two-sample Kolmogorov–Smirnov distance between the
      // click and view value distributions — D = max |ECDF₁ − ECDF₂|
      // evaluated at every sample point. The running conditional
      // counts under the one global value order come from
      // TotalOrder.ordered — a range exchange + per-partition offset
      // broadcast — NOT a partition-less window (which would sort the
      // whole event corpus through a single reducer at 100 TB). The
      // same pass hands back the two grand totals, so n1/n2 need no
      // second aggregate. ECDFs are double ratios of exact integers,
      // so both engines compute identical doubles and the max picks
      // the same point; scaled to e9 for the hash.
      val ev = Tables.events(s, d)
        // null values are not samples: they would still count into
        // n1/n2 and the running ECDF numerators, at an engine-chosen
        // sort position (Spark nulls-first vs DuckDB nulls-last).
        // Caught by the r18 planted null-payload event at sf1.
        .where(col("event_type").isin("click", "view") &&
               col("value").isNotNull)
        .select(col("event_type"),
          round(col("value") * 100, 0).cast("long").as("x"),
          col("event_id"))
      val ord = graft.operators.TotalOrder.ordered(ev,
        Seq(col("x"), col("event_id")),
        Seq(when(col("event_type") === "click", 1L).otherwise(0L) -> "c1",
            when(col("event_type") === "view", 1L).otherwise(0L) -> "c2"))
      val (n1, n2) = (ord.totalSums(0), ord.totalSums(1))
      ord.df
        .select(round(abs(col("c1").cast("double") / lit(n1.toDouble)
            - col("c2").cast("double") / lit(n2.toDouble)) * 1e9)
          .cast("long").as("d_e9"))
        .agg(max(col("d_e9")).as("ks_d_e9"))
    }),
    "stats_chi2_independence" -> ((s, d) => {
      // A28: χ² independence statistic between market segment and
      // order priority. Observed cell counts and both marginals are
      // exact integers; each cell's (o−e)²/e contribution is
      // fixed-pointed (round(1e6·term) as long) so the statistic is
      // an order-independent integer sum — the charlm/entropy scheme.
      // Contingency table is 25 cells: every join side past the first
      // aggregate is broadcast-sized.
      val j = t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("r"), col("o_orderpriority").as("c"))
      val cells = j.groupBy("r", "c").agg(count(lit(1)).as("o"))
      val nr = cells.groupBy("r").agg(sum(col("o")).as("nr"))
      val nc = cells.groupBy("c").agg(sum(col("o")).as("nc"))
      val tot = cells.agg(sum(col("o")).as("n"))
      val e = (col("nr").cast("double") * col("nc").cast("double")
        / col("n").cast("double"))
      cells.join(nr, "r").join(nc, "c").crossJoin(tot)
        .select(round(lit(1000000.0)
            * (col("o").cast("double") - e) * (col("o").cast("double") - e)
            / e, 0).cast("long").as("t"))
        .agg(count(lit(1)).as("n_cells"), sum(col("t")).as("chi2_fp_e6"))
    }),
    "except_all_parts" -> ((s, d) =>
      // U4: EXCEPT ALL (multiset semantics — per-row multiplicity).
      t(s, d, "lineitem").select(col("l_partkey"))
        .exceptAll(t(s, d, "part").select(col("p_partkey")))
        .orderBy("l_partkey")),
    "string_agg_nations" -> ((s, d) => {
      // A14: ordered string aggregation (listagg shape) — sort inside
      // the collected array so the result is partition-order-free.
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(", ", array_sort(collect_list(col("n_name"))))
               .as("nations"),
             count(lit(1)).as("n_nations"))
        .orderBy("r_name")
    }),
    "agg_predicates" -> ((s, d) =>
      // A15: predicate aggregates — count_if / bool_and / bool_or.
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(expr("count_if(l_quantity > 25)").as("big_qty_cnt"),
             expr("bool_and(l_extendedprice > 0)").as("all_pos_price"),
             expr("bool_or(l_discount > 0.05)").as("any_big_disc"))
        .orderBy("l_returnflag")),
    "window_distinct_count" -> ((s, d) => {
      // W19: COUNT(DISTINCT) OVER — SQL engines allow it, Spark's
      // window aggregates don't, so the idiomatic Spark form is
      // size(collect_set(..).over(w)): a running distinct-supplier
      // count per customer order history. The set lives in window
      // state (O(distinct per partition) memory) — fine for per-key
      // cardinalities like a customer's suppliers; for corpus-scale
      // cardinalities switch to the two-phase distinct or HLL sketches
      // (A12/K5) instead of a window.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val l = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val perOrder = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
        .agg(collect_set(col("l_suppkey")).as("supps"))
      perOrder
        .select(col("o_custkey"), col("o_orderkey"),
          size(array_distinct(flatten(
            collect_list(col("supps")).over(w)))).as("distinct_supps"))
        .where(col("o_custkey") < 100)
        .orderBy("o_custkey", "o_orderkey")
    }),
    "window_first_last" -> ((s, d) => {
      // W10: first_value / last_value / nth_value over the full
      // partition frame (explicit unbounded frame — last_value under
      // the default frame is the running row, a classic footgun).
      val order = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val full = order.rowsBetween(Window.unboundedPreceding,
                                   Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(full).as("first_price"),
          last(col("o_totalprice")).over(full).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- scalar surface: dates and regex ------------------------------------------
    "date_arith" -> ((s, d) =>
      // §2.9+: date_trunc / add_months (with month-end clamping) /
      // last_day / datediff.
      t(s, d, "orders")
        .select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).cast("date").as("order_month"),
          add_months(col("o_orderdate").cast("date"), 3).as("due_month"),
          last_day(col("o_orderdate")).as("month_end"),
          datediff(lit("1998-01-01").cast("date"),
                   col("o_orderdate").cast("date")).as("days_to_cutoff"))
        .orderBy("o_orderkey")),
    "regexp_clean" -> ((s, d) =>
      // §2.9+: global regexp_replace + group extract.
      t(s, d, "part")
        .select(col("p_partkey"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("deverbed"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"))
        .orderBy("p_partkey")),
    "regr_fit" -> ((s, d) => {
      // per-group OLS fit (slope/intercept/r²) from EXACT decimal power
      // sums — same rationale as stats_moments: Spark's regr_slope /
      // regr_intercept merge float partials in partition order, so
      // their low bits depend on cluster layout; the decimal-sum form
      // is bit-stable at any parallelism AND one shuffle for all three
      // statistics.
      val x = money(col("l_quantity"))
      val y = money(col("l_extendedprice"))
      val m = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          dbl(sum(x)).as("sx"), dbl(sum(x * x)).as("sxx"),
          dbl(sum(y)).as("sy"), dbl(sum(y * y)).as("syy"),
          dbl(sum(x * y)).as("sxy"))
      val cxy = col("n") * col("sxy") - col("sx") * col("sy")
      val cxx = col("n") * col("sxx") - col("sx") * col("sx")
      val cyy = col("n") * col("syy") - col("sy") * col("sy")
      val slope = cxy / cxx
      // fixed-point the emitted fit (same 2-4-ulp cross-engine drift
      // class as stats_moments — see the note there)
      def fp(c: org.apache.spark.sql.Column, scale: Double) =
        floor(c * scale + 0.5).cast("long")
      m.select(col("l_returnflag"), fp(slope, 1e6).as("slope_e6"),
          fp((col("sy") - slope * col("sx")) / col("n"), 1e6)
            .as("intercept_e6"),
          fp(cxy * cxy / (cxx * cyy), 1e9).as("r2_e9"))
        .orderBy("l_returnflag")
    }),
    "cross_join_pairs" -> ((s, d) =>
      // explicit Cartesian product (crossJoin API): every region ×
      // order-priority pair with the region's nation count — the
      // tiny-dims case where a cross join is legitimate. Both sides
      // are dimension-sized; Spark plans a broadcast nested-loop.
      t(s, d, "region").select(col("r_name"))
        .crossJoin(t(s, d, "orders").select(col("o_orderpriority")).distinct())
        .orderBy("r_name", "o_orderpriority")),
    "bitwise_agg" -> ((s, d) =>
      // bitwise aggregate surface (bit_and/bit_or/bit_xor): associative
      // + commutative, so they ride partial aggregation like sum —
      // exact at any parallelism.
      //
      // CUSTOMER grain, not priority (r20 campaign 6b): over the five
      // priority groups (~3000 dense keys each) bit_and saturated to 0
      // and bit_or to 16383 in EVERY group at every SF, so two of the
      // three arms verified constants and a bit_and operand mutation
      // survived the gate. At o_custkey grain (~15 keys/group, 98
      // groups with nonzero bit_and, singleton groups where bit_and =
      // bit_or = the key at sf0.01) all three arms move with the data.
      // GateSensitivitySpec pins the nonzero-AND liveness.
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(bit_and(col("o_orderkey")).as("key_and"),
             bit_or(col("o_orderkey")).as("key_or"),
             bit_xor(col("o_orderkey")).as("key_xor"))
        .orderBy("o_custkey")),
    "sample_group_topk" -> ((s, d) => {
      // deterministic per-group k-sample: rank rows inside each group
      // by md5 of the key (a seedless, engine-portable "random" order)
      // and keep the first 3 — the reservoir-sample shape with
      // cross-run/cross-engine reproducibility. One shuffle on the
      // group key; no RNG seed coordination across executors.
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
      t(s, d, "customer")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("c_mktsegment"), col("c_custkey"), col("rn"))
        .orderBy("c_mktsegment", "rn")
    }),
    "pivot_dynamic" -> ((s, d) =>
      // pivot with DISCOVERED values: .pivot(col) with no value list
      // runs a driver-side distinct first (one extra tiny job) — fine
      // for low-cardinality status codes, the documented anti-pattern
      // for high-cardinality columns (pass explicit values there).
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus")
        .agg(count(lit(1)))
        .orderBy("o_orderpriority")),
    "percentile_disc_grouped" -> ((s, d) => {
      // DISCRETE percentiles (the value AT position ceil(p*n), never
      // interpolated — complements percentile_grouped's continuous
      // form): computed positionally with one window rank, so the
      // result is an actual data value and tie order can't change it.
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"))
      val ranked = t(s, d, "lineitem")
        .select(col("l_returnflag"), col("l_quantity"))
        .withColumn("rn", row_number().over(w))
      val n = ranked.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"))
      ranked.join(n, "l_returnflag")
        .where(col("rn") === ceil(col("n") * 0.25) ||
               col("rn") === ceil(col("n") * 0.5) ||
               col("rn") === ceil(col("n") * 0.9))
        .groupBy(col("l_returnflag"), col("n"))
        .agg(min(when(col("rn") === ceil(col("n") * 0.25),
               col("l_quantity"))).as("p25"),
             min(when(col("rn") === ceil(col("n") * 0.5),
               col("l_quantity"))).as("p50"),
             min(when(col("rn") === ceil(col("n") * 0.9),
               col("l_quantity"))).as("p90"))
        .select(col("l_returnflag"), col("p25"), col("p50"), col("p90"))
        .orderBy("l_returnflag")
    }),
    "null_funcs" -> ((s, d) =>
      // null-handling scalar surface: coalesce / nullif / nvl2-shaped
      // conditionals over the synthesized comment columns.
      t(s, d, "customer")
        .select(col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")),
            lit("OTHER")).as("seg_or_other"),
          when(col("c_acctbal") < 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal")).as("bal_pos"),
          (col("c_acctbal") < 0).as("was_negative"))
        .orderBy("c_custkey")),
    "grouping_sets_explicit" -> ((s, d) => {
      // explicit GROUPING SETS (the general form behind rollup/cube):
      // per-priority, per-status, and grand totals from ONE scan and
      // one expanded shuffle — vs three separate aggregation jobs.
      t(s, d, "orders").createOrReplaceTempView("gs_orders")
      s.sql(
        """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE)
          |         AS sum_price
          |FROM gs_orders
          |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
          |ORDER BY o_orderpriority NULLS FIRST,
          |         o_orderstatus NULLS FIRST""".stripMargin)
    }),
    "explode_outer_empty" -> ((s, d) =>
      // explode_outer NULL semantics: rows whose array is EMPTY (no
      // digit runs exist in this corpus) survive with a NULL element —
      // plain explode would silently drop every such parent row.
      t(s, d, "documents")
        .select(col("doc_id"),
          explode_outer(expr("regexp_extract_all(text, '[0-9]+', 0)"))
            .as("digit_run"))
        .groupBy(lit(1).as("grp"))
        .agg(count(lit(1)).as("n_rows"),
             count(col("digit_run")).as("n_non_null"),
             countDistinct(col("doc_id")).as("n_docs"))
        .select(col("n_rows"), col("n_non_null"), col("n_docs"))),
    "fuzzy_levenshtein_pairs" -> ((s, d) =>
      // edit-distance fuzzy matching (the record-linkage primitive):
      // each part against its successor key — a banded self-join (J4
      // shape) carrying levenshtein + a normalized similarity. Exact
      // integer DP, identical across engines.
      t(s, d, "part").as("x")
        .join(t(s, d, "part").as("y"),
          col("y.p_partkey") === col("x.p_partkey") + 1)
        .select(col("x.p_partkey").as("p1"),
          levenshtein(col("x.p_name"), col("y.p_name")).as("dist"),
          (lit(1.0) - levenshtein(col("x.p_name"), col("y.p_name"))
            .cast("double") /
            greatest(length(col("x.p_name")), length(col("y.p_name"))))
            .as("sim"))
        .orderBy("p1")),
    "anomaly_zscore_exact" -> ((s, d) => {
      // A22: outlier census (|x − mean| > 1.5σ per group) with ZERO
      // floating-point error: multiply the inequality through by n²
      // and by 4 to keep the 1.5² = 9/4 factor integral —
      //   4·(n·x − S1)² > 9·(n·S2 − S1²)
      // — and evaluate in exact integer/decimal arithmetic over power
      // sums of cents. No sqrt, no division, no order-dependent double
      // accumulation; one window shuffle for the power sums, then a
      // 3-row aggregate.
      //
      // Threshold 1.5σ, not the textbook 2σ, because the gate must
      // BIND (r18 saturation audit): l_extendedprice is bounded
      // uniform-ish, and a bounded uniform's max deviation is
      // √3·σ ≈ 1.73σ — at 2σ the outlier census is STRUCTURALLY ZERO
      // at every SF, so n_outliers verified the constant 0 and any
      // mutation of the flag expression passed (the events_funnel
      // class). At 1.5σ ≈ 13% of rows flag and the census erodes
      // with the data.
      import org.apache.spark.sql.types.DecimalType
      def d38(c: org.apache.spark.sql.Column) = c.cast(DecimalType(38, 0))
      val w = Window.partitionBy(col("l_returnflag"))
      t(s, d, "lineitem")
        .withColumn("x", round(col("l_extendedprice") * 100).cast("long"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s1", sum(col("x")).over(w))
        .withColumn("s2", sum(d38(col("x") * col("x"))).over(w))
        .withColumn("lhs_root",
          d38(col("n")) * d38(col("x")) - d38(col("s1")))
        .withColumn("flag",
          d38(lit(4)) * col("lhs_root") * col("lhs_root") >
            d38(lit(9)) * (d38(col("n")) * col("s2") -
              d38(col("s1")) * d38(col("s1"))))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
             sum(when(col("flag"), 1L).otherwise(0L)).as("n_outliers"))
        .orderBy("l_returnflag")
    }),
    "graph_bfs_hops" -> ((s, d) => {
      // G4: multi-source BFS (operators/Bfs) over the UNDIRECTED
      // purchase graph — hop distance from nation-0 suppliers to every
      // node within 3 hops. Distances are exact integers, so unlike
      // PageRank this graph operator is fully oracle-checked (DuckDB
      // recursive CTE). Node ids: customer 2c, supplier 2s+1.
      val l = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val fwd = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
                (col("l_suppkey") * 2 + 1).as("dst"))
      val edges = fwd.union(fwd.select(col("dst").as("src"),
                                       col("src").as("dst")))
      val sources = t(s, d, "supplier")
        .where(col("s_nationkey") === 0)
        .select((col("s_suppkey") * 2 + 1).as("node"))
      graft.operators.Bfs.distances(edges, sources, maxHops = 3)
        .orderBy("node")
    }),
    "pagerank_fixed" -> ((s, d) => {
      // G3: fixed-point PageRank over the customer→supplier purchase
      // graph (operators/PageRank.runFixed): 3 power iterations,
      // dangling supplier mass redistributed, ranks as scaled integers
      // (×1e12) so every step is order-independent integer arithmetic
      // — hash-matched against a DuckDB mirror of the same recurrence.
      // Node ids are disambiguated 2c / 2s+1 (customers and suppliers
      // share the integer key space). The double-precision variant
      // stays pinned by PageRankSpec against a driver-side reference.
      val l = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val edges = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
                (col("l_suppkey") * 2 + 1).as("dst"))
      graft.operators.PageRank.runFixed(edges, iters = 3)
        .orderBy("node")
    }),
    "sample_weighted_systematic" -> ((s, d) => {
      // S17: weighted (PPS) systematic sampling — pick ~k docs with
      // probability proportional to size (n_chars), deterministically:
      // order by doc_id, take the integer prefix sum of weights, and
      // keep every row whose cumulative weight crosses a multiple of
      // step = total/k. All-integer arithmetic (no RNG, no log/pow),
      // so the selection is bit-reproducible across engines and
      // cluster layouts. The prefix sum rides Packing.withRunningOffset
      // (range shuffle + two narrow passes), NOT a global window — the
      // single-reducer sort is the 100 TB anti-pattern; the 1-row
      // total broadcasts.
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"))
      val k = 50
      val total = docs.agg(sum(col("n_chars")).cast("long").as("tw"))
      graft.operators.Packing.withRunningOffset(docs, "doc_id", "n_chars")
        .crossJoin(broadcast(total))
        .withColumn("step", greatest(expr(s"tw div ${k}L"), lit(1L)))
        .withColumn("cw", col("offset") + col("n_chars"))
        .where(expr("cw div step") > expr("offset div step"))
        .select(col("doc_id"), col("n_chars"), col("cw"))
        .orderBy("doc_id")
    }),
    "layout_hilbert_key" -> ((s, d) => {
      // S18: Hilbert clustering key (sources/Layout.hilbertKey) on an
      // 8-bit 256×256 grid over (custkey mod 256, nationkey×10) —
      // the data-layout primitive next to Z-order. The key is pure
      // unrolled integer CASE/shift/xor arithmetic (codegen'd, no
      // UDF), so DuckDB can mirror it level by level and hash-match.
      val c = t(s, d, "customer")
      c.select(col("c_custkey"),
          (col("c_custkey") % 256).as("gx"),
          (col("c_nationkey") * 10).as("gy"))
        .withColumn("hkey",
          graft.sources.Layout.hilbertKey(col("gx"), col("gy"), order = 8))
        .orderBy("hkey", "c_custkey")
    }),
    "graph_label_propagation" -> ((s, d) => {
      // G13: community detection on the co-purchase graph by
      // DETERMINISTIC synchronous label propagation (operators/
      // LabelPropagation: 4 fixed rounds, most-frequent neighbor
      // label, ties to the minimum) — the curation-side community
      // signal next to the structural peels (k-core/k-truss). Fixed
      // rounds + total tie order make the result a pure function of
      // the edge list, so the DuckDB oracle mirrors it as 4 unrolled
      // join+argmax rounds (lpaSql).
      // pair generation: one-shuffle group-to-array expansion
      // (operators/CoPurchase, r20 -- identical pair multiset, 3
      // input-sized exchanges -> 1)
      val raw = graft.operators.CoPurchase.pairs(t(s, d, "lineitem"),
        col("l_orderkey"), col("l_partkey"))
      graft.operators.LabelPropagation
        .run(graft.operators.Triangles.orientById(raw), 4)
        .orderBy("node")
    })
  )

  /** Unrolled bulk-synchronous k-core peel as plain DuckDB SQL.
    *
    * The peel is monotone-decreasing and idempotent at its fixpoint, so
    * a chained-CTE unroll with MORE rounds than the fixpoint depth
    * computes exactly the k-core — extra rounds are no-ops. Depth is
    * data-dependent but tiny here (measured: 1 round at sf0.01 for
    * k=3); `rounds` carries a safety margin. Each round: degree over
    * the surviving edges, keep nodes with deg >= k, restrict edges to
    * kept endpoints — the SQL mirror of KCore.nodes' per-round step.
    */
  private def kcorePeelSql(k: Int, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= "WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),\n"
    sb ++= "e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk)"
    for (i <- 1 to rounds) {
      sb ++= s",\nd$i AS MATERIALIZED (SELECT node FROM (SELECT node, count(*) AS deg FROM (" +
        s"SELECT u AS node FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1}) GROUP BY 1) WHERE deg >= $k)"
      sb ++= s",\ne$i AS MATERIALIZED (SELECT e.u, e.v FROM e${i - 1} e JOIN d$i a ON e.u = a.node JOIN d$i b ON e.v = b.node)"
    }
    sb ++= s"\nSELECT node FROM (SELECT node, count(*) AS deg FROM (" +
      s"SELECT u AS node FROM e$rounds UNION ALL SELECT v FROM e$rounds) GROUP BY 1) WHERE deg >= $k ORDER BY node"
    sb.toString
  }

  /** Unrolled k-truss edge peel as plain DuckDB SQL — same
    * fixpoint-idempotence argument as [[kcorePeelSql]] (measured depth
    * 3 at sf0.01 for k=4; `rounds` adds margin). Per round: enumerate
    * each triangle once on the a<b<c canonical list, credit its three
    * edges, drop edges with support < k-2.
    */
  private def ktrussPeelSql(k: Int, rounds: Int): String = {
    val minSup = k - 2
    val sb = new StringBuilder
    sb ++= "WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),\n"
    sb ++= "e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk)"
    for (i <- 1 to rounds) {
      sb ++= s",\nt$i AS MATERIALIZED (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM e${i - 1} e1 " +
        s"JOIN e${i - 1} e2 ON e1.u = e2.u AND e1.v < e2.v " +
        s"JOIN e${i - 1} e3 ON e3.u = e1.v AND e3.v = e2.v)"
      sb ++= s",\ns$i AS MATERIALIZED (SELECT u, v, count(*) AS sup FROM (" +
        s"SELECT a AS u, b AS v FROM t$i UNION ALL SELECT a, c FROM t$i UNION ALL SELECT b, c FROM t$i) GROUP BY 1, 2)"
      sb ++= s",\ne$i AS MATERIALIZED (SELECT e.u, e.v FROM e${i - 1} e JOIN s$i ON e.u = s$i.u AND e.v = s$i.v WHERE sup >= $minSup)"
    }
    sb ++= s"\nSELECT u, v FROM e$rounds ORDER BY u, v"
    sb.toString
  }

  /** Unrolled INCREMENTAL core decomposition as plain DuckDB SQL —
    * the oracle mirror of KCore.coreness: each level k peels the
    * previous level's fixpoint (never the full graph) down to min
    * degree k, and a node's core number is the count of level
    * fixpoints containing it ((k+1)-core ⊆ k-core makes containment
    * counts ≡ max level). `levels` pairs each k with its unroll
    * depth — fixpoint-idempotent, so depths carry margin over the
    * measured per-level convergence (the `[kcore] k=K@core` Verify
    * log lines).
    */
  private def coreDecompSql(levels: Seq[(Int, Int)]): String = {
    val sb = new StringBuilder
    sb ++= "WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),\n"
    sb ++= "e0 AS MATERIALIZED (SELECT u, v FROM (SELECT a.pk AS u, b.pk AS v, count(*) AS w " +
      "FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2) WHERE w >= 2),\n"
    sb ++= "n0 AS MATERIALIZED (SELECT DISTINCT node FROM (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0))"
    var prev = "e0"
    val fixpoints = levels.map { case (k, rounds) =>
      for (i <- 1 to rounds) {
        val (d, e) = (s"d${k}_$i", s"e${k}_$i")
        sb ++= s",\n$d AS MATERIALIZED (SELECT node FROM (SELECT node, count(*) AS deg FROM (" +
          s"SELECT u AS node FROM $prev UNION ALL SELECT v FROM $prev) GROUP BY 1) WHERE deg >= $k)"
        sb ++= s",\n$e AS MATERIALIZED (SELECT e.u, e.v FROM $prev e JOIN $d a ON e.u = a.node JOIN $d b ON e.v = b.node)"
        prev = e
      }
      prev
    }
    val unions = fixpoints.map(n =>
      s"SELECT DISTINCT node FROM (SELECT u AS node FROM $n UNION ALL SELECT v FROM $n)")
      .mkString(" UNION ALL ")
    sb ++= s",\nlvl AS (SELECT node, count(*) AS c FROM ($unions) GROUP BY 1)"
    sb ++= "\nSELECT n0.node, CAST(coalesce(lvl.c, 0) AS INT) AS coreness " +
      "FROM n0 LEFT JOIN lvl ON n0.node = lvl.node ORDER BY 1"
    sb.toString
  }

  /** Unrolled INCREMENTAL truss decomposition as plain DuckDB SQL —
    * the oracle mirror of KTruss.trussness: each level k peels the
    * previous level's fixpoint (never the full graph) down to support
    * ≥ k−2, and an edge's truss number is 2 + the number of level
    * fixpoints it survives ((k+1)-truss ⊆ k-truss makes survival
    * counts ≡ max level). `levels` pairs each k with its unroll
    * depth — fixpoint-idempotent, so the depths carry margin over the
    * measured convergence (sf0.01: 2/3/4/6 rounds for k=3..6).
    */
  private def trussDecompSql(levels: Seq[(Int, Int)]): String = {
    val sb = new StringBuilder
    sb ++= "WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),\n"
    // REPEAT graph (co-ordered in >= 2 distinct orders) — same noise
    // cut as coreDecompSql; keeps the sf1 mirror inside its budget
    sb ++= "e0 AS MATERIALIZED (SELECT u, v FROM (SELECT a.pk AS u, b.pk AS v, count(*) AS w " +
      "FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk GROUP BY 1, 2) WHERE w >= 2)"
    var prev = "e0"
    val fixpoints = levels.map { case (k, rounds) =>
      val minSup = k - 2
      for (i <- 1 to rounds) {
        val (t, sc, e) = (s"t${k}_$i", s"s${k}_$i", s"e${k}_$i")
        sb ++= s",\n$t AS MATERIALIZED (SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM $prev e1 " +
          s"JOIN $prev e2 ON e1.u = e2.u AND e1.v < e2.v " +
          s"JOIN $prev e3 ON e3.u = e1.v AND e3.v = e2.v)"
        sb ++= s",\n$sc AS MATERIALIZED (SELECT u, v, count(*) AS sup FROM (" +
          s"SELECT a AS u, b AS v FROM $t UNION ALL SELECT a, c FROM $t UNION ALL SELECT b, c FROM $t) GROUP BY 1, 2)"
        sb ++= s",\n$e AS MATERIALIZED (SELECT e.u, e.v FROM $prev e JOIN $sc s ON e.u = s.u AND e.v = s.v WHERE s.sup >= $minSup)"
        prev = e
      }
      prev
    }
    val unions = fixpoints.map(n => s"SELECT u, v FROM $n").mkString(" UNION ALL ")
    sb ++= s",\nlvl AS (SELECT u, v, count(*) AS above FROM ($unions) GROUP BY 1, 2)"
    sb ++= "\nSELECT e0.u, e0.v, CAST(2 + coalesce(lvl.above, 0) AS INT) AS trussness " +
      "FROM e0 LEFT JOIN lvl ON e0.u = lvl.u AND e0.v = lvl.v ORDER BY 1, 2"
    sb.toString
  }

  /** Unrolled deterministic synchronous label propagation as plain
    * DuckDB SQL — `rounds` must equal the Spark query's fixed round
    * budget exactly (unlike the peels this is NOT a fixpoint: every
    * round can move labels, so the unroll count is part of the
    * operator definition, not a safety margin). Per round: neighbor
    * labels via one equi-join, per-(node, label) counts, argmax with
    * the count-desc-then-min-label total order.
    */
  private def lpaSql(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= "WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),\n"
    sb ++= "e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk),\n"
    sb ++= "nb AS MATERIALIZED (SELECT u AS node, v AS nbr FROM e0 UNION ALL SELECT v, u FROM e0),\n"
    sb ++= "l0 AS MATERIALIZED (SELECT node, node AS label FROM (SELECT DISTINCT node FROM nb))"
    for (i <- 1 to rounds) {
      sb ++= s",\nl$i AS MATERIALIZED (SELECT node, label FROM (" +
        s"SELECT nb.node AS node, l.label AS label, " +
        s"row_number() OVER (PARTITION BY nb.node ORDER BY count(*) DESC, l.label ASC) AS rn " +
        s"FROM nb JOIN l${i - 1} l ON nb.nbr = l.node GROUP BY nb.node, l.label) WHERE rn = 1)"
    }
    sb ++= s"\nSELECT node, label FROM l$rounds ORDER BY node"
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    "graph_label_propagation" -> lpaSql(rounds = 4),
    "graph_kcore" -> kcorePeelSql(k = 3, rounds = 3),
    // unroll depths: measured sf0.01 fixpoints are 1/4/11/5 rounds for
    // k=1..4 (the 3-core erodes a long low-degree cascade before
    // stabilizing; the 4-core empties); margins above that, and the
    // sf1 sweep's depth proof ([kcore] k=K@core lines) downgrades to a
    // documented skip if a larger corpus converges deeper
    "graph_core_decomposition" -> coreDecompSql(
      Seq(1 -> 3, 2 -> 7, 3 -> 16, 4 -> 8, 5 -> 6, 6 -> 6, 7 -> 6, 8 -> 6)),
    "graph_ktruss" -> ktrussPeelSql(k = 4, rounds = 6),
    // unroll depths: measured sf0.01 fixpoints on the REPEAT graph are
    // 2 rounds for k=3 and 3 for k=4 (which empties the edge set, so
    // k=5/6 are vacuous); margins above that, and the sf1 depth proof
    // ([ktruss] minSupport=M lines) downgrades to a documented skip if
    // a larger corpus converges deeper
    // depths cover sf0.001 too (r20 inherited-state fix): the REPEAT
    // graph is DENSER at tiny SF (fewer parts, same basket sizes), and
    // the measured sf0.001 cascades are k=4: 5 changing rounds, k=5:
    // 31, k=6: 6 — the old (6, 6, 4, 4) under-unrolled k≥5 and left
    // trussness inflated at sf0.001 only (sf0.01/sf0.1/sf1 measured
    // depths ≤ 3 — extra rounds there peel empty/fixpoint sets and are
    // no-ops by idempotence, so the gated boards are unchanged).
    "graph_truss_decomposition" -> trussDecompSql(
      Seq(3 -> 6, 4 -> 10, 5 -> 40, 6 -> 12)),
    "graph_triangle_count" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |      FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk)
        |SELECT count(*) AS triangles
        |FROM e e1
        |JOIN e e2 ON e1.v = e2.u
        |JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v""".stripMargin,
    "bucketed_join_colocated" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stats_gini" ->
      """WITH ranked AS (
        |  SELECT o_orderpriority,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT),
        |               o_orderkey) AS i
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS DOUBLE)
        |    / CAST(count(*) * sum(x) AS DOUBLE) AS gini
        |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin,
    "anomaly_mad_exact" ->
      """WITH ranked AS (
        |  SELECT event_type, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS x,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY CAST(round(value * 100) AS BIGINT), event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events WHERE value IS NOT NULL),
        |med AS (
        |  SELECT event_type, x AS med FROM ranked
        |  WHERE rn = ceil(n * 0.5)),
        |dev AS (
        |  SELECT r.event_type, r.n, m.med, abs(r.x - m.med) AS dev,
        |    row_number() OVER (PARTITION BY r.event_type
        |      ORDER BY abs(r.x - m.med), r.event_id) AS rn2
        |  FROM ranked r JOIN med m ON r.event_type = m.event_type)
        |SELECT event_type, n, med AS med_cents, dev AS mad_cents
        |FROM dev WHERE rn2 = ceil(n * 0.5)
        |ORDER BY event_type""".stripMargin,
    "graph_clustering_coeff" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |      FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk),
        |deg AS (
        |  SELECT node, count(*) AS deg
        |  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY 1),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e1.v = e2.u
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |pn AS (
        |  SELECT node, count(*) AS tri_cnt
        |  FROM (SELECT a AS node FROM tri
        |        UNION ALL SELECT b FROM tri
        |        UNION ALL SELECT c FROM tri)
        |  GROUP BY 1)
        |SELECT deg.node, deg.deg,
        |  coalesce(pn.tri_cnt, 0) AS tri_cnt,
        |  CAST(coalesce(pn.tri_cnt, 0) * 2 AS DOUBLE)
        |    / CAST(deg.deg * (deg.deg - 1) AS DOUBLE) AS cc
        |FROM deg LEFT JOIN pn ON deg.node = pn.node
        |WHERE deg.deg >= 2
        |ORDER BY deg.node""".stripMargin,
    "graph_degree_topk" ->
      """WITH pp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |            FROM lineitem),
        |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
        |      FROM pp a JOIN pp b ON a.ok = b.ok AND a.pk < b.pk)
        |SELECT node, count(*) AS degree
        |FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |GROUP BY 1 ORDER BY degree DESC, node LIMIT 20""".stripMargin,
    "window_cume_dist" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(round(cume_dist() OVER (PARTITION BY c_mktsegment
        |                               ORDER BY c_acctbal, c_custkey)
        |             * 1e9) AS BIGINT) AS cd_e9
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "window_ratio_to_report" ->
      """WITH rev AS (
        |  SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
        |  FROM lineitem GROUP BY 1)
        |SELECT s_nationkey, s_suppkey,
        |  CAST(qty AS DOUBLE)
        |    / CAST(sum(qty) OVER (PARTITION BY s_nationkey) AS DOUBLE)
        |    AS share
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |ORDER BY s_nationkey, s_suppkey""".stripMargin,
    "join_skew_salted" ->
      """SELECT s_suppkey, s_name,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "join_null_safe" ->
      """WITH o AS (SELECT nullif(o_orderstatus, 'O') AS k FROM orders),
        |dim AS (SELECT DISTINCT k FROM o)
        |SELECT dim.k, count(*) AS cnt
        |FROM o JOIN dim ON o.k IS NOT DISTINCT FROM dim.k
        |GROUP BY 1 ORDER BY dim.k NULLS FIRST""".stripMargin,
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |ORDER BY 1""".stripMargin,
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY 1""".stripMargin,
    "except_distinct" ->
      """SELECT * FROM (
        |  SELECT DISTINCT o_custkey AS custkey FROM orders
        |  EXCEPT
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY 1""".stripMargin,
    "intersect_distinct" ->
      """SELECT * FROM (
        |  SELECT DISTINCT o_custkey AS custkey FROM orders
        |  INTERSECT
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY 1""".stripMargin,
    "grouping_rollup" ->
      """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
        |  COALESCE(l_linestatus, '(all)') AS linestatus,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "grouping_cube" ->
      """SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
        |  COALESCE(l_linestatus, '(all)') AS linestatus,
        |  count(*) AS cnt,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "agg_weighted_median" ->
      """WITH c AS (SELECT l_returnflag AS g, l_extendedprice AS v,
        |             CAST(l_quantity AS BIGINT) AS wt FROM lineitem),
        |w AS (SELECT g, v,
        |        sum(wt) OVER (PARTITION BY g ORDER BY v
        |                      RANGE UNBOUNDED PRECEDING) AS cum,
        |        sum(wt) OVER (PARTITION BY g) AS tot
        |      FROM c)
        |SELECT g AS l_returnflag,
        |  min(CASE WHEN cum * 2 >= tot THEN v END) AS wmedian,
        |  min(CASE WHEN cum * 10 >= tot * 9 THEN v END) AS wp90,
        |  CAST(max(tot) AS BIGINT) AS total_weight
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin,
    "percentile_grouped" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "window_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
        |FROM orders ORDER BY 1, 2""".stripMargin,
    "window_lag_delta" ->
      """SELECT o_custkey, o_orderkey,
        |  o_totalprice - lag(o_totalprice, 1) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta_prev
        |FROM orders ORDER BY 1, 2""".stripMargin,
    "window_moving_sum" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum3,
        |  count(*) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS mov_n
        |FROM orders ORDER BY 1, 2""".stripMargin,
    "window_range_frame" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |             date_diff('day', DATE '1970-01-01', o_orderdate) AS days
        |           FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY days
        |    RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trailing_90d
        |FROM o ORDER BY 1, 2""".stripMargin,
    "gap_fill_days" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |                      count(*) AS cnt
        |               FROM events
        |               WHERE event_type = 'purchase' AND user_id = 0
        |               GROUP BY 1)
        |SELECT d.day, coalesce(a.cnt, 0) AS cnt
        |FROM (SELECT unnest(generate_series((SELECT min(day) FROM daily),
        |                                    (SELECT max(day) FROM daily),
        |                                    INTERVAL 1 DAY))::DATE AS day) d
        |LEFT JOIN daily a USING (day)
        |ORDER BY 1""".stripMargin,
    "gap_fill_months" ->
      """WITH monthly AS (SELECT CAST(date_trunc('month', o_orderdate)
        |                          AS DATE) AS month,
        |                        count(*) AS cnt
        |                 FROM orders
        |                 WHERE o_orderstatus = 'F' AND o_custkey = 1
        |                 GROUP BY 1)
        |SELECT m.month, coalesce(a.cnt, 0) AS cnt
        |FROM (SELECT unnest(generate_series(
        |        (SELECT min(month) FROM monthly),
        |        (SELECT max(month) FROM monthly),
        |        INTERVAL 1 MONTH))::DATE AS month) m
        |LEFT JOIN monthly a USING (month)
        |ORDER BY 1""".stripMargin,
    "rank_dense_rank" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CAST(rank() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_quantity) AS INT) AS rk,
        |  CAST(dense_rank() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_quantity) AS INT) AS drk
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "ntile_quartiles" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  CAST(ntile(4) OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS INT)
        |    AS price_quartile
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "stats_chi2_independence" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS r, o_orderpriority AS c
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cells AS (SELECT r, c, count(*) AS o FROM j GROUP BY 1, 2),
        |nr AS (SELECT r, sum(o) AS nr FROM cells GROUP BY 1),
        |nc AS (SELECT c, sum(o) AS nc FROM cells GROUP BY 1),
        |tot AS (SELECT sum(o) AS n FROM cells),
        |term AS (
        |  SELECT CAST(round(1000000.0
        |      * (CAST(o AS DOUBLE)
        |         - CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)
        |           / CAST(n AS DOUBLE))
        |      * (CAST(o AS DOUBLE)
        |         - CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)
        |           / CAST(n AS DOUBLE))
        |      / (CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)
        |         / CAST(n AS DOUBLE)))
        |    AS BIGINT) AS t
        |  FROM cells JOIN nr USING (r) JOIN nc USING (c) CROSS JOIN tot)
        |SELECT count(*) AS n_cells, CAST(sum(t) AS BIGINT) AS chi2_fp_e6
        |FROM term""".stripMargin,
    "intersect_all_parts" ->
      """SELECT l_partkey, count(*) AS multiplicity FROM (
        |  SELECT l_partkey FROM lineitem
        |  INTERSECT ALL
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "stats_ks_statistic" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS x, event_id
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
        |tot AS (
        |  SELECT sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
        |         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n2
        |  FROM ev),
        |run AS (
        |  SELECT
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      OVER (ORDER BY x, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
        |    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      OVER (ORDER BY x, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
        |  FROM ev)
        |SELECT max(CAST(round(abs(
        |    CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE)) * 1e9)
        |  AS BIGINT)) AS ks_d_e9
        |FROM run CROSS JOIN tot""".stripMargin,
    "except_all_parts" ->
      """SELECT * FROM (
        |  SELECT l_partkey FROM lineitem
        |  EXCEPT ALL
        |  SELECT p_partkey FROM part)
        |ORDER BY 1""".stripMargin,
    "string_agg_nations" ->
      """SELECT r_name,
        |  string_agg(n_name, ', ' ORDER BY n_name) AS nations,
        |  count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_predicates" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS big_qty_cnt,
        |  bool_and(l_extendedprice > 0) AS all_pos_price,
        |  bool_or(l_discount > 0.05) AS any_big_disc
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "window_distinct_count" ->
      """WITH per AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    list(DISTINCT l_suppkey) AS supps
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY 1, 2, 3)
        |SELECT o_custkey, o_orderkey,
        |  CAST(len(list_distinct(flatten(list(supps) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS UNBOUNDED PRECEDING)))) AS INT) AS distinct_supps
        |FROM per WHERE o_custkey < 100 ORDER BY 1, 2""".stripMargin,
    "window_first_last" ->
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS last_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY 1, 2""".stripMargin,
    "stats_moments" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        |  CAST(floor((n * sxx - sx * sx) / (n * (n - 1)) * 1e6 + 0.5)
        |    AS BIGINT) AS var_qty_e6,
        |  CAST(floor(sqrt((n * sxx - sx * sx) / (n * (n - 1))) * 1e6 + 0.5)
        |    AS BIGINT) AS stddev_qty_e6,
        |  CAST(floor((n * sxy - sx * sy)
        |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e9 + 0.5)
        |    AS BIGINT) AS corr_qty_price_e9
        |FROM m ORDER BY 1""".stripMargin,
    "percent_rank_price" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag,
        |  percent_rank() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS pct_rank,
        |  cume_dist() OVER (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS cume
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "sample_hash" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        |ORDER BY 1""".stripMargin,
    "argmax_order" ->
      """SELECT o_custkey, o_orderkey AS top_orderkey,
        |  o_totalprice AS top_price
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY 1""".stripMargin,
    "merge_scd2" ->
      """WITH history AS (SELECT c_custkey, c_mktsegment,
        |                        DATE '2020-01-01' AS valid_from,
        |                        CAST(NULL AS DATE) AS valid_to
        |                 FROM customer),
        |snap AS (SELECT c_custkey,
        |                CASE WHEN c_custkey % 7 = 0 THEN 'MOVED'
        |                     ELSE c_mktsegment END AS c_mktsegment
        |         FROM customer
        |         UNION ALL SELECT 8888888, 'BUILDING'),
        |j AS (SELECT h.c_custkey AS hk, h.c_mktsegment AS hv, h.valid_from,
        |             u.c_custkey AS uk, u.c_mktsegment AS uv
        |      FROM history h FULL OUTER JOIN snap u
        |        ON h.c_custkey = u.c_custkey)
        |SELECT hk AS c_custkey, hv AS c_mktsegment, valid_from,
        |       CASE WHEN uk IS NOT NULL AND uv IS DISTINCT FROM hv
        |            THEN DATE '2024-06-01' END AS valid_to
        |FROM j WHERE hk IS NOT NULL
        |UNION ALL
        |SELECT uk, uv, DATE '2024-06-01', CAST(NULL AS DATE)
        |FROM j WHERE uk IS NOT NULL AND (hk IS NULL OR uv IS DISTINCT FROM hv)
        |ORDER BY 1, 3""".stripMargin,
    "merge_upsert" ->
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
        |updates AS (
        |  SELECT c_custkey, upper(c_name) AS c_name,
        |         c_acctbal + 100.0 AS c_acctbal
        |  FROM base WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT 9999999, 'Customer#new', 0.0)
        |SELECT coalesce(u.c_custkey, b.c_custkey) AS c_custkey,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name
        |       ELSE b.c_name END AS c_name,
        |  CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
        |       ELSE b.c_acctbal END AS c_acctbal
        |FROM base b FULL OUTER JOIN updates u
        |  ON b.c_custkey = u.c_custkey
        |ORDER BY 1""".stripMargin,
    "sample_stratified" ->
      """WITH rates(event_type, keep_of_256) AS (
        |  VALUES ('purchase', 256), ('click', 64), ('view', 16))
        |SELECT e.event_type, count(*) AS sampled_cnt,
        |  CAST(sum(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events e JOIN rates r USING (event_type)
        |WHERE CAST(concat('0x', substr(md5(CAST(e.event_id AS VARCHAR)), 1, 2))
        |           AS INT) < r.keep_of_256
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "distinct_count_two_phase" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS distinct_parts
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "date_arith" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS due_month,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT)
        |    AS days_to_cutoff
        |FROM orders ORDER BY 1""".stripMargin,
    "regexp_clean" ->
      """SELECT p_partkey,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS deverbed,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word
        |FROM part ORDER BY 1""".stripMargin,
    "regr_fit" ->
      """WITH m AS (
        |  SELECT l_returnflag,
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag,
        |  CAST(floor((n * sxy - sx * sy) / (n * sxx - sx * sx) * 1e6 + 0.5)
        |    AS BIGINT) AS slope_e6,
        |  CAST(floor((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
        |    / n * 1e6 + 0.5) AS BIGINT) AS intercept_e6,
        |  CAST(floor(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e9 + 0.5)
        |    AS BIGINT) AS r2_e9
        |FROM m ORDER BY 1""".stripMargin,
    "cross_join_pairs" ->
      """SELECT r_name, o_orderpriority
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
        |ORDER BY r_name, o_orderpriority""".stripMargin,
    "bitwise_agg" ->
      """SELECT o_custkey,
        |  bit_and(o_orderkey) AS key_and,
        |  bit_or(o_orderkey) AS key_or,
        |  bit_xor(o_orderkey) AS key_xor
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sample_group_topk" ->
      """SELECT c_mktsegment, c_custkey, rn FROM (
        |  SELECT c_mktsegment, c_custkey,
        |    CAST(row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey)
        |      AS INT) AS rn
        |  FROM customer)
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,
    "pivot_dynamic" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (o_orderstatus = 'F') AS "F",
        |  count(*) FILTER (o_orderstatus = 'O') AS "O",
        |  count(*) FILTER (o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "percentile_disc_grouped" ->
      """WITH ranked AS (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_quantity) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  min(CASE WHEN rn = ceil(n * 0.25) THEN l_quantity END) AS p25,
        |  min(CASE WHEN rn = ceil(n * 0.5)  THEN l_quantity END) AS p50,
        |  min(CASE WHEN rn = ceil(n * 0.9)  THEN l_quantity END) AS p90
        |FROM ranked
        |WHERE rn = ceil(n * 0.25) OR rn = ceil(n * 0.5)
        |   OR rn = ceil(n * 0.9)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "null_funcs" ->
      """SELECT c_custkey,
        |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER')
        |    AS seg_or_other,
        |  CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos,
        |  c_acctbal < 0 AS was_negative
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "grouping_sets_explicit" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE)
        |         AS sum_price
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
        |ORDER BY o_orderpriority NULLS FIRST,
        |         o_orderstatus NULLS FIRST""".stripMargin,
    "explode_outer_empty" ->
      """WITH e AS (
        |  SELECT d.doc_id, u.digit_run
        |  FROM documents d LEFT JOIN
        |    (SELECT doc_id, unnest(regexp_extract_all(text, '[0-9]+'))
        |       AS digit_run
        |     FROM documents) u USING (doc_id))
        |SELECT count(*) AS n_rows, count(digit_run) AS n_non_null,
        |       count(DISTINCT doc_id) AS n_docs
        |FROM e""".stripMargin,
    "fuzzy_levenshtein_pairs" ->
      """SELECT x.p_partkey AS p1,
        |  CAST(levenshtein(x.p_name, y.p_name) AS INT) AS dist,
        |  1.0 - CAST(levenshtein(x.p_name, y.p_name) AS DOUBLE)
        |    / greatest(length(x.p_name), length(y.p_name)) AS sim
        |FROM part x JOIN part y ON y.p_partkey = x.p_partkey + 1
        |ORDER BY p1""".stripMargin,
    "graph_bfs_hops" ->
      """WITH RECURSIVE raw AS (
        |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT DISTINCT src, dst FROM raw
        |      UNION SELECT DISTINCT dst, src FROM raw),
        |p(node, dist) AS (
        |  SELECT s_suppkey * 2 + 1, 0 FROM supplier WHERE s_nationkey = 0
        |  UNION
        |  SELECT e.dst, p.dist + 1
        |  FROM p JOIN e ON e.src = p.node WHERE p.dist < 3)
        |SELECT node, CAST(min(dist) AS INT) AS dist
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "anomaly_zscore_exact" ->
      """WITH c AS (SELECT l_returnflag,
        |             CAST(round(l_extendedprice * 100) AS BIGINT) AS x
        |           FROM lineitem),
        |g AS (SELECT l_returnflag, count(*) AS n,
        |        sum(x) AS s1, sum(x * x) AS s2
        |      FROM c GROUP BY 1)
        |SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN 4 * (g.n * c.x - g.s1) * (g.n * c.x - g.s1)
        |                   > 9 * (g.n * g.s2 - g.s1 * g.s1)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM c JOIN g USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "pagerank_fixed" -> {
      // Mirrors PageRank.runFixed bit-for-bit: scale 1e12, damping
      // 85/100, 3 unrolled power iterations, dangling mass folded in.
      // DuckDB `//` (floor division) equals Spark `div` (truncation)
      // because every operand here is non-negative; integer sums are
      // order-independent, so the hashes match.
      val iters = 3
      val steps = (1 to iters).map { i =>
        val prev = s"r${i - 1}"
        s"""m$i AS (SELECT e.dst AS node,
           |    CAST(sum(r.r // d.deg) AS BIGINT) AS m
           |  FROM raw e JOIN deg d USING (src)
           |  JOIN $prev r ON r.node = e.src GROUP BY 1),
           |d$i AS (SELECT CAST(COALESCE(sum(r.r), 0) AS BIGINT) AS dm
           |  FROM $prev r
           |  WHERE r.node NOT IN (SELECT src FROM deg)),
           |r$i AS (SELECT nd.node,
           |    (15 * (1000000000000 // nn.n)) // 100
           |    + (85 * (COALESCE(m$i.m, 0) + d$i.dm // nn.n)) // 100 AS r
           |  FROM nodes nd CROSS JOIN nn CROSS JOIN d$i
           |  LEFT JOIN m$i ON m$i.node = nd.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS (
         |  SELECT CAST(o_custkey * 2 AS BIGINT) AS src,
         |         CAST(l_suppkey * 2 + 1 AS BIGINT) AS dst
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         |nodes AS (SELECT DISTINCT node FROM (
         |  SELECT src AS node FROM raw UNION ALL SELECT dst FROM raw)),
         |deg AS (SELECT src, count(*) AS deg FROM raw GROUP BY 1),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT node, (SELECT 1000000000000 // n FROM nn) AS r
         |       FROM nodes),
         |$steps
         |SELECT node, r AS rank_fp FROM r$iters ORDER BY node""".stripMargin
    },
    "sample_weighted_systematic" ->
      """WITH docs AS (SELECT doc_id, n_chars FROM documents),
        |tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS tw FROM docs),
        |c AS (SELECT doc_id, n_chars,
        |        CAST(sum(n_chars) OVER
        |          (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
        |        greatest(tw // 50, 1) AS step
        |      FROM docs CROSS JOIN tot)
        |SELECT doc_id, n_chars, cw FROM c
        |WHERE cw // step > (cw - n_chars) // step
        |ORDER BY doc_id""".stripMargin,
    "layout_hilbert_key" -> {
      // Mirrors Layout.hilbertKey level by level: the same xy2d
      // recurrence unrolled over 8 bit levels (s = 128 … 1), reflect
      // with n-1 = 255, all-integer CASE/xor arithmetic — so the key
      // hash-matches bit for bit.
      val order = 8
      val n = 1L << order
      val levels = (order - 1) to 0 by -1
      val steps = levels.zipWithIndex.map { case (lvl, i) =>
        val s = 1L << lvl
        val prev = s"h$i"
        s"""h${i + 1} AS (
           |  SELECT c_custkey, gx, gy,
           |    CASE WHEN ry = 0 THEN
           |           (CASE WHEN rx = 1 THEN ${n - 1} - y ELSE y END)
           |         ELSE x END AS x,
           |    CASE WHEN ry = 0 THEN
           |           (CASE WHEN rx = 1 THEN ${n - 1} - x ELSE x END)
           |         ELSE y END AS y,
           |    d + ${s * s} * xor(3 * rx, ry) AS d
           |  FROM (SELECT *,
           |          CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
           |          CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
           |        FROM $prev) t)""".stripMargin
      }.mkString(",\n")
      s"""WITH h0 AS (
         |  SELECT c_custkey,
         |         c_custkey % 256 AS gx, c_nationkey * 10 AS gy,
         |         c_custkey % 256 AS x, c_nationkey * 10 AS y,
         |         CAST(0 AS BIGINT) AS d
         |  FROM customer),
         |$steps
         |SELECT c_custkey, gx, gy, CAST(d AS BIGINT) AS hkey
         |FROM h$order ORDER BY hkey, c_custkey""".stripMargin
    }
  )
}
