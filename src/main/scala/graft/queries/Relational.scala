package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.Fns._
import graft.operators.Hierarchy

/** SURVEY.md §2 operator inventory as named queries over the driver
  * testdata (star schema), each with an ANSI-SQL DuckDB oracle.
  *
  * Determinism rules (so a hash compare is meaningful):
  *   - money aggregates go through DECIMAL (order-insensitive) and are
  *     cast back to double;
  *   - every ORDER BY / LIMIT carries a total tiebreak;
  *   - no libm-dependent value (log/exp) is ever *output* or used as a
  *     sort key — ratios use plain IEEE division which is identical
  *     across engines.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- aggregations -------------------------------------------------
    "q1_agg" -> ((s, d) => {
      // A1: grouped sums (pricing summary). Decimal accumulation keeps
      // the double output independent of partial-aggregation order.
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          dbl(sum(money(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount"))))
            .as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "agg_scalar" -> ((s, d) => {
      // A3: scalar aggregate -> single-row frame (rebase-factor shape,
      // gpd_etl_pipeline.R:124-127). Stays a 1-row DataFrame: no
      // collect, so it composes into larger plans via cross-join.
      t(s, d, "lineitem")
        .agg(
          dbl(sum(when(col("l_returnflag") === "R", money(col("l_extendedprice")))))
            .as("r_revenue"),
          moneySum(col("l_extendedprice")).as("total_revenue"))
        .select(col("r_revenue"), col("total_revenue"),
                (col("r_revenue") / col("total_revenue")).as("r_share"))
    }),
    "window_anchor" -> ((s, d) => {
      // A4: group-broadcast of an anchor value with the R length==1
      // guard (gpd_etl_pipeline.R:237-240): each order carries the
      // customer's 1995 total *iff* the customer has exactly one 1995
      // order, else null.
      val w = Window.partitionBy(col("o_custkey"))
      val yr = year(col("o_orderdate"))
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          when(count(when(yr === 1995, lit(1))).over(w) === 1,
               max(when(yr === 1995, col("o_totalprice"))).over(w))
            .as("anchor_1995"))
        .orderBy("o_orderkey")
    }),
    "first_in_group" -> ((s, d) => {
      // A5: first row per group under a total order (date, key tiebreak).
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey").as("first_order"),
                col("o_orderdate").as("first_date"))
        .orderBy("o_custkey")
    }),
    "years_run_compression" -> ((s, d) => {
      // A6: sorted distinct ints -> "1995-1997, 2000" run string
      // (04-discrepancies-before-last-year.Rmd:61-83). Distributed
      // groupBy + bounded per-group array + scalar UDF.
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(yearRuns(sort_array(collect_set(year(col("o_orderdate")))))
          .as("year_runs"))
        .orderBy("o_custkey")
    }),
    "max_magnitude_per_group" -> ((s, d) => {
      // A7: keep rows achieving the group max (08-deflators.Rmd:85-86).
      val w = Window.partitionBy(col("l_returnflag"))
      t(s, d, "lineitem")
        .withColumn("max_price", max(col("l_extendedprice")).over(w))
        .where(col("l_extendedprice") === col("max_price"))
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
                col("l_extendedprice"))
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    }),
    "distinct_labels" -> ((s, d) =>
      // A8
      t(s, d, "customer").select(col("c_mktsegment")).distinct()
        .orderBy("c_mktsegment")),

    // ---- projection / column ops --------------------------------------
    "proj_prune" -> ((s, d) =>
      // P1: narrow projection + filter; both must reach the parquet scan
      // (PushedFilters + 2-column ReadSchema).
      t(s, d, "lineitem")
        .where(col("l_extendedprice") > 900.0)
        .select(col("l_orderkey"), col("l_extendedprice"))
        .orderBy("l_orderkey", "l_extendedprice")),
    "cond_replace" -> ((s, d) =>
      // P5: masked update via when/otherwise.
      t(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "O", lit("OPEN"))
            .otherwise(col("o_orderstatus")).as("status"))
        .orderBy("o_orderkey")),
    "recode_map" -> ((s, d) =>
      // P6: value-map remap, unmatched pass through.
      //
      // The mapped keys are generator names (r19 campaign 5c): the
      // original CHINA/FRANCE/GERMANY mapping matched NOTHING in the
      // synthetic nation table (names are NATION_0..24 at every SF),
      // so the remap arm never fired, every row rode the passthrough,
      // and a mapping mutation survived the gate — the row verified
      // only the identity. With present keys both arms are live at
      // every SF and any mapping edit hash-fails.
      t(s, d, "nation")
        .select(col("n_nationkey"),
          recode(col("n_name"), Map("NATION_0" -> "N0", "NATION_7" -> "N7",
                                    "NATION_19" -> "N19")).as("n_code"))
        .orderBy("n_nationkey")),
    "case_when_buckets" -> ((s, d) =>
      // P7: multi-branch conditional.
      t(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") < 50000.0, lit("small"))
            .when(col("o_totalprice") < 150000.0, lit("mid"))
            .otherwise(lit("big")).as("bucket"))
        .orderBy("o_orderkey")),
    "cast_types" -> ((s, d) =>
      // P8: numeric<->string<->date casts.
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_orderkey").cast("string").as("key_str"),
          col("l_shipdate").cast("date").cast("string").as("ship_day"))
        .orderBy("l_orderkey", "l_linenumber")),

    // ---- filters -------------------------------------------------------
    "filter_in_set" -> ((s, d) =>
      // F1: set membership.
      t(s, d, "lineitem")
        .where(col("l_returnflag").isin("A", "R"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
        .orderBy("l_orderkey", "l_linenumber")),
    "between_dynamic" -> ((s, d) => {
      // F2: range with row-dependent bounds after a join
      // (gpd_etl_pipeline.R:331).
      val l = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .where(col("l_shipdate").between(
          col("o_orderdate"), col("o_orderdate") + expr("INTERVAL 60 DAYS")))
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "null_predicates" -> ((s, d) => {
      // F3: isNull/isNotNull over a synthesized-null column.
      val rf = when(col("l_returnflag") === "N", lit(null).cast("string"))
        .otherwise(col("l_returnflag"))
      t(s, d, "lineitem")
        .withColumn("rf", rf)
        .groupBy(col("l_linestatus"))
        .agg(count(col("rf")).as("nonnull_cnt"),
             sum(when(col("rf").isNull, 1L).otherwise(0L)).as("null_cnt"))
        .orderBy("l_linestatus")
    }),
    "strlen_leaf_filter" -> ((s, d) =>
      // F4: string-length predicate (leaf-vs-group shape,
      // gpd_etl_pipeline.R:527).
      t(s, d, "part")
        .where(length(col("p_name")) < 12)
        .select(col("p_partkey"), col("p_name"))
        .orderBy("p_partkey")),
    "near_tolerance" -> ((s, d) => {
      // F5: tolerance compare on IEEE-exact arithmetic (single divide /
      // subtract — identical across engines).
      val l = t(s, d, "lineitem")
      val p = t(s, d, "part")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .where(near(col("l_extendedprice") / col("l_quantity"),
                    col("p_retailprice"), 5.0))
        .select(col("l_orderkey"), col("l_linenumber"), col("p_partkey"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- joins ----------------------------------------------------------
    "join_inner" -> ((s, d) => {
      // J1
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy("o_orderkey")
    }),
    "join_left_enrich" -> ((s, d) => {
      // J2: left-enrich a dim with an aggregated fact; unmatched -> 0.
      val cnt = t(s, d, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("order_cnt"))
      // cnt is custkey-grain — data-sized, and its aggregate-derived
      // row estimate is a guess (the initial plan chose to broadcast
      // it; r14 audit — the maxResultSize class). Pin the shuffle
      // join: both sides scale with the data.
      t(s, d, "customer")
        .join(cnt.hint("merge"), col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_name"),
                coalesce(col("order_cnt"), lit(0L)).as("order_cnt"))
        .orderBy("c_custkey")
    }),
    "join_full_outer" -> ((s, d) => {
      // J3: full outer with coalesced key (old-vs-new release shape,
      // gdp_compare_with_old_data.R:38-44).
      //
      // Each side filters on the KEY ITSELF (a: nationkey < 20, b:
      // nationkey >= 5) so BOTH outer arms are live by construction
      // at every SF — keys 0-4 are a-only, 20-24 b-only, 5-19 matched.
      // Before the r20 rescope, every nation had both customers and
      // suppliers at every gate SF, so full_outer ≡ inner, the
      // coalesce never fired, and a join-type mutation survived the
      // gate (the r19 gap-fill / join_left_enrich dead-arm class).
      // GateSensitivitySpec pins both unmatched arms non-empty.
      val a = t(s, d, "customer").where(col("c_nationkey") < 20)
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("customer_cnt"))
      val b = t(s, d, "supplier").where(col("s_nationkey") >= 5)
        .groupBy(col("s_nationkey").as("nk2"))
        .agg(count(lit(1)).as("supplier_cnt"))
      a.join(b, col("nk") === col("nk2"), "full_outer")
        .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
                col("customer_cnt"), col("supplier_cnt"))
        .orderBy("nationkey")
    }),
    "join_self_manytomany" -> ((s, d) => {
      // J4: self-join, M:N (hierarchy expansion step shape).
      val n = t(s, d, "nation")
      n.as("a").join(n.as("b"),
          col("a.n_regionkey") === col("b.n_regionkey") &&
          col("a.n_name") < col("b.n_name"))
        .select(col("a.n_regionkey").as("regionkey"),
                col("a.n_name").as("nation_a"), col("b.n_name").as("nation_b"))
        .orderBy("regionkey", "nation_a", "nation_b")
    }),
    "broadcast_dim_join" -> ((s, d) => {
      // J7: explicit broadcast of the dim side — no shuffle of the fact
      // table; at 100 TB this is the difference between a map-side join
      // and a full repartition.
      val l = t(s, d, "lineitem")
      val p = t(s, d, "part").where(col("p_size") > 25)
      l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy("p_brand")
    }),
    "hierarchy_closure" -> ((s, d) => {
      // J5: recursive transitive closure via driver-side fixpoint over
      // distributed joins (gpd_etl_pipeline.R:347-388).
      Hierarchy.closure(edges(s, d), "parent", "child")
        .orderBy("ancestor", "descendant")
    }),
    "hierarchy_rollup" -> ((s, d) => {
      // J6+A2: fan-out join through the closure + grouped sum.
      val n = t(s, d, "nation")
      val leaf = t(s, d, "customer")
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("node"))
        .agg(sum(money(col("c_acctbal"))).as("leaf_total"))
      val cl = Hierarchy.closure(edges(s, d), "parent", "child")
      cl.join(leaf, cl("descendant") === leaf("node"))
        .groupBy(col("ancestor"))
        .agg(dbl(sum(col("leaf_total"))).as("total_acctbal"))
        .orderBy("ancestor")
    }),

    // ---- window / sort / top-k ------------------------------------------
    "sort_computed_desc" -> ((s, d) => {
      // W2: sort by computed key, descending. Ratio via IEEE division
      // (identical across engines), full tiebreak.
      val l = t(s, d, "lineitem")
      val p = t(s, d, "part")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
                (col("l_extendedprice") / col("p_retailprice")).as("ratio"))
        .orderBy(col("ratio").desc, col("l_orderkey"), col("l_linenumber"))
    }),
    "topk_log_ratio" -> ((s, d) => {
      // W3: top-k after computed sort (05-discrepancies-last-year.Rmd).
      // |log(a/b)| ordering == greatest(a/b, b/a) ordering; the latter
      // is libm-free hence engine-stable.
      val l = t(s, d, "lineitem")
      val p = t(s, d, "part")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .select(col("l_orderkey"), col("l_linenumber"),
          greatest(col("l_extendedprice") / col("p_retailprice"),
                   col("p_retailprice") / col("l_extendedprice")).as("mag"))
        .orderBy(col("mag").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(19)
    }),

    // ---- set ops ----------------------------------------------------------
    "union_by_name" -> ((s, d) => {
      // U1: bind_rows semantics — align by name, null-fill missing
      // columns (unionByName + allowMissingColumns).
      val a = t(s, d, "customer")
        .select(col("c_custkey").as("id"), col("c_name").as("name"),
                col("c_acctbal").as("acctbal"), lit("customer").as("src"))
      val b = t(s, d, "supplier")
        .select(col("s_suppkey").as("id"), col("s_name").as("name"),
                lit("supplier").as("src"))
      a.unionByName(b, allowMissingColumns = true).orderBy("src", "id")
    }),

    // ---- reshape ------------------------------------------------------------
    "unpivot_measures" -> ((s, d) =>
      // R1/R2: wide measures -> long (pivot_longer).
      t(s, d, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "value")
        .orderBy("l_orderkey", "l_linenumber", "measure")),
    "pivot_wider" -> ((s, d) =>
      // R3: long -> wide (pivot_wider) with explicit value list — no
      // extra distinct-scan job, plan is static.
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(moneySum(col("l_extendedprice")))
        .orderBy("l_returnflag")),

    // ---- scalar function surface ---------------------------------------------
    "scalar_string_funcs" -> ((s, d) => {
      // §2.9: lpad / length / substring / concat_ws.
      val n = t(s, d, "nation")
      val r = t(s, d, "region")
      n.join(r, n("n_regionkey") === r("r_regionkey"))
        .select(col("n_nationkey"),
          padCode(col("n_nationkey").cast("string")).as("code"),
          length(col("n_name")).as("name_len"),
          substring(col("n_name"), 1, 3).as("prefix"),
          concat_ws("-", col("r_name"), col("n_name")).as("path"))
        .orderBy("n_nationkey")
    }),
    "round_half_even" -> ((s, d) =>
      // §2.9: R round() is half-to-even -> bround. l_quantity/2 yields
      // exact .0/.5 doubles so the mode is actually exercised.
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          roundHalfEven(col("l_quantity") / 2).as("half_qty"))
        .orderBy("l_orderkey", "l_linenumber")),
    "sci_format" -> ((s, d) =>
      // §2.9: R format(digits=3, scientific=TRUE) ≈ %.2E; scalar UDF,
      // US locale pinned (matches C printf %E in the oracle).
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          sciFormat(col("l_extendedprice")).as("sci"))
        .orderBy("l_orderkey", "l_linenumber")),
    "date_format_refdate" -> ((s, d) =>
      // §2.9: d-MMM-yy RefDate + date part extraction.
      t(s, d, "orders")
        .select(col("o_orderkey"),
          refDate(col("o_orderdate")).as("refdate"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"))
        .orderBy("o_orderkey")),

    // ---- bench-headline joins ---------------------------------------------
    "q3_shipping" -> ((s, d) => {
      val o = t(s, d, "orders").where(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, d, "lineitem").where(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      // pre-aggregate revenue per order BEFORE the join: decimal sums
      // are associative, so regrouping after the join is exact, and the
      // join's big side shrinks by the lines-per-order factor.
      val rev = l.groupBy(col("l_orderkey"))
        .agg(sum(money(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
          .as("rev"))
      rev.join(o, rev("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dbl(sum(col("rev"))).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    "q5_region_revenue" -> ((s, d) => {
      // Star join: dims broadcast, single shuffle for the final group.
      // lineitem pre-aggregates to one revenue row per order before the
      // fact-fact join (decimal addition is associative, so regrouping
      // by nation after the join is exact): the orderkey shuffle moves
      // #orders rows instead of #lineitems.
      val r = t(s, d, "region")
      val n = t(s, d, "nation")
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      val rev = t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(money(col("l_extendedprice")) * rate(lit(1.0) - col("l_discount")))
          .as("rev"))
      rev.join(o, rev("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(dbl(sum(col("rev"))).as("revenue"))
        .orderBy("r_name", "n_name")
    })
  )

  /** Synthetic 2-level hierarchy (nation -> region -> WORLD) mirroring
    * the reference's country DAG (FIXTURES.md §B mapping).
    */
  private def edges(s: SparkSession, d: String): DataFrame = {
    val n = t(s, d, "nation")
    val r = t(s, d, "region")
    n.join(r, n("n_regionkey") === r("r_regionkey"))
      .select(col("r_name").as("parent"), col("n_name").as("child"))
      .union(r.select(lit("WORLD").as("parent"), col("r_name").as("child")))
  }

  /** DuckDB oracle for the synthetic hierarchy edges. */
  private val edgesSql =
    """SELECT r_name AS parent, n_name AS child
      |  FROM nation JOIN region ON n_regionkey = r_regionkey
      |UNION ALL SELECT 'WORLD', r_name FROM region""".stripMargin

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "agg_scalar" ->
      """SELECT r_revenue, total_revenue, r_revenue / total_revenue AS r_share FROM (
        |  SELECT
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS r_revenue,
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue
        |  FROM lineitem)""".stripMargin,
    "window_anchor" ->
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN count(CASE WHEN year(o_orderdate) = 1995 THEN 1 END)
        |            OVER (PARTITION BY o_custkey) = 1
        |       THEN max(CASE WHEN year(o_orderdate) = 1995 THEN o_totalprice END)
        |            OVER (PARTITION BY o_custkey)
        |  END AS anchor_1995
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "first_in_group" ->
      """SELECT o_custkey, o_orderkey AS first_order, o_orderdate AS first_date
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        |                                   ORDER BY o_orderdate, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "years_run_compression" ->
      """WITH y AS (SELECT DISTINCT o_custkey, CAST(year(o_orderdate) AS INT) AS yr FROM orders),
        |g AS (SELECT o_custkey, yr,
        |             yr - CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY yr) AS INT) AS grp
        |      FROM y),
        |r AS (SELECT o_custkey, grp, min(yr) AS lo, max(yr) AS hi FROM g GROUP BY 1, 2)
        |SELECT o_custkey,
        |  string_agg(CASE WHEN lo = hi THEN CAST(lo AS VARCHAR)
        |                  ELSE CAST(lo AS VARCHAR) || '-' || CAST(hi AS VARCHAR) END,
        |             ', ' ORDER BY lo) AS year_runs
        |FROM r GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "max_magnitude_per_group" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
        |FROM (SELECT *, max(l_extendedprice) OVER (PARTITION BY l_returnflag) AS mx
        |      FROM lineitem)
        |WHERE l_extendedprice = mx ORDER BY 1, 2, 3""".stripMargin,
    "distinct_labels" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY 1",
    "proj_prune" ->
      """SELECT l_orderkey, l_extendedprice FROM lineitem
        |WHERE l_extendedprice > 900.0 ORDER BY 1, 2""".stripMargin,
    "cond_replace" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus = 'O' THEN 'OPEN' ELSE o_orderstatus END AS status
        |FROM orders ORDER BY 1""".stripMargin,
    "recode_map" ->
      """SELECT n_nationkey,
        |  CASE n_name WHEN 'NATION_0' THEN 'N0' WHEN 'NATION_7' THEN 'N7'
        |              WHEN 'NATION_19' THEN 'N19' ELSE n_name END AS n_code
        |FROM nation ORDER BY 1""".stripMargin,
    "case_when_buckets" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000.0 THEN 'small'
        |       WHEN o_totalprice < 150000.0 THEN 'mid'
        |       ELSE 'big' END AS bucket
        |FROM orders ORDER BY 1""".stripMargin,
    "cast_types" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(trunc(l_quantity) AS INT) AS qty_int,
        |  CAST(l_orderkey AS VARCHAR) AS key_str,
        |  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "filter_in_set" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |WHERE l_returnflag IN ('A', 'R') ORDER BY 1, 2""".stripMargin,
    "between_dynamic" ->
      """SELECT l_orderkey, l_linenumber
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate BETWEEN o_orderdate AND o_orderdate + INTERVAL 60 DAY
        |ORDER BY 1, 2""".stripMargin,
    "null_predicates" ->
      """SELECT l_linestatus,
        |  count(CASE WHEN l_returnflag = 'N' THEN NULL ELSE l_returnflag END) AS nonnull_cnt,
        |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "strlen_leaf_filter" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE length(p_name) < 12 ORDER BY 1""".stripMargin,
    "near_tolerance" ->
      """SELECT l_orderkey, l_linenumber, p_partkey
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE abs(l_extendedprice / l_quantity - p_retailprice) < 5.0
        |ORDER BY 1, 2""".stripMargin,
    "join_inner" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY 1""".stripMargin,
    "join_left_enrich" ->
      """SELECT c_custkey, c_name, COALESCE(order_cnt, 0) AS order_cnt
        |FROM customer LEFT JOIN
        |  (SELECT o_custkey, count(*) AS order_cnt FROM orders GROUP BY 1) o
        |  ON c_custkey = o_custkey
        |ORDER BY 1""".stripMargin,
    "join_full_outer" ->
      """SELECT COALESCE(a.nk, b.nk) AS nationkey, a.customer_cnt, b.supplier_cnt
        |FROM (SELECT c_nationkey AS nk, count(*) AS customer_cnt FROM customer
        |      WHERE c_nationkey < 20 GROUP BY 1) a
        |FULL OUTER JOIN
        |     (SELECT s_nationkey AS nk, count(*) AS supplier_cnt FROM supplier
        |      WHERE s_nationkey >= 5 GROUP BY 1) b
        |ON a.nk = b.nk ORDER BY 1""".stripMargin,
    "join_self_manytomany" ->
      """SELECT a.n_regionkey AS regionkey, a.n_name AS nation_a, b.n_name AS nation_b
        |FROM nation a JOIN nation b
        |  ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
        |ORDER BY 1, 2, 3""".stripMargin,
    "broadcast_dim_join" ->
      """SELECT p_brand, sum(l_quantity) AS sum_qty, count(*) AS cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size > 25 GROUP BY 1 ORDER BY 1""".stripMargin,
    "hierarchy_closure" ->
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |cl AS (SELECT parent AS ancestor, child AS descendant FROM edges
         |       UNION
         |       SELECT cl.ancestor, e.child
         |       FROM cl JOIN edges e ON cl.descendant = e.parent)
         |SELECT ancestor, descendant FROM cl ORDER BY 1, 2""".stripMargin,
    "hierarchy_rollup" ->
      s"""WITH RECURSIVE edges AS ($edgesSql),
         |cl AS (SELECT parent AS ancestor, child AS descendant FROM edges
         |       UNION
         |       SELECT cl.ancestor, e.child
         |       FROM cl JOIN edges e ON cl.descendant = e.parent),
         |leaf AS (SELECT n_name AS node, sum(CAST(c_acctbal AS DECIMAL(12,2))) AS leaf_total
         |         FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1)
         |SELECT ancestor, CAST(sum(leaf_total) AS DOUBLE) AS total_acctbal
         |FROM cl JOIN leaf ON cl.descendant = leaf.node
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sort_computed_desc" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice / p_retailprice AS ratio
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY ratio DESC, l_orderkey, l_linenumber""".stripMargin,
    "topk_log_ratio" ->
      """SELECT l_orderkey, l_linenumber,
        |  greatest(l_extendedprice / p_retailprice, p_retailprice / l_extendedprice) AS mag
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |ORDER BY mag DESC, l_orderkey, l_linenumber LIMIT 19""".stripMargin,
    "union_by_name" ->
      """SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal, 'customer' AS src FROM customer
        |UNION ALL
        |SELECT s_suppkey, s_name, NULL, 'supplier' FROM supplier
        |ORDER BY src, id""".stripMargin,
    "unpivot_measures" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
        |ORDER BY 1, 2, 3""".stripMargin,
    "pivot_wider" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS F,
        |  CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS DOUBLE) AS O
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "scalar_string_funcs" ->
      """SELECT n_nationkey,
        |  lpad(CAST(n_nationkey AS VARCHAR), 3, '0') AS code,
        |  CAST(length(n_name) AS INT) AS name_len,
        |  substr(n_name, 1, 3) AS prefix,
        |  concat_ws('-', r_name, n_name) AS path
        |FROM nation JOIN region ON n_regionkey = r_regionkey ORDER BY 1""".stripMargin,
    "round_half_even" ->
      """SELECT l_orderkey, l_linenumber, round_even(l_quantity / 2, 0) AS half_qty
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "sci_format" ->
      """SELECT l_orderkey, l_linenumber, printf('%.2E', l_extendedprice) AS sci
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "date_format_refdate" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%-d-%b-%y') AS refdate,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(day(o_orderdate) AS INT) AS dom
        |FROM orders ORDER BY 1""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderdate < TIMESTAMP '1998-01-01' AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
