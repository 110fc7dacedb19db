package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables.t

/** SQL subquery surface: correlated EXISTS, scalar subqueries, and
  * IN / NOT IN subqueries — the query shapes an analyst reaching for
  * raw SQL uses constantly (the reference's validation chapters do the
  * same membership/anti-membership checks with dplyr's
  * `semi_join`/`anti_join`, e.g. `gdp_compare_with_old_data.R:38-44`).
  *
  * Scale notes (why these are safe at 100 TB):
  *   - correlated EXISTS de-correlates to a LEFT SEMI join on the
  *     correlation key — one shuffle on `l_orderkey`, no fan-out, no
  *     per-row re-execution of the inner query;
  *   - IN (subquery) likewise becomes LEFT SEMI against the (already
  *     aggregated, hence tiny) subquery result;
  *   - NOT IN becomes a null-aware LEFT ANTI join — Spark plans a
  *     broadcast null-aware anti join when the subquery side is small;
  *   - scalar subqueries evaluate ONCE (one tiny job), then fold into
  *     every partition as a literal — the 100 TB side is scanned a
  *     single time with the comparison fully pushable.
  *
  * Decimal casts on every aggregate keep the comparisons exact and
  * engine-portable (README "Correctness strategy" rules).
  */
object Subqueries {
  type Q = (SparkSession, String) => DataFrame

  private def views(s: SparkSession, d: String, pfx: String): Unit = {
    t(s, d, "orders").createOrReplaceTempView(s"${pfx}_orders")
    t(s, d, "lineitem").createOrReplaceTempView(s"${pfx}_lineitem")
    t(s, d, "part").createOrReplaceTempView(s"${pfx}_part")
    t(s, d, "customer").createOrReplaceTempView(s"${pfx}_customer")
  }

  val queries: Map[String, Q] = Map(
    "sql_exists_correlated" -> ((s, d) => {
      // TPC-H Q4 shape: priority census of orders with at least one
      // late-shipping line. The correlated EXISTS de-correlates into a
      // semi join on l_orderkey with the l_shipdate > o_orderdate
      // residual — lineitem is never fanned out into the aggregate.
      views(s, d, "sq1")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n_orders
          |FROM sq1_orders
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
          |  AND EXISTS (SELECT 1 FROM sq1_lineitem
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    }),
    "sql_scalar_subquery" -> ((s, d) => {
      // parts priced above the global mean. The mean is a scalar
      // subquery: one 3-row job, folded into the scan as a literal.
      // price*count > sum keeps the comparison in EXACT decimal
      // arithmetic (avg() result types differ across engines).
      views(s, d, "sq2")
      s.sql(
        """SELECT p_brand, count(*) AS n_above,
          |       CAST(sum(CAST(p_retailprice AS DECIMAL(14,4))) AS DOUBLE)
          |         AS sum_price
          |FROM sq2_part
          |WHERE CAST(p_retailprice AS DECIMAL(18,6))
          |        * (SELECT count(*) FROM sq2_part)
          |      > (SELECT sum(CAST(p_retailprice AS DECIMAL(18,6)))
          |         FROM sq2_part)
          |GROUP BY p_brand
          |ORDER BY p_brand""".stripMargin)
    }),
    "sql_in_subquery" -> ((s, d) => {
      // TPC-H Q18 shape: orders whose total line quantity exceeds a
      // threshold. The subquery aggregates FIRST (map-side partials on
      // the natural l_orderkey shuffle), so the semi join probes a
      // pre-shrunk set instead of raw lineitem.
      views(s, d, "sq3")
      // The broadcast of the HAVING-qualifying orderkey set is
      // CORRECT here despite its aggregate-derived estimate — but for
      // a different reason than this comment used to claim. The r16
      // bcast census (WORKCOUNTS.json) measured the qualifying set at
      // 275,687 rows / 20 MB at sf1: a ~27% FRACTION of orders, so it
      // grows ∝ data, not "~60 keys/SF". The plan is still safe
      // because the agg's row estimate grows with its input: by sf10
      // the build exceeds the 64m broadcast threshold and the planner
      // flips this join to a shuffle on its own (measured — zero
      // broadcast builds at sf10). r14 tried forcing that flip at
      // every SF with a MERGE guard and MEASURED the cost: q18's sf10
      // cell went 2.7 s → 51.5 s (19×) — reverted; WorkCountSpec's
      // bcast gate now asserts the sf1 build stays inside the
      // threshold band instead.
      s.sql(
        """SELECT o_orderkey, o_orderpriority, o_totalprice
          |FROM sq3_orders
          |WHERE o_orderkey IN
          |      (SELECT l_orderkey FROM sq3_lineitem
          |       GROUP BY l_orderkey
          |       HAVING sum(CAST(l_quantity AS DECIMAL(14,4))) > 150)
          |ORDER BY o_orderkey""".stripMargin)
    }),
    "sql_not_in_subquery" -> ((s, d) => {
      // NOT IN with its null-aware semantics: customers with no
      // negative-balance sibling in their market segment's low-balance
      // list. Spark plans a (broadcast) null-aware anti join — the
      // fact side streams, the subquery side is the small build.
      views(s, d, "sq4")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n_orders,
          |       CAST(sum(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE)
          |         AS sum_price
          |FROM sq4_orders
          |WHERE o_custkey NOT IN
          |      (SELECT c_custkey FROM sq4_customer WHERE c_acctbal < 0)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    }),
    "sql_correlated_scalar_min" -> ((s, d) => {
      // TPC-H Q2 shape: rows matching a correlated per-group minimum.
      // Catalyst de-correlates the scalar subquery into a grouped min
      // + equi-join on the correlation key — the inner query runs
      // once as an aggregate, not per outer row. Equality on the min
      // is an exact stored-value pick (no arithmetic), so doubles
      // compare portably.
      views(s, d, "sq7")
      s.sql(
        """SELECT c.c_nationkey, c.c_name, c.c_acctbal
          |FROM sq7_customer c
          |WHERE c.c_acctbal = (SELECT min(c2.c_acctbal)
          |                     FROM sq7_customer c2
          |                     WHERE c2.c_nationkey = c.c_nationkey)
          |ORDER BY c.c_nationkey, c.c_name""".stripMargin)
    }),
    "sql_recursive_cte" -> ((s, d) => {
      // WITH RECURSIVE through spark.sql (Spark 4 UnionLoop): a
      // 30-level recursive date spine left-joined to daily click
      // counts — the recursive analog of gap_fill_days. The spine is
      // driver-tiny (one row per iteration); the event side aggregates
      // map-side before the broadcast-able join, so recursion depth,
      // not data volume, bounds the loop.
      graft.Tables.events(s, d).createOrReplaceTempView("sq6_events")
      s.sql(
        """WITH RECURSIVE spine AS (
          |  SELECT DATE '2024-01-01' AS d
          |  UNION ALL
          |  SELECT date_add(d, 1) FROM spine WHERE d < DATE '2024-01-30'
          |),
          |clicks AS (SELECT CAST(ts AS DATE) AS d, count(*) AS cnt
          |           FROM sq6_events WHERE event_type = 'click'
          |           GROUP BY CAST(ts AS DATE))
          |SELECT s.d, coalesce(c.cnt, 0) AS cnt
          |FROM spine s LEFT JOIN clicks c ON s.d = c.d
          |ORDER BY s.d""".stripMargin)
    }),
    "sql_lateral_topn" -> ((s, d) => {
      // correlated LATERAL subquery with ORDER BY + LIMIT: per-region
      // top-2 customers by balance through their nations. Catalyst
      // de-correlates the limit into a partitioned row_number — the
      // per-group-top-k plan — instead of re-running the inner query
      // per outer row.
      views(s, d, "sq5")
      t(s, d, "nation").createOrReplaceTempView("sq5_nation")
      t(s, d, "region").createOrReplaceTempView("sq5_region")
      s.sql(
        """SELECT r.r_name, t.c_name, t.c_acctbal
          |FROM sq5_region r,
          |LATERAL (SELECT c.c_name, c.c_acctbal
          |         FROM sq5_customer c JOIN sq5_nation n
          |           ON c.c_nationkey = n.n_nationkey
          |         WHERE n.n_regionkey = r.r_regionkey
          |         ORDER BY c.c_acctbal DESC, c.c_name
          |         LIMIT 2) t
          |ORDER BY r.r_name, t.c_acctbal DESC, t.c_name""".stripMargin)
    })
  )

  val oracles: Map[String, String] = Map(
    "sql_exists_correlated" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "sql_scalar_subquery" ->
      """SELECT p_brand, count(*) AS n_above,
        |       CAST(sum(CAST(p_retailprice AS DECIMAL(14,4))) AS DOUBLE)
        |         AS sum_price
        |FROM part
        |WHERE CAST(p_retailprice AS DECIMAL(18,6))
        |        * (SELECT count(*) FROM part)
        |      > (SELECT sum(CAST(p_retailprice AS DECIMAL(18,6))) FROM part)
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,
    "sql_in_subquery" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM orders
        |WHERE o_orderkey IN
        |      (SELECT l_orderkey FROM lineitem
        |       GROUP BY l_orderkey
        |       HAVING sum(CAST(l_quantity AS DECIMAL(14,4))) > 150)
        |ORDER BY o_orderkey""".stripMargin,
    "sql_not_in_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(14,4))) AS DOUBLE)
        |         AS sum_price
        |FROM orders
        |WHERE o_custkey NOT IN
        |      (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "sql_correlated_scalar_min" ->
      """SELECT c.c_nationkey, c.c_name, c.c_acctbal
        |FROM customer c
        |WHERE c.c_acctbal = (SELECT min(c2.c_acctbal)
        |                     FROM customer c2
        |                     WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c.c_nationkey, c.c_name""".stripMargin,
    "sql_recursive_cte" ->
      """WITH RECURSIVE spine AS (
        |  SELECT DATE '2024-01-01' AS d
        |  UNION ALL
        |  SELECT d + 1 FROM spine WHERE d < DATE '2024-01-30'
        |),
        |ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |clicks AS (SELECT CAST(ts AS DATE) AS d, count(*) AS cnt
        |           FROM ev WHERE event_type = 'click'
        |           GROUP BY CAST(ts AS DATE))
        |SELECT s.d, coalesce(c.cnt, 0) AS cnt
        |FROM spine s LEFT JOIN clicks c ON s.d = c.d
        |ORDER BY s.d""".stripMargin,
    "sql_lateral_topn" ->
      """SELECT r.r_name, t.c_name, t.c_acctbal
        |FROM region r,
        |LATERAL (SELECT c.c_name, c.c_acctbal
        |         FROM customer c JOIN nation n
        |           ON c.c_nationkey = n.n_nationkey
        |         WHERE n.n_regionkey = r.r_regionkey
        |         ORDER BY c.c_acctbal DESC, c.c_name
        |         LIMIT 2) t
        |ORDER BY r.r_name, t.c_acctbal DESC, t.c_name""".stripMargin
  )
}
