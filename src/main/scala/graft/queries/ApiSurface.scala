package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Row for the typed-Dataset query — top-level so the case-class
  * Encoder derives. */
final case class CustomerBal(c_custkey: Long, c_mktsegment: String,
                             c_acctbal: Double)

/** The two remaining API entry points a reference user would reach
  * for beyond the Column DSL: raw SQL text (`spark.sql` over temp
  * views) and the typed `Dataset[T]` API (case-class Encoders,
  * groupByKey/mapGroups).
  *
  * Scale note on the typed path: lambdas are opaque to Catalyst — the
  * typed filter below does NOT push to the parquet scan and mapGroups
  * breaks whole-stage codegen. That's the documented trade: type
  * safety at the cost of optimizer visibility. Keep hot 100 TB paths
  * in the Column DSL; the typed API is for complex per-group logic
  * where correctness beats scan pruning.
  */
object ApiSurface {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "sql_tpch_q6" -> ((s, d) => {
      // SQL text entry: TPC-H Q6 (forecast revenue change) verbatim
      // through the parser — same Catalyst plan as the DSL form, same
      // pushed filters (predicates reach the parquet scan).
      t(s, d, "lineitem").createOrReplaceTempView("graft_lineitem_q6")
      s.sql(
        """SELECT CAST(sum(CAST(l_extendedprice * l_discount
          |                     AS DECIMAL(14,4))) AS DOUBLE) AS revenue
          |FROM graft_lineitem_q6
          |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          |  AND l_discount BETWEEN 0.05 AND 0.07
          |  AND l_quantity < 24""".stripMargin)
    }),
    "sql_tpch_q7" -> ((s, d) => {
      // TPC-H Q7 (volume shipping between two nations): 6-way join
      // with a disjunctive nation-pair predicate and a per-year
      // decimal revenue rollup. nation joins twice under different
      // aliases (supplier side / customer side) — both broadcast; the
      // pair predicate prunes after the two key joins; year() is
      // engine-identical on timestamps. Revenue is an exact decimal
      // sum cast once to double.
      t(s, d, "supplier").createOrReplaceTempView("q7_supplier")
      t(s, d, "lineitem").createOrReplaceTempView("q7_lineitem")
      t(s, d, "orders").createOrReplaceTempView("q7_orders")
      t(s, d, "customer").createOrReplaceTempView("q7_customer")
      t(s, d, "nation").createOrReplaceTempView("q7_nation")
      s.sql(
        """SELECT supp_nation, cust_nation, l_year,
          |  CAST(sum(volume) AS DOUBLE) AS revenue
          |FROM (
          |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
          |    CAST(l_extendedprice AS DECIMAL(12,2))
          |      * CAST(1.0 - l_discount AS DECIMAL(4,2)) AS volume
          |  FROM q7_supplier, q7_lineitem, q7_orders, q7_customer,
          |       q7_nation n1, q7_nation n2
          |  WHERE s_suppkey = l_suppkey
          |    AND o_orderkey = l_orderkey
          |    AND c_custkey = o_custkey
          |    AND s_nationkey = n1.n_nationkey
          |    AND c_nationkey = n2.n_nationkey
          |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
          |) shipping
          |GROUP BY supp_nation, cust_nation, l_year
          |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
    }),
    "sql_tpch_q8" -> ((s, d) => {
      // TPC-H Q8 (national market share): the deepest join tree in the
      // suite — 8 relations, nation twice (customer-region gate vs
      // supplier-nation attribution), two scan-pruned filters (region
      // name, part type) that Catalyst pushes before any join, and a
      // conditional-share aggregate per year. Numerator and
      // denominator are the SAME exact decimal sum expression, so the
      // double division is engine-identical.
      t(s, d, "part").createOrReplaceTempView("q8_part")
      t(s, d, "supplier").createOrReplaceTempView("q8_supplier")
      t(s, d, "lineitem").createOrReplaceTempView("q8_lineitem")
      t(s, d, "orders").createOrReplaceTempView("q8_orders")
      t(s, d, "customer").createOrReplaceTempView("q8_customer")
      t(s, d, "nation").createOrReplaceTempView("q8_nation")
      t(s, d, "region").createOrReplaceTempView("q8_region")
      s.sql(
        """SELECT o_year,
          |  CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
          |           ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
          |    / CAST(sum(volume) AS DOUBLE) AS mkt_share
          |FROM (
          |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
          |    CAST(l_extendedprice AS DECIMAL(12,2))
          |      * CAST(1.0 - l_discount AS DECIMAL(4,2)) AS volume,
          |    n2.n_name AS nation
          |  FROM q8_part, q8_supplier, q8_lineitem, q8_orders,
          |       q8_customer, q8_nation n1, q8_nation n2, q8_region
          |  WHERE p_partkey = l_partkey
          |    AND s_suppkey = l_suppkey
          |    AND l_orderkey = o_orderkey
          |    AND o_custkey = c_custkey
          |    AND c_nationkey = n1.n_nationkey
          |    AND n1.n_regionkey = r_regionkey
          |    AND r_name = 'AMERICA'
          |    AND s_nationkey = n2.n_nationkey
          |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
          |    AND p_type = 'ECONOMY'
          |) all_nations
          |GROUP BY o_year
          |ORDER BY o_year""".stripMargin)
    }),
    "sql_tpch_q18" -> ((s, d) => {
      // TPC-H Q18 (large-volume customers): HAVING-filtered IN
      // subquery over the fact table itself + 3-way join + top-100.
      // The subquery and outer aggregate share the lineitem scan's
      // partitioning on l_orderkey (one shuffle feeds both); decimal
      // quantity sums keep the HAVING threshold and output exact.
      // o_orderkey breaks sort ties totally under the LIMIT.
      t(s, d, "customer").createOrReplaceTempView("q18_customer")
      t(s, d, "orders").createOrReplaceTempView("q18_orders")
      t(s, d, "lineitem").createOrReplaceTempView("q18_lineitem")
      s.sql(
        """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
          |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
          |FROM q18_customer, q18_orders, q18_lineitem
          |WHERE o_orderkey IN (
          |    SELECT l_orderkey FROM q18_lineitem
          |    GROUP BY l_orderkey
          |    HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300)
          |  AND c_custkey = o_custkey
          |  AND o_orderkey = l_orderkey
          |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
          |ORDER BY o_totalprice DESC, o_orderkey
          |LIMIT 100""".stripMargin)
    }),
    "sql_tpch_q10" -> ((s, d) => {
      // TPC-H Q10 (returned-item reporting): 4-way join + decimal
      // revenue aggregate + top-20. The date window prunes orders at
      // the scan; customer/nation broadcast; the double sort key is
      // safe because both engines derive it from the SAME exact
      // decimal sum, and c_custkey breaks ties totally.
      t(s, d, "customer").createOrReplaceTempView("q10_customer")
      t(s, d, "orders").createOrReplaceTempView("q10_orders")
      t(s, d, "lineitem").createOrReplaceTempView("q10_lineitem")
      t(s, d, "nation").createOrReplaceTempView("q10_nation")
      s.sql(
        """SELECT c_custkey, c_name,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
          |           * CAST(1.0 - l_discount AS DECIMAL(4,2)))
          |    AS DOUBLE) AS revenue,
          |  n_name
          |FROM q10_customer, q10_orders, q10_lineitem, q10_nation
          |WHERE c_custkey = o_custkey
          |  AND l_orderkey = o_orderkey
          |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
          |  AND l_returnflag = 'R'
          |  AND c_nationkey = n_nationkey
          |GROUP BY c_custkey, c_name, n_name
          |ORDER BY revenue DESC, c_custkey
          |LIMIT 20""".stripMargin)
    }),
    "sql_tpch_q14" -> ((s, d) => {
      // TPC-H Q14 (promotion effect): conditional share of revenue in
      // one month. Both sums accumulate in exact decimal on one scan;
      // the percentage is computed from the SAME exact operands in
      // both engines (two casts, one divide, one multiply — fixed
      // order), so the double compares bit-for-bit.
      t(s, d, "lineitem").createOrReplaceTempView("q14_lineitem")
      t(s, d, "part").createOrReplaceTempView("q14_part")
      s.sql(
        """SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'ECONOMY'
          |    THEN CAST(l_extendedprice AS DECIMAL(12,2))
          |         * CAST(1.0 - l_discount AS DECIMAL(4,2))
          |    ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
          |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
          |             * CAST(1.0 - l_discount AS DECIMAL(4,2)))
          |         AS DOUBLE) AS promo_revenue_pct
          |FROM q14_lineitem JOIN q14_part ON l_partkey = p_partkey
          |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
          |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin)
    }),
    "sql_pivot_syntax" -> ((s, d) => {
      // SQL PIVOT clause through the parser (the R4 dynamic-pivot's
      // SQL-text twin): status → columns with an exact decimal
      // revenue aggregate. Catalyst rewrites PIVOT into one
      // conditional aggregate pass — the same plan the CASE-expression
      // oracle describes, which is the point: syntax sugar, identical
      // execution. Every (priority, status) combo is populated in
      // this data, so no null-vs-zero asymmetry.
      t(s, d, "orders").createOrReplaceTempView("pv_orders")
      s.sql(
        """SELECT o_orderpriority, f AS rev_f, o AS rev_o, p AS rev_p
          |FROM (SELECT o_orderpriority, o_orderstatus,
          |        CAST(o_totalprice AS DECIMAL(12,2)) AS tp
          |      FROM pv_orders)
          |PIVOT (CAST(sum(tp) AS DOUBLE)
          |       FOR o_orderstatus IN ('F' AS f, 'O' AS o, 'P' AS p))
          |ORDER BY o_orderpriority""".stripMargin)
    }),
    "sql_disjunctive_pushdown" -> ((s, d) => {
      // TPC-H Q19 shape: an OR of conjunct groups. Catalyst pushes the
      // common p_partkey join AND extracts the disjunction's shared
      // predicates toward the scans; the whole filter stays codegen'd
      // — no per-branch passes over the data.
      t(s, d, "lineitem").createOrReplaceTempView("q19_lineitem")
      t(s, d, "part").createOrReplaceTempView("q19_part")
      s.sql(
        """SELECT count(*) AS n_lines,
          |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
          |           * CAST(1.0 - l_discount AS DECIMAL(4,2)))
          |       AS DOUBLE) AS revenue
          |FROM q19_lineitem JOIN q19_part ON p_partkey = l_partkey
          |WHERE (p_type = 'ECONOMY' AND p_size BETWEEN 1 AND 15
          |       AND l_quantity >= 10)
          |   OR (p_type = 'STANDARD' AND p_size BETWEEN 10 AND 30
          |       AND l_quantity < 10)
          |   OR (p_type = 'SMALL' AND p_size >= 40
          |       AND l_discount > 0.05)""".stripMargin)
    }),
    "sql_group_by_all" -> ((s, d) => {
      // GROUP BY ALL (modern SQL ergonomics, Spark 3.4+/DuckDB): the
      // grouping keys are inferred as every non-aggregate select item.
      t(s, d, "orders").createOrReplaceTempView("gba_orders")
      s.sql(
        """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
          |FROM gba_orders
          |GROUP BY ALL
          |ORDER BY o_orderpriority, o_orderstatus""".stripMargin)
    }),
    "typed_dataset_agg" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        .as[CustomerBal]
        .filter(_.c_acctbal > 0.0)
        .groupByKey(_.c_mktsegment)
        .mapGroups { (seg, rows) =>
          var n = 0L
          var mx = Double.MinValue
          rows.foreach { r => n += 1; mx = math.max(mx, r.c_acctbal) }
          (seg, n, mx)
        }
        .toDF("c_mktsegment", "n_pos", "max_bal")
        .orderBy("c_mktsegment")
    })
  )

  val oracles: Map[String, String] = Map(
    "sql_tpch_q14" ->
      """SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'ECONOMY'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2))
        |         * CAST(1.0 - l_discount AS DECIMAL(4,2))
        |    ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
        |  / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |             * CAST(1.0 - l_discount AS DECIMAL(4,2)))
        |         AS DOUBLE) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'""".stripMargin,
    "sql_pivot_syntax" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F'
        |           THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
        |       AS DOUBLE) AS rev_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O'
        |           THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
        |       AS DOUBLE) AS rev_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P'
        |           THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
        |       AS DOUBLE) AS rev_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "sql_disjunctive_pushdown" ->
      """SELECT count(*) AS n_lines,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * CAST(1.0 - l_discount AS DECIMAL(4,2)))
        |       AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_type = 'ECONOMY' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity >= 10)
        |   OR (p_type = 'STANDARD' AND p_size BETWEEN 10 AND 30
        |       AND l_quantity < 10)
        |   OR (p_type = 'SMALL' AND p_size >= 40
        |       AND l_discount > 0.05)""".stripMargin,
    "sql_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(sum(volume) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l_shipdate) AS l_year,
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * CAST(1.0 - l_discount AS DECIMAL(4,2)) AS volume
        |  FROM supplier, lineitem, orders, customer,
        |       nation n1, nation n2
        |  WHERE s_suppkey = l_suppkey
        |    AND o_orderkey = l_orderkey
        |    AND c_custkey = o_custkey
        |    AND s_nationkey = n1.n_nationkey
        |    AND c_nationkey = n2.n_nationkey
        |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "sql_tpch_q8" ->
      """SELECT o_year,
        |  CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
        |           ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
        |    / CAST(sum(volume) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice AS DECIMAL(12,2))
        |      * CAST(1.0 - l_discount AS DECIMAL(4,2)) AS volume,
        |    n2.n_name AS nation
        |  FROM part, supplier, lineitem, orders, customer,
        |       nation n1, nation n2, region
        |  WHERE p_partkey = l_partkey
        |    AND s_suppkey = l_suppkey
        |    AND l_orderkey = o_orderkey
        |    AND o_custkey = c_custkey
        |    AND c_nationkey = n1.n_nationkey
        |    AND n1.n_regionkey = r_regionkey
        |    AND r_name = 'AMERICA'
        |    AND s_nationkey = n2.n_nationkey
        |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
        |    AND p_type = 'ECONOMY'
        |) all_nations
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
    "sql_tpch_q18" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey
        |    HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 300)
        |  AND c_custkey = o_custkey
        |  AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "sql_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * CAST(1.0 - l_discount AS DECIMAL(4,2)))
        |    AS DOUBLE) AS revenue,
        |  n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  AND l_returnflag = 'R'
        |  AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,
    "sql_tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount
        |                     AS DECIMAL(14,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "sql_group_by_all" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
        |FROM orders
        |GROUP BY ALL
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,
    "typed_dataset_agg" ->
      """SELECT c_mktsegment, count(*) AS n_pos, max(c_acctbal) AS max_bal
        |FROM customer WHERE c_acctbal > 0.0
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
