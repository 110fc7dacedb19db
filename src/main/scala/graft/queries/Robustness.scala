package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.Fns._

/** Error-safe scalars, explicit null ordering, pagination, and
  * fixed-width bucketing — the "unglamorous" relational surface that
  * real migrations trip over (the reference leans on R's silent
  * NA-propagating arithmetic, e.g. gpd_etl_pipeline.R's growth-rate
  * divisions; `try_divide`/`try_cast` are the engine-side analog with
  * explicit NULL-on-error semantics).
  *
  * Scale notes:
  *   - try_* functions are codegen'd row-local expressions — no UDF,
  *     no fallback out of whole-stage codegen;
  *   - the histogram buckets map-side into a handful of groups (the
  *     classic 100 TB profile query: one scan, 20-row result);
  *   - ORDER BY ... LIMIT/OFFSET plans a TakeOrderedAndProject-style
  *     top-(offset+limit) — executors keep (offset+limit)-row heaps,
  *     only those rows reach the driver, never the full sort;
  *   - the NULLS FIRST/LAST ranks use a single global Window only
  *     because the result is the per-row rank itself (1.5k dim rows);
  *     at scale the same orderings appear as sort keys, which range-
  *     partition instead.
  */
object Robustness {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "json_corrupt_records" -> ((s, d) => {
      // PERMISSIVE-mode ingestion of dirty JSON — the real-world
      // at-scale contract: malformed rows must neither kill the job
      // (FAILFAST) nor vanish silently (DROPMALFORMED); they surface
      // in a corrupt-record column for quarantine. Corruption is
      // INJECTED deterministically (event_id % 7 → a doubled brace
      // makes the row unparseable) so the oracle can mirror it with
      // json_valid. Parse is from_json with an explicit schema —
      // once per row, codegen'd, map-side.
      val ev = graft.Tables.events(s, d)
        .withColumn("raw",
          when(col("event_id") % 7 === 0, concat(lit("{"), col("props")))
            .otherwise(col("props")))
      val schema = org.apache.spark.sql.types.StructType
        .fromDDL("k INT, _corrupt_record STRING")
      ev.select(col("event_type"), col("raw"),
          from_json(col("raw"), schema,
            Map("mode" -> "PERMISSIVE",
                "columnNameOfCorruptRecord" -> "_corrupt_record")).as("p"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("p.k")).as("n_parsed"),
          count(col("p._corrupt_record")).as("n_corrupt"),
          sum(col("p.k")).as("sum_k"),
          // quarantine checksum: corrupt payloads survive verbatim
          md5(concat_ws("|", array_sort(collect_list(
            col("p._corrupt_record"))))).as("quarantine_md5"))
        .orderBy("event_type")
    }),
    "try_arith" -> ((s, d) => {
      // NULL-on-error arithmetic: division by a data-dependent zero
      // and an unparseable cast, both yielding NULL instead of a
      // runtime error — per-row robust, fully codegen'd. The int
      // parse is the native exception-free graft_try_int, result-
      // identical to try_cast(... AS INT) (fuzz-pinned,
      // NativeExpressionsSpec): every l_returnflag fails to parse,
      // and TRY-mode cast reaches each null through a thrown-and-
      // caught exception — the r17 census measured that single
      // column at 10.2 s of this row's 9.4 s sf0.1 wall (~15 µs/row
      // of stack-trace fill); the native parse runs at sort cost.
      graft.functions.expressions.TryParseInt.register(s)
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          try_divide(col("l_extendedprice"), col("l_quantity") - lit(25.0))
            .as("ratio_to_qty25"),
          expr("graft_try_int(l_returnflag)").as("flag_int"),
          expr("try_cast(l_linenumber AS STRING)").as("line_str"))
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "sort_nulls_ordering" -> ((s, d) => {
      // Explicit NULLS FIRST / NULLS LAST: engines disagree on default
      // null placement, so portable sorts must pin it. Each rank is a
      // distributed total-order pass (TotalOrder.withRowNumber — the
      // frame is the raw customer table, so a partition-less
      // row_number window would single-reducer it at scale), joined
      // back on the unique key; the rank column makes placement
      // observable to the oracle hash.
      import graft.operators.TotalOrder
      val c = t(s, d, "customer")
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal"))
            .as("val"))
        .localCheckpoint() // feeds two independent total-order rankings
      def rank(ord: Seq[org.apache.spark.sql.Column], out: String) =
        TotalOrder.withRowNumber(c, ord, out)
          .select(col("c_custkey"), col(out).cast("int").as(out))
      c.join(rank(Seq(col("val").asc_nulls_first, col("c_custkey")),
               "rn_nulls_first"), "c_custkey")
        .join(rank(Seq(col("val").desc_nulls_last, col("c_custkey").desc),
               "rn_nulls_last"), "c_custkey")
        .select(col("c_custkey"), col("val"),
               col("rn_nulls_first"), col("rn_nulls_last"))
        .orderBy("c_custkey")
    }),
    "limit_offset_page" -> ((s, d) =>
      // Pagination: ORDER BY ... OFFSET 40 LIMIT 20 (rows 41-60 of the
      // price leaderboard). Total tiebreak on o_orderkey keeps the
      // page deterministic; executors only ever hold offset+limit rows.
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(40).limit(20)),
    "scalar_string_funcs2" -> ((s, d) =>
      // second string-surface sweep: field splitting, character
      // mapping, affix slicing — all codegen'd row-local expressions
      // (no UDF), evaluated in one projection over the scan.
      t(s, d, "part")
        .select(col("p_partkey"),
          expr("split_part(p_name, ' ', 2)").as("noun"),
          expr("split_part(p_brand, '#', 2)").as("brand_num"),
          translate(col("p_type"), "AEO", "aeo").as("type_tr"),
          reverse(col("p_name")).as("name_rev"),
          expr("repeat(p_brand, 2)").as("brand2"),
          expr("position(' ' IN p_name)").cast("int").as("space_pos"),
          expr("left(p_name, 3)").as("l3"),
          expr("right(p_name, 3)").as("r3"))
        .orderBy("p_partkey")),
    "histogram_fixed_width" -> ((s, d) =>
      // Fixed-width histogram of order totals: 20 × 30k buckets with a
      // clamped overflow bucket. bucket = least(floor(p/30000), 19) is
      // a pure map-side expression — one scan, one 20-row shuffle.
      t(s, d, "orders")
        .select(least(floor(col("o_totalprice") / lit(30000.0)), lit(19.0))
                  .cast("int").as("bucket"),
                col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"),
             dbl(min(col("o_totalprice"))).as("min_price"),
             dbl(max(col("o_totalprice"))).as("max_price"),
             moneySum(col("o_totalprice")).as("sum_price"))
        .orderBy("bucket"))
  )

  val oracles: Map[String, String] = Map(
    "json_corrupt_records" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 7 = 0 THEN '{' || props ELSE props END AS raw
        |  FROM events),
        |p AS (SELECT event_type, raw,
        |        CASE WHEN json_valid(raw)
        |             THEN CAST(json_extract_string(raw, '$.k') AS INT) END AS k,
        |        CASE WHEN NOT json_valid(raw) THEN raw END AS corrupt
        |      FROM ev)
        |SELECT event_type, count(*) AS n_rows,
        |  count(k) AS n_parsed, count(corrupt) AS n_corrupt,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  md5(array_to_string(list_sort(COALESCE(list(corrupt)
        |        FILTER (corrupt IS NOT NULL), [])), '|')) AS quarantine_md5
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "try_arith" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice / nullif(l_quantity - 25.0, 0.0) AS ratio_to_qty25,
        |  TRY_CAST(l_returnflag AS INT) AS flag_int,
        |  CAST(l_linenumber AS VARCHAR) AS line_str
        |FROM lineitem ORDER BY 1, 2""".stripMargin,
    "sort_nulls_ordering" ->
      """WITH c AS (SELECT c_custkey,
        |    CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS val
        |  FROM customer)
        |SELECT c_custkey, val,
        |  CAST(row_number() OVER (ORDER BY val ASC NULLS FIRST, c_custkey)
        |    AS INT) AS rn_nulls_first,
        |  CAST(row_number() OVER (ORDER BY val DESC NULLS LAST,
        |    c_custkey DESC) AS INT) AS rn_nulls_last
        |FROM c ORDER BY 1""".stripMargin,
    "limit_offset_page" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20 OFFSET 40""".stripMargin,
    "scalar_string_funcs2" ->
      """SELECT p_partkey,
        |  split_part(p_name, ' ', 2) AS noun,
        |  split_part(p_brand, '#', 2) AS brand_num,
        |  translate(p_type, 'AEO', 'aeo') AS type_tr,
        |  reverse(p_name) AS name_rev,
        |  repeat(p_brand, 2) AS brand2,
        |  CAST(position(' ' IN p_name) AS INT) AS space_pos,
        |  left(p_name, 3) AS l3,
        |  right(p_name, 3) AS r3
        |FROM part ORDER BY 1""".stripMargin,
    "histogram_fixed_width" ->
      """SELECT CAST(least(floor(o_totalprice / 30000.0), 19.0) AS INT)
        |    AS bucket,
        |  count(*) AS cnt,
        |  min(o_totalprice) AS min_price,
        |  max(o_totalprice) AS max_price,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS sum_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
