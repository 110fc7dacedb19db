package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.TextFns.hash60

/** Write-path roundtrip queries — the read-back oracle upgrade for the
  * layout/operational rows that previously carried only plan-shape or
  * behavior specs (S10 bucketed tables, S11 partitioned writes, S13
  * compaction, S14 Z-order, S16 ORC, S21 dynamic partition overwrite,
  * S23 corrupt-file tolerance).
  *
  * Shape of every query here: write a physical layout WITH THE ENGINE,
  * read it back, and reduce the read-back content with
  * order-insensitive aggregates (counts, exact decimal sums, XOR'd
  * md5-derived row hashes). The DuckDB oracle computes the same
  * aggregate from the SOURCE parquet — so a green row proves the whole
  * write → layout → read path is lossless and exact cross-engine,
  * which no plan assertion can.
  *
  * Concurrency/idempotence contract (Verify runs queries in parallel
  * on one session; bench loops re-invoke): every invocation writes to
  * a fresh temp dir (bucketed tables go through
  * Layout.createTableOnce's pay-once guard instead), options that
  * change write/read semantics ride per-operation options — never
  * session conf — and every aggregate is invariant to file count and
  * row order, so layout mechanics cannot leak into the result.
  */
object LayoutOps {
  type Q = (SparkSession, String) => DataFrame

  // fresh dir per invocation (parallel Verify + bench reruns never
  // collide), deleted on JVM exit via Scratch — bare
  // createTempDirectory leaked one staged-table copy per run
  private def tmp(prefix: String): String =
    graft.Scratch.tempDir(prefix).toString

  /** documents content fingerprint per source — count + order-
    * invariant XOR of per-row 60-bit md5 hashes over (id | text).
    */
  private def docChecksum(df: DataFrame): DataFrame =
    df.select(col("source"),
        hash60(concat(col("doc_id").cast("string"), lit("|"),
          col("text"))).as("h"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("content_xor"))
      .orderBy("source")

  private val docChecksumSql =
    """WITH h AS (
      |  SELECT source,
      |    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
      |      '|', text)), 1, 15)) AS BIGINT) AS h
      |  FROM documents)
      |SELECT source, count(*) AS n_rows,
      |  CAST(bit_xor(h) AS BIGINT) AS content_xor
      |FROM h GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "layout_bucketed_readback" -> ((s, d) => {
      // S10: orders written as a bucketBy(8, o_custkey) + sortBy
      // managed table (the exchange-free-join layout), then read BACK
      // from the bucketed files and aggregated. Create-once semantics
      // and applicationId-tagged names follow bucketed_join_colocated.
      val tag = (d + "_" + s.sparkContext.applicationId)
        .replaceAll("[^a-zA-Z0-9]", "_")
      val tn = s"graft_bkt_rb_orders_$tag"
      graft.sources.Layout.createTableOnce(s, tn) {
        s.sql(s"DROP TABLE IF EXISTS $tn")
        graft.sources.Layout.writeBucketed(
          t(s, d, "orders").select(col("o_custkey"),
            col("o_orderpriority"), col("o_totalprice"))
            .repartition(8, col("o_custkey")),
          tn, "o_custkey", 8)
      }
      s.table(tn)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(12,2)"))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    }),
    "layout_partitioned_readback" -> ((s, d) => {
      // S11: orders partitioned on disk by order month (directory per
      // month), read back THROUGH a partition filter — the listing-
      // time pruning path — and aggregated. The month column round-
      // trips through directory names (partition value inference).
      val path = tmp("graft_part_rb")
      graft.sources.Layout.writePartitioned(
        t(s, d, "orders").withColumn("o_month", month(col("o_orderdate"))),
        path, "o_month")
      s.read.parquet(path)
        .where(col("o_month") === 3)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(12,2)"))
            .cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    }),
    "layout_compact_readback" -> ((s, d) => {
      // S13: the documents corpus deliberately shattered into 64 tiny
      // files, compacted back to byte-targeted files, and
      // content-checksummed — compaction must move bytes, not change
      // one of them.
      val mess = tmp("graft_compact_in")
      val out = tmp("graft_compact_out")
      t(s, d, "documents").repartition(64).write
        .mode("overwrite").parquet(mess)
      graft.sources.Layout.compact(s, mess, out,
        targetBytes = 8L * 1024 * 1024)
      docChecksum(s.read.parquet(out))
    }),
    "layout_zorder_readback" -> ((s, d) => {
      // S14: part written in Z-order on (p_size, name length) — the
      // multi-dim skipping layout — then read back and checksummed
      // per brand. Z-ordering is a pure row REORDERING; the content
      // fingerprint must not notice it.
      val path = tmp("graft_zorder_rb")
      graft.sources.Layout.writeZOrdered(
        t(s, d, "part").withColumn("p_name_len", length(col("p_name"))),
        path, "p_size", "p_name_len", numFiles = 8)
      s.read.parquet(path)
        .select(col("p_brand"),
          hash60(concat(col("p_partkey").cast("string"), lit("|"),
            col("p_name"))).as("h"),
          col("p_retailprice"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("cnt"),
          expr("bit_xor(h)").as("content_xor"),
          sum(col("p_retailprice").cast("decimal(12,2)"))
            .cast("double").as("retail"))
        .orderBy("p_brand")
    }),
    "orc_roundtrip_agg" -> ((s, d) => {
      // S16: customer written as ORC (the second columnar format),
      // read back from ORC, aggregated. DuckDB never sees the ORC —
      // its aggregate comes from the source parquet, so equality
      // proves the parquet -> ORC -> scan chain preserved every value.
      val path = tmp("graft_orc_rb")
      t(s, d, "customer").write.mode("overwrite").orc(path)
      s.read.orc(path)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("c_acctbal").cast("decimal(12,2)"))
            .cast("double").as("acctbal"))
        .orderBy("c_mktsegment")
    }),
    "partition_overwrite_readback" -> ((s, d) => {
      // S21: land orders partitioned by month, then RE-land month 6
      // with doubled totals under dynamic partition overwrite (per-
      // write option, not session conf) — only month 6's directory is
      // replaced. The read-back aggregate must show exactly one
      // doubled month; a static overwrite (whole-path delete) would
      // empty the other 11, a reprocessing bug would double-count.
      // Doubling a parquet double is exact (exponent bump), so the
      // decimal cast agrees cross-engine.
      val path = tmp("graft_dynpart_rb")
      val base = t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_totalprice"),
          month(col("o_orderdate")).as("o_month"))
      base.write.partitionBy("o_month").mode("overwrite").parquet(path)
      base.where(col("o_month") === 6)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .write.partitionBy("o_month").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(path)
      s.read.parquet(path)
        .groupBy(col("o_month"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(12,2)"))
            .cast("double").as("revenue"))
        .orderBy("o_month")
    }),
    "corrupt_file_readback" -> ((s, d) => {
      // S23: a healthy multi-file documents copy plus one half-written
      // file (crashed writer: parquet magic, no footer). Scanned with
      // the per-read ignoreCorruptFiles option, the good rows survive
      // bit-exactly and the junk is skipped — the checksum equals the
      // source's. (The loud-by-default failure half of the contract
      // stays pinned in OperationalSpec.)
      val path = tmp("graft_corrupt_rb")
      t(s, d, "documents").repartition(4).write
        .mode("overwrite").parquet(path)
      Files.write(java.nio.file.Paths.get(path, "part-corrupt.parquet"),
        "PAR1garbage-no-footer".getBytes("UTF-8"))
      docChecksum(s.read.option("ignoreCorruptFiles", "true").parquet(path))
    })
  )

  val oracles: Map[String, String] = Map(
    "layout_bucketed_readback" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "layout_partitioned_readback" ->
      """SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS revenue
        |FROM orders
        |WHERE month(CAST(o_orderdate AS TIMESTAMP)) = 3
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "layout_compact_readback" -> docChecksumSql,
    "layout_zorder_readback" ->
      """WITH h AS (
        |  SELECT p_brand, p_retailprice,
        |    CAST(concat('0x', substr(md5(concat(CAST(p_partkey AS VARCHAR),
        |      '|', p_name)), 1, 15)) AS BIGINT) AS h
        |  FROM part)
        |SELECT p_brand, count(*) AS cnt,
        |  CAST(bit_xor(h) AS BIGINT) AS content_xor,
        |  CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS retail
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    "orc_roundtrip_agg" ->
      """SELECT c_mktsegment, count(*) AS cnt,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |    AS acctbal
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "partition_overwrite_readback" ->
      """SELECT CAST(month(CAST(o_orderdate AS TIMESTAMP)) AS INT) AS o_month,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(CASE WHEN month(CAST(o_orderdate AS TIMESTAMP)) = 6
        |    THEN o_totalprice * 2 ELSE o_totalprice END
        |    AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "corrupt_file_readback" -> docChecksumSql
  )
}
