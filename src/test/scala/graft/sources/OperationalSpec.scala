package graft.sources

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Operational concerns a long-lived 100 TB pipeline hits that never
  * show up in query-correctness tests: schema evolution across
  * historical partitions, and inline data-quality gates that don't
  * cost an extra scan.
  */
class OperationalSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema reads unify evolving parquet batches; old rows " +
       "null-fill the added column") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    // batch 1: original schema
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(dir)
    // batch 2: a column was added upstream
    Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "name", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "name", "score"))
    assert(merged.count() === 4)
    // old-batch rows surface the new column as NULL, not an error
    assert(merged.where(col("score").isNull).select("id")
      .as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    // WITHOUT mergeSchema the footer of one file wins — documents why
    // the option exists (schema depends on which file is sampled)
    val plain = spark.read.parquet(dir)
    assert(plain.columns.length <= 3)
  }

  test("ignoreCorruptFiles: a truncated parquet survives the scan as a " +
       "documented data loss instead of killing the job") {
    val dir = java.nio.file.Files.createTempDirectory("corrupt").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .repartition(1).write.mode("append").parquet(dir)
    // a half-written file (crashed writer, partial upload): bytes that
    // start like parquet but have no footer
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-corrupt.parquet"),
      "PAR1garbage-no-footer".getBytes("UTF-8"))
    // default: the job FAILS — corruption is loud
    intercept[org.apache.spark.SparkException] {
      spark.read.parquet(dir).count()
    }
    // opted in: the good files' rows survive, the bad file is skipped
    val prev = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      val got = spark.read.parquet(dir).select("id")
        .as[Long].collect().sorted.toSeq
      assert(got === Seq(1L, 2L, 3L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
        case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
      }
    }
  }

  test("dynamic partition overwrite replaces ONLY the partitions in " +
       "the incoming batch — the incremental-backfill write mode") {
    val dir = java.nio.file.Files.createTempDirectory("dynpart").toString
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((1L, "2026-01-01"), (2L, "2026-01-01"), (3L, "2026-01-02"),
          (4L, "2026-01-03"))
        .toDF("id", "day")
        .write.partitionBy("day").mode("overwrite").parquet(dir)
      // re-land day 2 only: static overwrite mode would DELETE days 1
      // and 3 (the whole table path); dynamic replaces just day 2
      Seq((30L, "2026-01-02"), (31L, "2026-01-02"))
        .toDF("id", "day")
        .write.partitionBy("day").mode("overwrite").parquet(dir)
      val got = spark.read.parquet(dir)
        .select(col("id"), col("day").cast("string"))
        .as[(Long, String)].collect().sorted.toSeq
      assert(got === Seq((1L, "2026-01-01"), (2L, "2026-01-01"),
        (4L, "2026-01-03"), (30L, "2026-01-02"), (31L, "2026-01-02")))
    } finally {
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
  }

  test("Observation collects data-quality metrics from the SAME pass " +
       "that produced the output (no second scan)") {
    val obs = Observation("qa")
    val df = graft.Tables.t(spark, sf("sf0.001"), "orders")
      .observe(obs,
        count(lit(1)).as("rows"),
        count(when(col("o_totalprice") <= 0, lit(1))).as("bad_price"),
        count(when(col("o_custkey").isNull, lit(1))).as("null_cust"))
      .where(col("o_orderpriority") === "1-URGENT")
    val kept = df.count()
    val m = obs.get
    // metrics describe the FULL scanned input, pre-filter — the QA
    // gate a pipeline asserts before publishing its output
    assert(m("rows").asInstanceOf[Long] > kept)
    assert(m("bad_price").asInstanceOf[Long] === 0L)
    assert(m("null_cust").asInstanceOf[Long] === 0L)
  }
}
