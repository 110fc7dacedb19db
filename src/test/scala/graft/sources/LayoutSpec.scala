package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join exchange-free and match the plain join") {
    val n = 1000
    val facts = (0 until n).map(i => (i.toLong % 100, s"f$i", i * 1.5))
      .toDF("k", "tag", "v")
    val dims = (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")
    Layout.writeBucketed(facts, "facts_b", "k", 8)
    Layout.writeBucketed(dims, "dims_b", "k", 8)
    try {
      val fb = spark.table("facts_b")
      val db = spark.table("dims_b")
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = fb.join(db, "k")
      assert(joined.count() === n)
      assert(Layout.isExchangeFree(joined),
        s"bucketed join should not shuffle:\n${joined.queryExecution.executedPlan}")
      // same-key aggregation is exchange-free too
      val agg = fb.groupBy("k").agg(count(lit(1)))
      assert(agg.count() === 100)
      assert(Layout.isExchangeFree(agg),
        s"bucketed agg should not shuffle:\n${agg.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10m")
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }

  test("partitioned writes prune directories at listing time") {
    val dir = java.nio.file.Files.createTempDirectory("layout_part").toString
    val df = (0 until 300).map(i => (i.toLong, Seq("a", "b", "c")(i % 3), i * 2.0))
      .toDF("id", "cat", "v")
    Layout.writePartitioned(df, dir, "cat")
    val read = spark.read.parquet(dir).where(col("cat") === "b")
    // collect() executes THIS queryExecution, populating its scan
    // metrics (count() would plan and execute a separate one)
    assert(read.collect().length === 100)
    val pf = Layout.partitionFilters(spark, read)
    assert(pf.contains("cat"),
      s"expected partition filter on cat, got: '$pf'")
    // after execution the scan reports how many partition dirs survived
    // pruning — exactly 1 of the 3 (cat=b)
    val scans = read.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.metrics("numPartitions").value === 1,
      s"expected 1 pruned partition, got ${scans.head.metrics("numPartitions").value}")
  }
}
