package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("createTableOnce: concurrent invocations write once, repeat " +
       "invocations reuse the existing table (no DROP/rewrite race)") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    // 8 threads race the same table name; the create body must run once
    val threads = (1 to 8).map { _ =>
      new Thread(() =>
        Layout.createTableOnce(spark, "graft_once_race") {
          hits.incrementAndGet()
          Seq((1L, "a")).toDF("k", "x").write.mode("overwrite")
            .saveAsTable("graft_once_race")
        })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(hits.get() === 1, s"create ran ${hits.get()} times")
    assert(spark.table("graft_once_race").count() === 1)

    // the query-level proof: bucketed_join_colocated invoked twice in
    // one session leaves the bucket files untouched on the second run
    val q = graft.SparkEntry.queries("bucketed_join_colocated")
    val sf = "/root/testdata/sf0.001"
    val r1 = q(spark, sf).collect()
    val tag = (sf + "_" + spark.sparkContext.applicationId)
      .replaceAll("[^a-zA-Z0-9]", "_")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val dir = new java.io.File(
      new java.net.URI(wh).getPath, s"graft_bkt_orders_$tag")
    val mtimes1 = dir.listFiles().map(f => f.getName -> f.lastModified).toMap
    val r2 = q(spark, sf).collect()
    val mtimes2 = dir.listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(mtimes2 === mtimes1,
      "second invocation must reuse the bucketed table, not rewrite it")
    assert(r1.map(_.toString).sorted.sameElements(r2.map(_.toString).sorted))
    spark.sql("DROP TABLE IF EXISTS graft_once_race")
  }

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

  test("compact merges a many-small-file dataset into the byte-targeted file count") {
    val in = java.nio.file.Files.createTempDirectory("compact_in").toString
    val out = java.nio.file.Files.createTempDirectory("compact_out").toString
    // 64 tiny files
    (0 until 10000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
      .repartition(64).write.mode("overwrite").parquet(in)
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(in) === 64)
    val inBytes = new java.io.File(in).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    // target ~quarter of the data per file => ~4 output files
    val n = Layout.compact(spark, in, out, targetBytes = inBytes / 4)
    assert(parquetFiles(out) === n.toInt && n <= 6,
      s"expected ~4-6 compacted files, got ${parquetFiles(out)} (n=$n)")
    assert(spark.read.parquet(out).count() === 10000)
    // content preserved exactly
    assert(spark.read.parquet(out).except(spark.read.parquet(in)).count() === 0)
    assert(spark.read.parquet(in).except(spark.read.parquet(out)).count() === 0)
  }

  test("mortonKey interleaves bits; z-order layout touches far fewer files on a cross-dim filter") {
    // reference morton implementation to pin the bit interleave
    def morton(a: Long, b: Long): Long = {
      var r = 0L
      for (i <- 0 until 31)
        r |= ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      r
    }
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 511L),
      ((1L << 31) - 1, 12345L))
    val got = pairs.toDF("a", "b")
      .select(Layout.mortonKey(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    assert(got.toSeq === pairs.map { case (a, b) => morton(a, b) },
      "mortonKey must match the bitwise reference")

    // 1024x1024-ish grid written (a) sorted by x only, (b) z-ordered.
    // A filter on y alone must hit ~all files in (a), few in (b).
    val grid = spark.range(0, 64 * 1024).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val linDir = java.nio.file.Files.createTempDirectory("lin").toString
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)
    Layout.writeZOrdered(grid, zDir, "x", "y", numFiles = 16)
    def filesHit(p: String): Long =
      spark.read.parquet(p).where(col("y") >= 10 && col("y") < 20)
        .select(input_file_name()).distinct().count()
    val (lin, z) = (filesHit(linDir), filesHit(zDir))
    assert(lin >= 14, s"x-sorted layout should hit ~all 16 files, hit $lin")
    assert(z <= lin / 2,
      s"z-ordered layout should hit far fewer files: z=$z lin=$lin")
    // layout changes nothing about content
    assert(spark.read.parquet(zDir).except(grid).count() === 0 &&
      grid.except(spark.read.parquet(zDir)).count() === 0)
  }

  test("hilbertKey is a true Hilbert curve: bijective on the grid, consecutive keys Manhattan-adjacent, matches the scalar reference") {
    val order = 4
    val n = 1 << order // 16x16 grid, exhaustively enumerated
    // scalar xy2d reference (reflect in n-1, the Wikipedia formulation)
    def xy2d(x0: Long, y0: Long): Long = {
      var (x, y, d) = (x0, y0, 0L)
      var s = (n >> 1).toLong
      while (s > 0) {
        val rx = if ((x & s) > 0) 1L else 0L
        val ry = if ((y & s) > 0) 1L else 0L
        d += s * s * ((3 * rx) ^ ry)
        if (ry == 0) {
          if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
          val t = x; x = y; y = t
        }
        s >>= 1
      }
      d
    }
    val cells = for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong)
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertKey(col("x"), col("y"), order).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.forall { case (x, y, h) => h === xy2d(x, y) },
      "hilbertKey must match the scalar reference")
    // bijective: keys are exactly 0 .. n*n-1
    val byKey = got.map { case (x, y, h) => h -> (x, y) }.toMap
    assert(byKey.keySet === (0L until (n.toLong * n)).toSet,
      "hilbert keys must be a bijection onto [0, n^2)")
    // the defining curve property: walking keys in order moves exactly
    // one Manhattan step per key — no Morton-style quadrant jumps
    (0L until (n.toLong * n - 1)).foreach { i =>
      val (x1, y1) = byKey(i); val (x2, y2) = byKey(i + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1,
        s"keys $i -> ${i + 1} jump from ($x1,$y1) to ($x2,$y2)")
    }
  }

  test("hilbert layout skips files like z-order and preserves content") {
    val grid = spark.range(0, 64 * 1024).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val linDir = java.nio.file.Files.createTempDirectory("lin_h").toString
    val hDir = java.nio.file.Files.createTempDirectory("hilb").toString
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)
    Layout.writeHilbert(grid, hDir, "x", "y", numFiles = 16, order = 9)
    def filesHit(p: String): Long =
      spark.read.parquet(p).where(col("y") >= 10 && col("y") < 20)
        .select(input_file_name()).distinct().count()
    val (lin, h) = (filesHit(linDir), filesHit(hDir))
    assert(h <= lin / 2,
      s"hilbert layout should hit far fewer files on the cross-dim filter: h=$h lin=$lin")
    assert(spark.read.parquet(hDir).except(grid).count() === 0 &&
      grid.except(spark.read.parquet(hDir)).count() === 0)
  }
}
