package graft

import org.apache.spark.sql.SparkSession

/** Full-catalog timing census: times EVERY `SparkEntry.queries` row
  * once at a given SF on the toRdd basis (the planned physical plan —
  * same basis as Bench/BenchScale since r14) and writes a ranked JSON
  * artifact.
  *
  * Why this exists (r16 verdict item 1): only 48 of 282 catalog rows
  * are bench-timed and 35 board-tracked, and round 16 proved three
  * long-green NON-headline-class costs were hiding ~8 s of corpus
  * shuffle behind correct answers (gopher 21x, charlm 7.7x, langid 5x
  * once rewritten row-locally). The census ranks all 282 so the audit
  * can walk the top non-headline rows for the same pattern: a
  * corpus-key shuffle computing a per-row/per-doc statistic.
  *
  * Protocol: min-of-2 for EVERY row (r17 lesson: the two r17 census
  * artifacts disagreed 2–3× on single-run heavy graph cells —
  * tools/adjudications/r17_census_dispersion.json — which forced a
  * manual adjudication; the ~12 rows ≥ 5 s cost one extra minute and
  * buy reproducible ranks). Both run times are stamped per cell
  * (`sec` = min, `sec2` = the other run) so a reader sees each cell's
  * own dispersion instead of trusting a single witness.
  * `cpu_calib_sec` is stamped so a future re-census on a different VM
  * can normalize before comparing.
  *
  * Usage: tools/bench.sh graft.Census [sfDir] [outJson] [subsetCsv]
  */
object Census {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outPath =
      if (args.length > 1) args(1) else "tools/census_r17_sf0.1.json"
    val subset: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet)
      else None

    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-census")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val calibSec = Bench.cpuCalibSec()
    System.err.println(f"[census] cpu_calib_sec=$calibSec%.4f")

    // Warm FS listing / codegen infra outside any timed region.
    Tables.names.foreach(n => Tables.t(spark, sfDir, n).count())

    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => subset.forall(_.contains(n)))
    val headline = Bench.headline.toSet
    val board = BenchScale.probes.toSet

    def timeOnce(name: String): (Double, Long, String) = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      try {
        val rows = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.toRdd.count()
        ((System.nanoTime() - t0) / 1e9, rows, null)
      } catch {
        case t: Throwable =>
          ((System.nanoTime() - t0) / 1e9, -1L, t.toString.take(300))
      }
    }

    val results = names.zipWithIndex.map { case (name, i) =>
      val (t1, rows1, err1) = timeOnce(name)
      val (sec, sec2, rows, err) =
        if (err1 == null) {
          val (t2, rows2, err2) = timeOnce(name)
          if (err2 == null) (math.min(t1, t2), math.max(t1, t2), rows2, null)
          else (t1, -1.0, rows1, null) // first run stands if the rerun flaked
        } else (t1, -1.0, rows1, err1)
      System.err.println(
        f"[census] ${i + 1}%3d/${names.size} $name%-36s $sec%8.2fs " +
          f"(other $sec2%8.2fs) rows=$rows")
      (name, sec, sec2, rows, err)
    }

    def fmt(d: Double) =
      String.format(java.util.Locale.US, "%.4f", Double.box(d))
    def jstr(s: String) = {
      // err embeds Throwable.toString — Spark messages carry newlines
      // and control chars, which are illegal raw inside JSON strings
      val b = new StringBuilder("\"")
      s.foreach {
        case '\\' => b.append("\\\\")
        case '"'  => b.append("\\\"")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      b.append("\"").toString
    }

    val rowsJson = results.sortBy(-_._2).map {
      case (name, sec, sec2, rows, err) =>
        val tags = Seq(
          if (headline(name)) Some("\"headline\"") else None,
          if (board(name)) Some("\"board\"") else None).flatten
        val errField = if (err == null) "null" else jstr(err)
        s"""  ${jstr(name)}: {"sec": ${fmt(sec)}, "sec2": ${fmt(sec2)}, """ +
          s""""rows": $rows, """ +
          s""""tags": [${tags.mkString(",")}], "err": $errField}"""
    }
    val total = results.map(_._2).sum
    val json =
      s"""{
         |"_meta": {"sf_dir": ${jstr(sfDir)}, "basis": "toRdd",
         |  "cpu_calib_sec": ${fmt(calibSec)}, "n": ${results.size},
         |  "total_sec": ${fmt(total)},
         |  "protocol": "min-of-2 every row; sec=min, sec2=other run"},
         |${rowsJson.mkString(",\n")}
         |}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    System.err.println(s"[census] wrote $outPath (total ${fmt(total)}s)")
    spark.stop()
  }
}
