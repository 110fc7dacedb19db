package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.Executors

import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

import org.apache.spark.sql.SparkSession

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Queries are independent jobs, so they are submitted from a small
  * thread pool — Spark's scheduler interleaves them and the wall clock
  * drops ~4-6x vs serial submission (per-query planning/codegen no
  * longer serializes the run).
  */
object Verify {

  /** Exact-but-quadratic catalog entries: correctness DEFINITIONS whose
    * cost is inherently super-linear (all-pairs wedge enumeration).
    * They verify at the driver's sf0.01 gate but are skipped at
    * sf ≥ 0.1 unless SPARK_GRAFT_INCLUDE_QUADRATIC=true, so a casual
    * large-SF sweep can't spend minutes timing a query whose
    * documented pipeline path is the capped variant (PLANS.md).
    */
  val quadraticExact: Set[String] = Set("graph_common_neighbors")

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names — dump only that
    // subset (fast iteration loop; the driver always runs the full set)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val sfNum = scala.util.Try(
      sfDir.split("sf").last.toDouble).getOrElse(0.0)
    val includeQuadratic =
      sys.env.getOrElse("SPARK_GRAFT_INCLUDE_QUADRATIC", "false") == "true" ||
        sfNum < 0.1 || only.isDefined // explicit subsets always run
    if (!includeQuadratic)
      System.err.println(
        s"[verify] skipping quadratic exact variants at sf=$sfNum: " +
          quadraticExact.mkString(", ") +
          " (SPARK_GRAFT_INCLUDE_QUADRATIC=true to include)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // local[32] with 8g heap: dedup verify sides (corpus rows +
      // shingle arrays, ~25MB at sf0.1) should hash-broadcast rather
      // than sort-merge; clusters tune this to their own memory.
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val pool = Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "8").toInt)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val attempted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .filter { case (name, _) =>
        includeQuadratic || !quadraticExact.contains(name) }

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // ALWAYS the full map, even for subset runs: a subset dump into a
    // previously-full output dir must not clobber the other queries'
    // oracles (that once silently fed an sf1 sweep a 1-entry oracle
    // file and let resume republish stale rows). check.py skips
    // oracle entries whose outputs are absent, so the fast loop still
    // only checks the subset.
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // The names THIS run tried to dump (post subset/quadratic filters):
    // lets check.py fail a crashed query (attempted but no output)
    // while still skipping queries that were never part of the run.
    // Written BEFORE any query launches, so a whole-JVM crash mid-run
    // leaves the list on disk and check.py fails the missing outputs
    // instead of reading them as a benign subset skip.
    Files.writeString(Paths.get(s"$outDir/attempted.json"),
      attempted.map(t => q(t._1)).mkString("[", ",", "]"))

    val failed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // Per-query partition-less-window count (PlanAudit.globalWindowCount)
    // → plan_audit.json: the mechanical catch for the single-partition
    // WindowExec scale-killer class, computed from the SAME DataFrame
    // the dump ran (no re-execution of eagerly-built queries).
    val gwin = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
               tag: String): Boolean = {
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        try gwin.put(name, PlanAudit.globalWindowCount(df))
        catch { case _: Throwable => () } // audit is best-effort
        System.err.println(f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs$tag")
        true
      } catch {
        case e: Throwable =>
          System.err.println(s"[verify] $name failed$tag: ${e.getMessage}")
          false
      }
    }
    val futures = attempted.map { case (name, fn) =>
      Future { if (!runOne(name, fn, "")) failed.add(name) }
    }
    Await.result(Future.sequence(futures), Duration.Inf)
    pool.shutdown()
    // Failures under the parallel pass are often CONTENTION (8 threads
    // sharing driver broadcast memory — a large-SF graph query lost
    // its broadcast build this way in r11), not query bugs: retry each
    // once serially with the whole JVM to itself before reporting.
    failed.forEach(name => { runOne(name, SparkEntry.queries(name), " (serial retry)"); () })

    import scala.jdk.CollectionConverters._
    Files.writeString(Paths.get(s"$outDir/plan_audit.json"),
      gwin.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: {${q("global_windows")}: $v}" }
        .mkString("{", ",", "}"))


    spark.stop()
  }
}
