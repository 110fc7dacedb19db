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

  /** MEASURED quadratic fences for the n²-by-definition rows (each
    * with a shipped linear sibling): at sf ≥ 0.1, each row's own
    * cheap census runs first and the row is skipped — with the
    * measured numbers in the reason — only when the candidate bound
    * crosses the SAME 64-candidates-per-row integer gate that
    * [[graft.operators.Dedup.pairsAuto]] routes on. The fence is a
    * measurement, not a name list: on an open-vocabulary corpus whose
    * prefix buckets stay small, the census passes and the exact rows
    * run at any SF. SPARK_GRAFT_INCLUDE_QUADRATIC=true overrides.
    * Fenced names + reasons land in `outDir/fenced.json` so the
    * check tools report the census, not a generic subset skip.
    *
    * Census per row — sf1→sf3 exponent each fence answers for:
    * - dedup_ngram_jaccard (1.90) / dedup_cluster_cc (1.91): PPJoin
    *   prefix-bucket bound Σ c·(c−1)/2 vs 64·n_docs (saturated
    *   synthetic corpus measured 1,098 candidates/doc at sf1).
    *   Siblings: dedup_cluster_cc_auto (0.50), dedup_minhash_lsh
    *   (0.54).
    * - dedup_semdedup (1.24): pinned cells=8 ⇒ within-cell pair bound
    *   ≈ n²/16; gate n/16 > 64. Siblings: dedup_semdedup_scaled
    *   (0.83), dedup_semdedup_hier (0.39 top decade).
    * - entity_resolution_e2e (1.65): (brand, size) block census
    *   Σ c·(c−1)/2 vs 64·n (fixed key count ⇒ |block| ∝ n).
    *   Sibling: entity_resolution_snm (8n candidates by construction).
    * - dedup_cdc_chunks (r14 census; wall-clock sf3→sf10 cells 11→210 s
    *   same-run): chunk-hash self-join bound Σ f·(f−1)/2 vs 64·n_docs —
    *   on this templated corpus a constant fraction of docs share
    *   boilerplate chunks (max_freq ∝ n: 2,494 → 25,265 at sf1→sf10),
    *   so the bound is exactly ∝ n² (242 → 720 → 2,411 cand/doc;
    *   bound exponent 2.01). Sibling: dedup_cdc_chunks_capped
    *   (stop-chunk suppression at the same 64 gate ⇒
    *   ≤ 32·chunk_rows pairs, linear).
    */
  val measuredQuadratic: Set[String] = Set(
    "dedup_ngram_jaccard", "dedup_cluster_cc", "dedup_semdedup",
    "entity_resolution_e2e", "dedup_cdc_chunks")

  def measuredQuadraticReason(spark: SparkSession, sfDir: String,
                              name: String): Option[String] = {
    import org.apache.spark.sql.functions._
    val gate = 64L
    name match {
      case "dedup_ngram_jaccard" | "dedup_cluster_cc" =>
        val r = graft.operators.Dedup.prefixSaturationStats(
            Tables.t(spark, sfDir, "documents"), "doc_id", "text", 0.5)
          .select(col("cand_pairs_bound"), col("n_docs")).head()
        val (cand, n) = (r.getLong(0), r.getLong(1))
        if (cand > gate * n) Some(
          s"fenced: measured PPJoin prefix candidate bound $cand over " +
          s"$n docs (${cand / math.max(1L, n)}/doc) exceeds the " +
          s"$gate/doc routing gate; linear siblings: " +
          "dedup_cluster_cc_auto, dedup_minhash_lsh") else None
      case "dedup_semdedup" =>
        val n = Tables.t(spark, sfDir, "embeddings").count()
        val bound = n * n / 16 // 8 pinned cells, |cell| ~ n/8
        if (bound > gate * n) Some(
          s"fenced: pinned cells=8 within-cell pair bound ~n^2/16 = " +
          s"$bound over $n vectors (${bound / math.max(1L, n)}/vec) " +
          s"exceeds the $gate/vec gate; linear siblings: " +
          "dedup_semdedup_scaled, dedup_semdedup_hier") else None
      case "dedup_cdc_chunks" =>
        val r = graft.queries.TextDedup.cdcPairCensus(spark, sfDir)
        val (n, cand, maxF) = (r.getLong(0), r.getLong(4), r.getLong(3))
        if (cand > gate * n) Some(
          s"fenced: measured chunk-hash self-join pair bound $cand over " +
          s"$n docs (${cand / math.max(1L, n)}/doc, max chunk freq " +
          s"$maxF) exceeds the $gate/doc gate; linear sibling: " +
          "dedup_cdc_chunks_capped (stop-chunk suppression)") else None
      case "entity_resolution_e2e" =>
        val p = Tables.t(spark, sfDir, "part")
        val n = p.count()
        val cand = p.groupBy(col("p_brand"), col("p_size"))
          .agg(count(lit(1)).as("c"))
          .agg(sum(col("c") * (col("c") - 1)).as("c2")).head().getLong(0) / 2
        if (cand > gate * n) Some(
          s"fenced: measured (brand,size) block candidate pairs $cand " +
          s"over $n parts (${cand / math.max(1L, n)}/part) exceeds the " +
          s"$gate/part gate; linear sibling: entity_resolution_snm")
        else None
      case _ => None
    }
  }

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

    // Measured fences (see measuredQuadraticReason): census first,
    // skip only on a crossed gate. Applied at sf ≥ 0.1 even to
    // explicit subsets — the fence is a measurement, and the env var
    // is the documented override — where the static quadraticExact
    // name list keeps its subsets-always-run behavior.
    val envIncludeQuadratic =
      sys.env.getOrElse("SPARK_GRAFT_INCLUDE_QUADRATIC", "false") == "true"
    val fenced: Map[String, String] =
      if (envIncludeQuadratic || sfNum < 0.1) Map.empty
      else measuredQuadratic.toSeq.sorted
        .filter(n => only.forall(_.contains(n)))
        .flatMap { n =>
          val r = try measuredQuadraticReason(spark, sfDir, n)
                  catch { case e: Exception =>
                    System.err.println(s"[verify] census for $n failed " +
                      s"($e); running the row unfenced"); None }
          r.foreach(reason => System.err.println(s"[verify] $n $reason"))
          r.map(n -> _)
        }.toMap

    val pool = Executors.newFixedThreadPool(
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "8").toInt)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val attempted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .filter { case (name, _) =>
        includeQuadratic || !quadraticExact.contains(name) }
      .filter { case (name, _) => !fenced.contains(name) }

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
    // Measured-fence reasons (may be empty): check.py/check_sf1.py
    // report these verbatim instead of a generic subset skip.
    Files.writeString(Paths.get(s"$outDir/fenced.json"),
      fenced.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }
        .mkString("{", ",", "}"))

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
