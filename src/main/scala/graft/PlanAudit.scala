package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev tool: prints per-query plan-shape counters (parquet scans,
  * Generates, Exchanges, checkpoint scans, join kinds) for a family of
  * catalog queries — the numbers PlanFamilySpec pins. Run with an
  * optional regex arg (default: the text/dedup families).
  *
  * This is how the pin table is (re)generated: change a query, run
  * `runMain graft.PlanAudit`, review the printed row, update the
  * table in PlanFamilySpec if the change is intentional.
  */
object PlanAudit {

  /** Number of partition-less window operators (`Window.orderBy` with
    * no partitionBy — "Moving all data to a single partition") in the
    * query's physical plan. Nonzero is only acceptable over frames
    * PROVABLY bounded at any scale (a day spine, a top-k list, a
    * fixed histogram); over raw- or aggregate-grain frames it is the
    * classic 100 TB scale-killer. Verify emits this per query
    * (plan_audit.json) and PlanShapeSpec pins the allowlist.
    *
    * Walks the AQE-resolved plan if present; window operators hidden
    * behind an eager localCheckpoint taken at query-BUILD time are
    * not visible here (none of the catalog's checkpointed subplans
    * contain windows — the checkpoint boundaries wrap narrow range
    * layouts and fixpoint states).
    */
  def globalWindowCount(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExecBase
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect {
      case w: WindowExecBase if w.partitionSpec.isEmpty => w
    }.size
  }

  /** Broadcast build subtrees that scan a FACT table — the r14
    * `dedup_repeated_spans` bug class: Catalyst's compile-time size
    * estimate puts a data-sized side under the broadcast threshold,
    * and at some SF the build-side collect kills the driver
    * (maxResultSize) or ships GBs per query. Returns one entry per
    * fact scan found under a BroadcastExchange:
    * "table:FULL" (no pushed data filter — the dangerous shape: the
    * subtree's size is ∝ corpus unless an aggregation above the scan
    * reduces it to a BOUNDED domain) or "table:filtered" (a pushed
    * filter like `id < 5` bounds the build — usually fine). FULL
    * entries need a human eye: either the build is provably bounded
    * (fixed vocabulary, k-row aggregate) or the join needs a
    * `hint("merge")` like spans got.
    */
  /** True when a pushed data filter actually BOUNDS the scan's output
    * at any SF. Excludes (a) IsNotNull — rides along on every join key
    * and filters nothing; (b) modulo/hash-derived predicates
    * (`doc_id % 3 = 0`, `hash(id) % k = b` — the dedup_incremental
    * shape): they drop a constant FRACTION, so the build stays
    * corpus-sized and a broadcast chosen on its estimate still ships
    * data ∝ SF.
    */
  private def boundingFilter(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    e match {
      case _: IsNotNull => false
      case _ => !e.exists {
        case _: Remainder | _: Pmod | _: Murmur3Hash | _: XxHash64 |
             _: Crc32 | _: Md5 | _: Sha1 | _: Sha2 => true
        case _ => false
      }
    }
  }

  /** Fact tables whose data actually feeds this scan, by PATH-SEGMENT
    * match (`/<table>.parquet`): bare substring matching on short names
    * ("part", "orders") also tagged unrelated paths like
    * `.../partitioned_out/...`.
    */
  private def factsOf(loc: String, facts: Set[String]): Set[String] =
    facts.filter(t => loc.contains("/" + t + ".parquet"))

  /** Untruncated scan location. `metadata("Location")` is display text
    * truncated to spark.sql.maxMetadataStringLength (default 100): a
    * long checkout path would truncate `/<table>.parquet` out of the
    * string and silently DROP the scan from the broadcast safety audit
    * (advisor r15 — a false negative in a gate meant to catch
    * driver-killing builds). relation.location.rootPaths is the real
    * path list the scan reads.
    */
  private def scanLocation(
      s: org.apache.spark.sql.execution.FileSourceScanExec): String =
    s.relation.location.rootPaths.mkString(",")

  def broadcastFactBuilds(df: org.apache.spark.sql.DataFrame,
                          facts: Set[String]): Seq[String] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case b: BroadcastExchangeExec =>
      b.collect { case s: FileSourceScanExec =>
        val loc = scanLocation(s)
        // only a REAL, fraction-independent predicate (id < 5, a
        // literal IN, a comparison) counts as bounding the build side
        val selective = s.dataFilters.exists(boundingFilter)
        factsOf(loc, facts).map(t =>
          t + (if (selective) ":filtered" else ":FULL"))
      }.flatten.map { tag =>
        // the build's GRAIN decides boundedness: an aggregate keyed on
        // a bounded domain (8 centroids, alphabet³ trigrams) is fine
        // over a FULL scan; a corpus-grain or open-vocabulary build is
        // the spans bug
        s"$tag@${b.child.nodeName}(${
          b.child.output.map(_.name).take(4).mkString(",")})"
      }
    }.flatten
  }

  /** Per-entity key columns of the fact tables: a broadcast build
    * whose OUTPUT carries one of these at raw grain is corpus-sized.
    */
  val rawEntityKeys: Set[String] = Set(
    "doc_id", "vec_id", "event_id", "user_id",
    "o_orderkey", "o_custkey", "c_custkey", "l_orderkey",
    "p_partkey", "s_suppkey")

  /** Broadcast builds that are CORPUS-GRAIN with a GUESSED size: the
    * build output carries a raw per-entity key, the subtree scans a
    * fact table with no selective pushed filter (so rows ∝ data), AND
    * the subtree DERIVES its cardinality through an aggregate /
    * explode / window / join — the node classes whose row estimates
    * are heuristics, not file sizes. That combination is the r14
    * spans/charlm/gopher class: the estimate dips under the broadcast
    * threshold at some SF and the build-side collect ships the corpus
    * to the driver (maxResultSize at sf10 for spans). Scan+filter+
    * project-only builds are excluded — their estimates are file-size
    * based and the planner self-corrects across SFs. Builds bounded
    * by construction that still match (a top-k shortlist under a rank
    * filter) are the caller's allowlist to justify.
    */
  def corpusGrainBroadcasts(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def derived(p: SparkPlan): Boolean = p.collect {
      case n if n.nodeName.contains("Aggregate") ||
                n.nodeName.contains("Generate") ||
                n.nodeName.contains("Window") ||
                n.nodeName.contains("Join") => n
    }.nonEmpty
    plan.collect { case b: BroadcastExchangeExec =>
      val keys = b.child.output.map(_.name).filter(rawEntityKeys)
      val fullFacts = b.collect { case s: FileSourceScanExec =>
        val loc = scanLocation(s)
        val selective = s.dataFilters.exists(boundingFilter)
        if (selective) Set.empty[String] else factsOf(loc, factTables)
      }.flatten
      if (keys.nonEmpty && fullFacts.nonEmpty && derived(b.child))
        Some(s"build(${b.child.output.map(_.name).mkString(",")}) " +
          s"over FULL ${fullFacts.mkString("+")}")
      else None
    }.flatten
  }

  /** Parquet-scan count under a bare `count()` vs under the full
    * query — the count-prunability fingerprint (r13 gotcha, r14
    * mechanization): Bench/BenchScale time `df.count()`, and a tail
    * whose last join is provably cardinality-preserving (left join to
    * a groupBy-unique frame) lets Catalyst DROP the expensive subtree
    * under count(), so the row times a bare scan — the board cell
    * goes flat across SFs and "watched by the stopwatch" is vacuous
    * (charlm/gopher measured 0.11-0.19 s at EVERY sf this way).
    * countScans < fullScans ⇒ the bench row does not measure the
    * query.
    */
  def countPrunedScans(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
    // count BOTH leaf kinds: parquet scans and checkpoint reads
    // (Scan ExistingRDD) — a prunable tail behind a localCheckpoint
    // would otherwise escape the parquet-only count
    def scans(p: String) =
      "\\(\\d+\\) Scan parquet".r.findAllIn(p).size +
        "\\(\\d+\\) Scan ExistingRDD".r.findAllIn(p).size
    (scans(df.queryExecution.explainString(FormattedMode)),
     scans(df.groupBy().count().queryExecution.explainString(FormattedMode)))
  }

  /** The corpus/fact tables whose FULL scan inside a broadcast build
    * is the suspect shape (dimensions region/nation/supplier/customer
    * and bounded-domain tables are legitimately broadcastable).
    */
  val factTables: Set[String] =
    Set("documents", "embeddings", "lineitem", "orders", "events", "part")

  def main(args: Array[String]): Unit = {
    val pattern = args.headOption.getOrElse("^(text_|dedup_)")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val re = pattern.r
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => re.findFirstIn(n).isDefined)
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val p = df.queryExecution.explainString(FormattedMode)
        def c(rx: String) = rx.r.findAllIn(p).size
        println(s"AUDIT|$n|scans=${c("\\(\\d+\\) Scan parquet")}" +
          s"|gens=${c("\\(\\d+\\) Generate")}" +
          s"|exch=${c("\\(\\d+\\) Exchange")}" +
          s"|ckpt=${c("\\(\\d+\\) Scan ExistingRDD")}" +
          s"|cartesian=${c("CartesianProduct")}" +
          s"|bnlj=${c("BroadcastNestedLoopJoin")}" +
          s"|gwin=${globalWindowCount(df)}" +
          s"|bcastFact=${broadcastFactBuilds(df, factTables).mkString("+")}" +
          s"|corpusGrainBcast=${corpusGrainBroadcasts(df).mkString("; ")}" + {
            val (full, cnt) = countPrunedScans(df)
            if (cnt < full) s"|COUNT_PRUNED=$cnt/$full" else ""
          })
      } catch {
        case t: Throwable => println(s"AUDIT|$n|ERROR ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
