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
          s"|gwin=${globalWindowCount(df)}")
      } catch {
        case t: Throwable => println(s"AUDIT|$n|ERROR ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
