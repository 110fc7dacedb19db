package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured work counts for the flagship scale paths — the numbers
  * behind the scaling exponents, so the "linear work" claims are
  * confirmed by counts, not inferred from wall-clock alone:
  *
  * - `snm`: sorted-neighborhood entity resolution candidate rows
  *   (mirrors the candidate stage of `entity_resolution_snm`,
  *   queries/Stats.scala — every record × its ≤ W = 8 next neighbors
  *   within the (brand, size) block, counted BEFORE the edit-distance
  *   match rule), against the 8n bound. Linear claim: count ≤ 8n.
  * - `lsh`: MinHash-LSH band-bucket census (Dedup.lshBucketCensus) —
  *   the candidate bound of the pair path dedup_cluster_cc_auto
  *   routes to. Linear claim: cand_per_doc flat across SFs.
  * - `prefix`: the exact-PPJoin prefix census
  *   (Dedup.prefixSaturationStats) — the same corpus's EXACT-path
  *   bound, the ∝ n contrast that justifies the routing.
  * - `ivf`: partitions of the persisted IVF-PQ index actually read by
  *   a cell-pruned search (ann_ivfpq_persisted's static cell-filter
  *   claim) vs total index partitions. Constant claim: scanned cells
  *   = nprobe·queries regardless of corpus size.
  *
  * Each probe is a callable function so WorkCountSpec can GATE the
  * recorded invariants in `sbt test` — the r13 IVF-PQ bug (DPP
  * planned to `dynamicpruningexpression(true)`, scan read 8/8 cells)
  * was caught by a manually-run census after the plan-shape pin
  * passed vacuously; the spec makes the next planned-away
  * optimization fail CI instead of waiting for a human probe.
  *
  * Usage: WorkCount <sfDir> [probe,...]
  * Default probe set: snm,lsh,prefix,cdc. `ivf` is OPT-IN (name it
  * explicitly) — it builds/searches the persisted IVF-PQ index, the
  * one expensive probe; the cheap censuses stay safe to run casually.
  * Prints one JSON line per probe.
  */
object WorkCount {

  /** SNM candidate census: rows and window-candidate count, against
    * the 8n sorted-neighborhood bound.
    */
  final case class SnmCensus(rows: Long, candidates: Long) {
    def bound8n: Long = 8 * rows
  }

  def snmCensus(spark: SparkSession, sfDir: String): SnmCensus = {
    graft.functions.expressions.DamerauLevenshtein.register(spark)
    val p = Tables.t(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"),
        col("p_name"))
    val n = p.count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("p_brand"), col("p_size"))
      .orderBy(col("p_name"), col("p_partkey"))
    val withLeads = p.withColumn("nbrs", array((1 to 8).map(i =>
      struct(lead(col("p_name"), i).over(w).as("n"),
             lead(col("p_partkey"), i).over(w).as("k"))): _*))
    val candRows = withLeads
      .select(col("p_partkey"), explode(col("nbrs")).as("nb"))
      .where(col("nb.k").isNotNull)
      .count()
    SnmCensus(n, candRows)
  }

  /** LSH band-bucket census, milli-candidates per doc in `candPerDocE3`
    * (the flat-per-doc claim of the routed pair path).
    */
  final case class LshCensus(nDocs: Long, nBandRows: Long, nBuckets: Long,
                             maxBucket: Long, candPairsBound: Long,
                             candPerDocE3: Long)

  def lshCensus(spark: SparkSession, sfDir: String): LshCensus = {
    val r = graft.operators.Dedup.lshBucketCensus(
      Tables.t(spark, sfDir, "documents"), "doc_id", "text").head()
    LshCensus(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
  }

  /** Exact-PPJoin prefix census — the EXACT path's candidate bound on
    * the same corpus (the contrast that justifies auto-routing).
    */
  final case class PrefixCensus(nDocs: Long, candPairsBound: Long,
                                candPerDocE3: Long)

  def prefixCensus(spark: SparkSession, sfDir: String): PrefixCensus = {
    val r = graft.operators.Dedup.prefixSaturationStats(
      Tables.t(spark, sfDir, "documents"), "doc_id", "text", 0.5)
      .select(col("n_docs"), col("cand_pairs_bound"),
        col("cand_per_doc_fp_e3")).head()
    PrefixCensus(r.getLong(0), r.getLong(1), r.getLong(2))
  }

  /** Chunk-hash pair census for `dedup_cdc_chunks`' self-join
    * (TextDedup.cdcPairCensus): Σ f·(f−1)/2 over chunk-hash doc
    * frequencies — the rows the join emits before any filter.
    */
  final case class CdcCensus(nDocs: Long, nChunkRows: Long, nHashes: Long,
                             maxFreq: Long, candPairsBound: Long,
                             candPerDocE3: Long)

  def cdcCensus(spark: SparkSession, sfDir: String): CdcCensus = {
    val r = graft.queries.TextDedup.cdcPairCensus(spark, sfDir)
    CdcCensus(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5))
  }

  /** Wedge census of the co-purchase graph behind the graph_* rows:
    * nodes, canonical edges, Σ deg·(deg−1)/2 (the wedge count that
    * bounds triangle-intersection work), and the max degree. Run at
    * two SFs, the wedge-count slope attributes a super-linear
    * wall-clock exponent to the GRAPH's own growth (definition-driven)
    * vs the plan (a real bug).
    */
  final case class WedgeCensus(nNodes: Long, nEdges: Long,
                               wedges: Long, maxDeg: Long)

  def wedgeCensus(spark: SparkSession, sfDir: String): WedgeCensus = {
    val pp = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val raw = pp.as("a")
      .join(pp.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    val canon = graft.operators.Triangles.orientById(raw)
    val deg = graft.operators.Triangles.degrees(canon)
    val r = deg.agg(count(lit(1)).as("n"),
        (sum(col("deg") * (col("deg") - 1)) / 2).cast("long").as("w"),
        (sum(col("deg")) / 2).cast("long").as("e"),
        max(col("deg")).as("mx")).head()
    WedgeCensus(r.getLong(0), r.getLong(2), r.getLong(1), r.getLong(3))
  }

  /** Runtime scan metrics of the persisted IVF-PQ index: partitions
    * and files ACTUALLY read (FileSourceScanExec metrics after
    * execution) vs total cells on disk, for the 5-query catalog batch
    * and for a single-query probe (whose reads must drop to its own
    * nprobe cells — the constant-work claim).
    */
  final case class IvfCensus(catalogPartitionsRead: Long,
                             catalogFilesRead: Long,
                             totalCellsOnDisk: Int,
                             oneQueryPartitionsRead: Long,
                             oneQueryFilesRead: Long,
                             nprobe: Int,
                             scansFound: Boolean)

  def ivfCensus(spark: SparkSession, sfDir: String): IvfCensus = {
    val df = SparkEntry.queries("ann_ivfpq_persisted")(spark, sfDir)
    df.count() // builds the index if absent; reruns reuse the marker
    val df2 = SparkEntry.queries("ann_ivfpq_persisted")(spark, sfDir)
    // execute THIS QueryExecution (df.count() plans a new one whose
    // metrics the df2 handle never sees)
    df2.queryExecution.toRdd.count()
    // AQE final plans nest finished stages as QueryStageExec LEAVES
    // (collect() never descends into them) — recurse explicitly
    // through stage/reuse wrappers to reach the scans.
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case _ => Nil
      }
      val kids: Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          Seq(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          Seq(r.child)
        case other => other.children
      }
      here ++ kids.flatMap(allScans)
    }
    val scans = allScans(df2.queryExecution.executedPlan).filter(
      _.metadata.getOrElse("Location", "").contains("graft_ivfpq_idx"))
    val idxScan = scans.headOption
    val mt = idxScan.map(_.metrics).getOrElse(Map.empty)
    def m(k: String): Long =
      mt.get(k).map(_.value).getOrElse(-1L)
    val totalCells = {
      val enc = new java.io.File(
        graft.Scratch.sharedDir("graft_ivfpq_idx", sfDir)
          .resolve("encoded").toString)
      Option(enc.listFiles()).toSeq.flatten
        .count(f => f.isDirectory && f.getName.startsWith("cell="))
    }
    // The catalog row probes 5 queries × nprobe 2 = 10 cells, which
    // can legitimately cover all 8 — so also measure a SINGLE query
    // (2 probed cells): the partitions actually read must drop to
    // the probe count, proving the static cell filter prunes at
    // listing time.
    val idxRoot = graft.Scratch.sharedDir("graft_ivfpq_idx", sfDir)
    val corpus = graft.operators.Similarity.prep(
      Tables.t(spark, sfDir, "embeddings"), "vec_id", "embedding",
      Some("label"))
    val q1 = corpus.where(col("id") < 1)
    val cents1 = spark.read.parquet(idxRoot.resolve("cents").toString)
    val probed1 = graft.operators.Pq.probedCellsOf(q1, cents1, nprobe = 2)
    val one = graft.operators.Pq.searchIvfPq(
      q1,
      spark.read.parquet(idxRoot.resolve("encoded").toString)
        .where(col("cell").isin(probed1.map(Int.box): _*)),
      cents1,
      spark.read.parquet(idxRoot.resolve("cb").toString), corpus,
      k = 10, nprobe = 2, m = 8, codes = 16, rerank = 50)
    one.queryExecution.toRdd.count()
    val oneScan = allScans(one.queryExecution.executedPlan).filter(
      _.metadata.getOrElse("Location", "").contains("graft_ivfpq_idx"))
      .headOption
    def m1(k: String): Long = oneScan.map(_.metrics)
      .getOrElse(Map.empty).get(k).map(_.value).getOrElse(-1L)
    IvfCensus(m("numPartitions"), m("numFiles"), totalCells,
      m1("numPartitions"), m1("numFiles"), 2,
      idxScan.isDefined && oneScan.isDefined)
  }

  /** One broadcast build actually shipped by a query: the build's
    * output columns, its RUNTIME row count and byte size
    * (BroadcastExchangeExec metrics after execution — the actuals the
    * planner's estimate guessed at).
    */
  final case class BcastBuild(cols: String, rows: Long, bytes: Long)

  /** Runtime sizes of every broadcast build a query ships — the
    * mechanized criterion behind the PlanShapeSpec broadcast
    * allowlist (r14 verdict item 5 / r15 carry): an allowlist entry
    * is justified by the claim that its build side is THRESHOLD-
    * bounded (q18's HAVING>300 key set, the PQ rerank shortlist), not
    * data-proportional. This probe measures the actual rows/bytes at
    * any SF, so the claim is a census cell + CI gate instead of a
    * comment: an allowlisted build that starts scaling with data
    * fails WorkCountSpec rather than surviving on its justification.
    */
  def bcastCensus(spark: SparkSession, sfDir: String,
                  queryNames: Seq[String]): Seq[(String, Seq[BcastBuild])] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
    // AQE nests finished stages as QueryStageExec leaves; recurse
    // through stage/reuse wrappers (same walk as ivfCensus.allScans)
    def allBuilds(p: SparkPlan): Seq[BroadcastExchangeExec] = {
      val here = p match {
        case b: BroadcastExchangeExec => Seq(b)
        case _ => Nil
      }
      val kids: Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      here ++ kids.flatMap(allBuilds)
    }
    queryNames.map { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.count() // fill the metrics of THIS plan
      // dedup by object identity: a ReusedExchange child is the same
      // node instance reached twice (structural equality would also
      // merge two DISTINCT builds that happen to be identical)
      // value type is java.lang.Boolean so `put == null` compares the
      // REFERENCE (first-insertion test); with scala.Boolean scalac
      // warns "always false" — a false alarm at runtime (verified: the
      // boxed reference is what's compared), but the honest type
      // removes the trap
      val seen = new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]()
      val builds = allBuilds(df.queryExecution.executedPlan)
        .filter(b => seen.put(b, java.lang.Boolean.TRUE) == null)
        .map { b =>
          def m(k: String) =
            b.metrics.get(k).map(_.value).getOrElse(-1L)
          BcastBuild(b.output.map(_.name).mkString(","),
            m("numOutputRows"), m("dataSize"))
        }
      name -> builds
    }
  }

  /** Model-cardinality census for the expression-constant models
    * (r16 verdict item 3): the charlm model grain is distinct char-
    * trigram TYPES over the documents corpus — the exact row count
    * `text_charlm_surprisal` collects to the driver and ships in the
    * task binary — and the langid profile table is top-50 × #langs by
    * definition. Both claims ("vocabulary-bounded, never
    * corpus-bounded") were argued from structure through r16; this
    * measures them so the collect gates (CharlmScore.MaxModelEntries,
    * LangidScore.MaxProfileEntries) can be sized measured×margin and
    * CI can catch a vocabulary that starts scaling with data.
    */
  final case class ModelCensus(nDocs: Long, charlmEntries: Long,
                               langidEntries: Long)

  def modelCensus(spark: SparkSession, sfDir: String): ModelCensus = {
    graft.functions.expressions.CharTrigramCounts.register(spark)
    val docs = Tables.t(spark, sfDir, "documents")
    val nDocs = docs.count()
    // charlm model rows = distinct trigram types (TextDedup builds the
    // same grain via groupBy(tri); count distinct of the exploded
    // per-row TYPE counts is that table's cardinality)
    val charlm = docs
      .select(explode(expr("graft_char_trigram_counts(text)")).as("t"))
      .select(col("t.tri")).distinct().count()
    // langid profile rows = min(50, types-per-lang) summed over the
    // languages PRESENT (the builder then keeps its 4 configured ones)
    val langid = docs.select(col("lang"),
        explode(expr("graft_char_trigram_counts(text)")).as("t"))
      .select(col("lang"), col("t.tri")).distinct()
      .groupBy("lang").agg(least(count(lit(1)), lit(50L)).as("k"))
      .agg(sum(col("k"))).head().getLong(0)
    ModelCensus(nDocs, charlm, langid)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val probes: Set[String] =
      if (args.length > 1) args(1).split(",").map(_.trim).toSet
      else Set("snm", "lsh", "prefix", "cdc")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (probes("snm")) {
      val c = snmCensus(spark, sfDir)
      println(s"""{"probe":"snm","sf":"$sfDir","rows":${c.rows},""" +
        s""""candidates":${c.candidates},"bound_8n":${c.bound8n},""" +
        s""""cand_per_row_fp_e3":${
          1000 * c.candidates / math.max(1, c.rows)}}""")
    }
    if (probes("lsh")) {
      val r = lshCensus(spark, sfDir)
      println(s"""{"probe":"lsh","sf":"$sfDir","n_docs":${r.nDocs},""" +
        s""""n_band_rows":${r.nBandRows},"n_buckets":${r.nBuckets},""" +
        s""""max_bucket":${r.maxBucket},"cand_pairs_bound":${r.candPairsBound},""" +
        s""""cand_per_doc_fp_e3":${r.candPerDocE3}}""")
    }
    if (probes("ivf")) {
      val c = ivfCensus(spark, sfDir)
      println(s"""{"probe":"ivf","sf":"$sfDir",""" +
        s""""partitions_read":${c.catalogPartitionsRead},""" +
        s""""files_read":${c.catalogFilesRead},""" +
        s""""total_cells_on_disk":${c.totalCellsOnDisk},""" +
        s""""one_query_partitions_read":${c.oneQueryPartitionsRead},""" +
        s""""one_query_files_read":${c.oneQueryFilesRead},""" +
        s""""nprobe":${c.nprobe},""" +
        s""""scan_found":${c.scansFound}}""")
    }
    if (probes("wedge")) {
      val c = wedgeCensus(spark, sfDir)
      println(s"""{"probe":"wedge","sf":"$sfDir","n_nodes":${c.nNodes},""" +
        s""""n_edges":${c.nEdges},"wedges":${c.wedges},""" +
        s""""max_deg":${c.maxDeg}}""")
    }
    if (probes("cdc")) {
      val c = cdcCensus(spark, sfDir)
      println(s"""{"probe":"cdc","sf":"$sfDir","n_docs":${c.nDocs},""" +
        s""""n_chunk_rows":${c.nChunkRows},"n_hashes":${c.nHashes},""" +
        s""""max_freq":${c.maxFreq},""" +
        s""""cand_pairs_bound":${c.candPairsBound},""" +
        s""""cand_per_doc_fp_e3":${c.candPerDocE3}}""")
    }
    if (probes("bcast")) {
      // the three PlanShapeSpec broadcast-allowlist entries — the
      // builds whose boundedness claims this probe turns into cells
      val qs = Seq("sql_tpch_q18", "sql_in_subquery", "ann_pq_adc")
        .filter(SparkEntry.queries.contains)
      bcastCensus(spark, sfDir, qs).foreach { case (name, builds) =>
        println(s"""{"probe":"bcast","sf":"$sfDir","query":"$name",""" +
          s""""builds":[""" + builds.map(b =>
            s"""{"cols":"${b.cols}","rows":${b.rows},"bytes":${b.bytes}}""")
            .mkString(",") + "]}")
      }
    }
    if (probes("model")) {
      val c = modelCensus(spark, sfDir)
      println(s"""{"probe":"model","sf":"$sfDir","n_docs":${c.nDocs},""" +
        s""""charlm_model_entries":${c.charlmEntries},""" +
        s""""langid_profile_entries":${c.langidEntries},""" +
        s""""charlm_cap":${graft.functions.expressions.CharlmScore.MaxModelEntries},""" +
        s""""langid_cap":${graft.functions.expressions.LangidScore.MaxProfileEntries}}""")
    }
    if (probes("prefix")) {
      val r = prefixCensus(spark, sfDir)
      println(s"""{"probe":"prefix","sf":"$sfDir","n_docs":${r.nDocs},""" +
        s""""cand_pairs_bound":${r.candPairsBound},""" +
        s""""cand_per_doc_fp_e3":${r.candPerDocE3}}""")
    }
    spark.stop()
  }
}
