package graft

import org.apache.spark.sql.SparkSession

/** Bench harness: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Headline set = the shuffle/join/agg-heavy
  * queries plus one per extension family — the ones whose plans decide
  * 100 TB behavior — rather than the whole per-operator catalog (whose
  * long tail is projection-only smoke).
  */
object Bench {
  val headline: Seq[String] = Seq(
    "q1_agg", "q3_shipping", "q5_region_revenue", "broadcast_dim_join",
    "between_dynamic", "window_anchor", "hierarchy_rollup",
    "unpivot_measures", "first_in_group",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
    "text_quality_score", "ann_cosine_topk", "ann_lsh_hyperplane",
    "ann_ivf_kmeans", "grouping_rollup", "window_running_sum",
    "events_tumbling_window", "events_sessionize", "events_asof_join",
    "corpus_curate", "heavy_hitters_words", "bloom_semi_join",
    "window_range_frame", "pack_chunks", "decontaminate",
    "sql_exists_correlated", "sql_in_subquery", "dedup_cluster_cc",
    "events_funnel", "events_interval_overlap", "cohort_retention_weeks",
    "pagerank_fixed",
    // round-5 additions: the shuffle/join-bearing training-data ops
    "text_gopher_repetition", "text_charlm_surprisal", "dedup_semdedup",
    "dedup_repeated_spans", "dedup_cdc_chunks", "text_tfidf_topk",
    // round-5 wave 2: graph wedge joins (clustering_coeff carries the
    // Triangles operator — the standalone count query covers the same
    // joins and is CORRECTNESS-gated but its 2-checkpoint
    // materialization makes it a storage benchmark, not a query
    // benchmark), the bucketed-layout join (timing includes the
    // bucketed write — the pay-once layout cost), and the
    // salt-rewritten skew join
    "graph_clustering_coeff",
    "bucketed_join_colocated", "join_skew_salted",
    // round-6 addition: the adjacency-self-join similarity query — a
    // second wedge-join plan shape (middle-node key, not the
    // triangle-closing probe) plus a data-sized top-k. The CAPPED
    // variant is benched: exact all-pairs common neighbors is
    // inherently Σ(deg choose 2) wedge rows (~90 s at sf0.1 — a
    // storage-bound enumeration, not a query-plan benchmark; same
    // reasoning that keeps graph_triangle_count out). The uncapped
    // exact form stays CORRECTNESS-gated.
    "graph_common_neighbors_capped",
    // round-10 addition: the scale-sized SemDeDup (cells ∝ corpus
    // count, |cell| held ~constant) benched NEXT TO the oracle-pinned
    // cells=8 row — the fixed-k pin made the within-cell pair term
    // quadratic under upsampling (r9 SFSCALE exponent 1.27); this row
    // times the sizing rule the operator actually contracts for.
    "dedup_semdedup_scaled",
    // round-7 addition: the second corpus-explode query (profile
    // train + score over re-exploded trigrams) — benched so the
    // materialize-vs-recompute class that regressed charlm in r6
    // stays watched by the stopwatch as well as the plan-shape spec.
    "text_langid_ngram",
    // round-12 addition: the self-routing cluster variant — at bench
    // scale (sf0.1) the saturated corpus routes it to the LSH pair
    // path, so this row times diagnostic + LSH + verify + contraction
    // next to dedup_cluster_cc's exact path.
    "dedup_cluster_cc_auto",
    // round-11 addition: the IVFADC composition (IVF cell probe ×
    // PQ ADC) — the production ANN scan shape; benched next to
    // ann_ivf_kmeans so a regression back toward the full-corpus ADC
    // scan shows up on the stopwatch as well as in PlanShapeSpec.
    "ann_ivfpq_adc")

  /** The adjudication band over a previous round's min: movement is
    * only arbitrated past BOTH 1.3× and +0.25 s (absolute floor keeps
    * millisecond rows from firing on scheduler noise).
    */
  def band(prev: Double): Double = math.max(prev * 1.3, prev + 0.25)

  /** Calib-normalized previous min: the bench box is a FRESH VM every
    * round and its CPU-per-second drifts (r16→r17: cpu_calib
    * 0.314→0.365 moved the whole 48-query board +15%, and every r17
    * "mover" was that drift — each cost a manual adjudication
    * artifact). The fixed-work calibration is measured every run, so
    * scale the previous round's min by the calib ratio BEFORE banding:
    * a pure-calib-shift round then produces ZERO movers (cur =
    * prev×ratio is always under band(prev×ratio)) and no child JVMs
    * are spawned at all. The ratio is clamped to [0.6, 1.8] so a
    * corrupted/contended calibration sample can neither hide a real
    * regression behind a huge allowance nor fabricate movers on a
    * "faster" box; missing calibration (≤0 on either side) leaves
    * prev untouched. This subsumes the pre-r18 `host_drift` verdict
    * branch (which only fired past a 1.15 gate — r17's driver run
    * measured ratio 1.082 and stamped `ann_ivfpq_adc` "regressed"
    * right under it).
    */
  def calibAdjust(prevMin: Double, prevCalib: Double,
                  nowCalib: Double): Double =
    if (prevCalib > 0 && nowCalib > 0)
      prevMin * math.min(1.8, math.max(0.6, nowCalib / prevCalib))
    else prevMin

  /** Two-instrument normalization: the integer-mix calibration misses
    * float/memory-bound host drift (r18 incident: a fresh VM ran the
    * whole sub-second CPU-tight cohort 1.2–1.8× slower — ann rows,
    * broadcast_dim_join, simhash — with the integer calib FLAT at
    * 1.02× and q1_agg at exactly 1.00×; three fresh JVMs concurred,
    * GC clean, box idle — tools/adjudications/r18_ann_ivfpq_adc.json).
    * The float calibration sees that class; normalize by whichever
    * instrument drifted MORE (each clamped inside [[calibAdjust]]), so
    * a box that slowed on either axis stops fabricating movers while a
    * flat box keeps the strict band. When only ONE instrument has both
    * samples (pre-r18 baselines lack cpu_calib_f32_sec), use that
    * instrument's adjustment DIRECTLY — max-ing with the identity
    * would discard a faster-box TIGHTENING (ratio < 1) and let a real
    * regression hide behind the un-normalized prev (r18 ADVICE).
    */
  def calibAdjust2(prevMin: Double, prevCalib: Double, nowCalib: Double,
                   prevCalibF32: Double, nowCalibF32: Double): Double = {
    val intPresent = prevCalib > 0 && nowCalib > 0
    val f32Present = prevCalibF32 > 0 && nowCalibF32 > 0
    if (intPresent && f32Present)
      math.max(calibAdjust(prevMin, prevCalib, nowCalib),
               calibAdjust(prevMin, prevCalibF32, nowCalibF32))
    else if (intPresent) calibAdjust(prevMin, prevCalib, nowCalib)
    else if (f32Present) calibAdjust(prevMin, prevCalibF32, nowCalibF32)
    else prevMin
  }

  /** True when a present instrument's RAW calib ratio lies outside the
    * [0.6, 1.8] clamp [[calibAdjust]] applies: past the clamp the band
    * can no longer absorb the drift, both fresh-child witnesses run on
    * the same slowed box, and confirmRegression would concur — so a
    * genuine >1.8x host slowdown is stamped "regressed" with no escape
    * hatch (the removed host_drift branch's allowance was uncapped).
    * The board must carry a loud warning on such rounds (r18 ADVICE).
    */
  def calibClampExceeded(prevCalib: Double, nowCalib: Double,
                         prevCalibF32: Double, nowCalibF32: Double): Boolean = {
    def raw(p: Double, n: Double): Double = if (p > 0 && n > 0) n / p else 1.0
    val ri = raw(prevCalib, nowCalib)
    val rf = raw(prevCalibF32, nowCalibF32)
    ri > 1.8 || ri < 0.6 || rf > 1.8 || rf < 0.6
  }

  /** First-witness verdict for a bench mover, pure and spec-gated
    * (BenchAdjudicatorSpec) — the chain that decides whether a
    * fresh-child rerun exonerates the context number or escalates.
    * `prevMin` arrives ALREADY calib-normalized ([[calibAdjust]] at
    * the mover-selection site), so host drift is discounted before
    * any branch here runs. Every non-band verdict is CONDITIONED ON
    * CAUSE (load, gc, dispersion); "regressed" here only means
    * "first witness concurs" — [[confirmRegression]] demands a
    * second.
    */
  def soloVerdict(soloMin: Double, prevMin: Double, ctxMin: Double,
                  soloGcMs: Long, soloLoad: Double, cpus: Int): String =
    if (soloMin < 0) "solo_failed"
    else if (soloMin <= band(prevMin)) "in_band_solo"
    else if (soloLoad > cpus.toDouble * 1.25) "contended"
    else if (soloGcMs > 0.25 * soloMin * 1000) "gc_bound"
    else if (soloMin > ctxMin * 1.2) "unstable_solo_over_band"
    else "regressed"

  /** Second-witness confirmation: a first-witness "regressed" is only
    * upheld when an INDEPENDENT fresh child reproduces it within 25%
    * — the r15 false positive (ann_ivf_kmeans: clean cross-JVM mins
    * spanned 0.84–1.19 s on byte-identical code) came from trusting
    * one child on a row whose JIT dispersion spans the band.
    */
  def confirmRegression(soloMin: Double, prevMin: Double,
                        solo2Min: Double): String =
    if (solo2Min < 0) "regressed" // second witness crashed: keep 1st
    else if (solo2Min <= band(prevMin)) "dispersive_across_jvms"
    else if (math.abs(solo2Min - soloMin) >
               0.25 * math.min(solo2Min, soloMin)) "dispersive_over_band"
    else "regressed"

  /** Fixed-work single-thread CPU calibration, seconds (min of 3 after
    * a JIT warmup pass). The bench box is a FRESH VM every round
    * (uptime minutes at round start; testdata re-materialized at
    * boot), so its CPU-per-second is not a constant across rounds:
    * r15's whole ANN cohort — the CPU-bound broadcast-loop vector rows
    * — rose 18-49% on byte-identical code and data while the
    * scan/shuffle-bound controls stayed flat, and the adjudicator
    * stamped the biggest mover "regressed" because it had no way to
    * see the box itself had slowed. This row is that missing
    * instrument: 200M iterations of integer mix (rotl+xor+mul — no
    * memory traffic, no allocation), byte-identical work every round,
    * so the ratio now/prev IS the host's CPU drift and the adjudicator
    * can discount it (verdict `host_drift`) instead of blaming code.
    */
  def cpuCalibSec(): Double = {
    def once(iters: Long): (Double, Long) = {
      var h = 0x9E3779B97F4A7C15L
      var i = 0L
      val t0 = System.nanoTime()
      while (i < iters) {
        h = java.lang.Long.rotateLeft(h ^ (i * 0xC2B2AE3D27D4EB4FL), 31) *
          0x9E3779B97F4A7C15L
        i += 1
      }
      ((System.nanoTime() - t0) / 1e9, h)
    }
    once(20000000L) // JIT warmup, discarded
    val rs = (1 to 3).map(_ => once(200000000L))
    // consume the hash so the loop cannot be dead-code-eliminated
    if (rs.exists(_._2 == 42L)) System.err.println("calib sentinel")
    rs.map(_._1).min
  }

  /** Fixed-work FLOAT calibration, seconds (min of 3 after a warmup):
    * a fused multiply-add sweep over a 64-float array — the inner-loop
    * shape of the ADC/cosine/hyperplane ANN rows. Exists because the
    * integer-mix calibration is blind to float/vector host drift: the
    * r18 box ran the CPU-tight sub-second cohort 1.2–1.8× slower than
    * r16's on byte-identical code with the integer calib flat (1.02×)
    * — the two instruments together let the adjudicator discount
    * whichever axis the fresh VM actually drifted on (calibAdjust2).
    */
  def cpuCalibF32Sec(): Double = {
    def once(iters: Long): (Double, Float) = {
      val a = Array.tabulate(64)(i => 1.0f + i * 0.001f)
      var acc = 0.5f
      var i = 0L
      val t0 = System.nanoTime()
      while (i < iters) {
        val x = a((i & 63L).toInt)
        acc = acc * 0.999f + x * 0.001f
        i += 1
      }
      ((System.nanoTime() - t0) / 1e9, acc)
    }
    once(20000000L) // JIT warmup, discarded
    val rs = (1 to 3).map(_ => once(200000000L))
    if (rs.exists(_._2 == 42.0f)) System.err.println("calib f32 sentinel")
    rs.map(_._1).min
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      // AQE-on is the PRIMARY bench mode (round 10): a 100 TB cluster
      // runs AQE, so the graded plans should carry runtime coalescing
      // + skew-join splitting first-class. SPARK_GRAFT_AQE=false flips
      // back for debugging; the secondary block below re-times the
      // opposite mode so the artifact keeps both measurable. AqeSpec
      // pins result equivalence between the modes.
      .config("spark.sql.adaptive.enabled",
              sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Host CPU calibration BEFORE any query load: fixed single-thread
    // work whose round-over-round ratio measures the fresh-VM box's
    // CPU drift (see cpuCalibSec). Emitted as "cpu_calib_sec"; the
    // adjudicator divides movers by it before blaming code.
    val calibSec = cpuCalibSec()
    val calibF32Sec = cpuCalibF32Sec()
    System.err.println(
      f"[bench] cpu_calib_sec=$calibSec%.4f cpu_calib_f32_sec=$calibF32Sec%.4f")

    // Warm the session (FS listing, codegen infra, broadcast machinery)
    // outside the timed region.
    Tables.names.foreach(n => Tables.t(spark, sfDir, n).count())

    // Dev loop: SPARK_GRAFT_BENCH_ONLY=a,b,c times just those headline
    // queries (unset → full set; the driver never sets it).
    val selected = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(csv) =>
        val want = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
        headline.filter(want.contains)
      case None => headline
    }

    val missing = selected.filterNot(SparkEntry.queries.contains)
    if (missing.nonEmpty)
      System.err.println(
        s"WARN Bench: headline queries missing from SparkEntry.queries: ${missing.mkString(", ")}")

    // One discarded warmup (first-run codegen/JIT/FS-cache effects),
    // then `runs` timed executions per query. "queries" stays the
    // per-query MIN (steady-state throughput, shielded from
    // background-load spikes); "stats" adds mean/stddev/max so a
    // min-to-min drift between rounds can be adjudicated against the
    // harness's own dispersion instead of guessed at — round-4 showed
    // ±40% per-query drift on byte-identical code with min-of-3 alone.
    // A query that throws reports the sentinel -1 (never a plausible
    // timing) and is listed in "errors".
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt

    // Total stop-the-world GC time across all collectors, ms. The
    // per-run delta rides along in "stats" so a min elevated across a
    // whole 5-run block (r12: sql_exists_correlated 0.72 s clean vs
    // 4.84 s in the driver window) can be split into "JVM was
    // collecting" vs "host was contended" from the artifact alone.
    def gcMs(): Long =
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .stream().mapToLong(b => math.max(0L, b.getCollectionTime)).sum()

    // 1-minute system load average, sampled per run: this JVM drives
    // ~cpus of load itself, so a sample far above `cpus` during a slow
    // block is the external-contention fingerprint the r12 blowup
    // (sql_exists_correlated 0.72 → 4.84 s on unchanged code in the
    // driver window) lacked — with it in the artifact, that
    // adjudication is one field lookup instead of a rerun campaign.
    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage

    // Warmup iterations before the timed runs. 1 covers per-plan
    // codegen in the long-lived bench JVM; the adjudicator's fresh
    // child JVMs set 2 — r13's solo rerun of `decontaminate` measured
    // 1.27 s against a 0.33-0.39 s 5-run band because one warmup does
    // not absorb a cold JVM's JIT + first-shuffle costs, and the
    // resulting "regressed" verdict was a false positive.
    val nWarmups = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUPS", "1").toInt

    def runBlock(nRunsBlock: Int): Seq[(String, Seq[(Double, Long, Double)])] =
      selected.filter(SparkEntry.queries.contains).map { name =>
        val fn = SparkEntry.queries(name)
        def timed(): (Boolean, Double, Long, Double) = {
          // Operators persist shared intermediates; each invocation
          // builds fresh frames, so drop the previous run's cache
          // entries or they accumulate and thrash the heap.
          spark.catalog.clearCache()
          // operators that localCheckpoint (Components, PageRank,
          // Triangles) leave RDD blocks pinned in storage; drop them or
          // they accumulate across queries and squeeze the heap the
          // later queries run in
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
          val g0 = gcMs()
          val t0 = System.nanoTime()
          // Execute the ALREADY-PLANNED physical plan and count its
          // rows (toRdd), NOT df.count(): count() builds a fresh
          // logical plan that Catalyst re-optimizes, and any tail
          // whose last stage is provably cardinality-preserving (left
          // join to a groupBy-unique frame, an unused window over a
          // union) gets its expensive subtree PRUNED — four headline
          // rows (charlm, gopher, langid, asof) timed a bare doc scan
          // this way through r13, flat across four decades of SF (r14
          // audit: PlanAudit.countPrunedScans). toRdd also keeps the
          // final sort, so rows now pay their real output cost.
          val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
                   catch { case t: Throwable =>
                     System.err.println(s"WARN Bench: $name failed: $t"); false }
          (ok, (System.nanoTime() - t0) / 1e9, gcMs() - g0, loadAvg())
        }
        (1 to nWarmups).foreach(_ => timed()) // warmups, discarded
        val good = (1 to nRunsBlock).map(_ => timed())
          .collect { case (true, t, g, l) => (t, g, l) }
        name -> good
      }

    // JSON numbers need '.': pin the locale (the f-interpolator uses
    // the default locale, which would emit decimal commas on de_DE)
    def fmt(d: Double) =
      String.format(java.util.Locale.US, "%.6f", Double.box(d))
    def minsJson(results: Seq[(String, Seq[(Double, Long, Double)])]) =
      results.map { case (k, rs) =>
        "\"" + k + "\":" + (if (rs.nonEmpty) fmt(rs.map(_._1).min) else "-1.0")
      }.mkString("{", ",", "}")
    def statsJson(results: Seq[(String, Seq[(Double, Long, Double)])]) =
      results.map { case (k, rs) =>
        if (rs.isEmpty) "\"" + k + "\":null"
        else {
          val ts = rs.map(_._1)
          val mean = ts.sum / ts.size
          val sd = math.sqrt(ts.map(t => (t - mean) * (t - mean)).sum / ts.size)
          // gc_ms_min_run = GC time inside the run that produced the
          // min (the published number); gc_ms_max = worst run's GC;
          // load_max = highest 1-min system loadavg sampled across the
          // query's runs (external-contention fingerprint).
          val gcOfMin = rs.minBy(_._1)._2
          "\"" + k + "\":{\"min\":" + fmt(ts.min) + ",\"mean\":" + fmt(mean) +
            ",\"stddev\":" + fmt(sd) + ",\"max\":" + fmt(ts.max) +
            ",\"gc_ms_min_run\":" + gcOfMin +
            ",\"gc_ms_max\":" + rs.map(_._2).max +
            ",\"load_max\":" + fmt(rs.map(_._3).max) +
            ",\"runs\":" + ts.size + "}"
        }
      }.mkString("{", ",", "}")

    val results = runBlock(nRuns)
    val failed = results.collect { case (k, ts) if ts.isEmpty => "\"" + k + "\"" }
    val errs = failed.mkString("[", ",", "]")
    val total = results.collect { case (_, rs) if rs.nonEmpty => rs.map(_._1).min }.sum

    // Secondary block re-times the OPPOSITE adaptive mode (AQE-off
    // when the primary is AQE-on) so the artifact carries both modes
    // first-class instead of requiring a separate env-flagged
    // invocation. AQE is a runtime conf — toggled on the live session.
    // Fewer runs (default 2) keep the added wall-clock bounded; set
    // SPARK_GRAFT_AQE_RUNS=0 to skip.
    val aqePrimary = sys.env.getOrElse("SPARK_GRAFT_AQE", "true") == "true"
    val nAqeRuns = sys.env.getOrElse("SPARK_GRAFT_AQE_RUNS", "2").toInt
    val aqeBlock =
      if (nAqeRuns <= 0) ""
      else {
        spark.conf.set("spark.sql.adaptive.enabled", (!aqePrimary).toString)
        val r = runBlock(nAqeRuns)
        spark.conf.set("spark.sql.adaptive.enabled", aqePrimary.toString)
        val totalAqe = r.collect { case (_, rs) if rs.nonEmpty => rs.map(_._1).min }.sum
        s""","secondary":{"aqe":${!aqePrimary},"total":${fmt(totalAqe)},"queries":${minsJson(r)},"stats":${statsJson(r)},"runs":$nAqeRuns}"""
      }

    // ---- Solo-rerun adjudicator ----------------------------------
    // Rounds 11 and 12 both needed hand-run fresh-JVM reruns to decide
    // whether a bench mover was a regression or in-context JVM/host
    // noise (r12: sql_exists_correlated 0.72 s clean vs 4.84 s min in
    // the 48-query driver JVM, code unchanged). This formalizes that:
    // after the timed blocks, any query whose in-context min exceeds
    // BOTH 1.3x and +0.25 s over the previous round's min (from the
    // newest BENCH_r*_full.json, or SPARK_GRAFT_PREV_BENCH) is
    // re-timed in a FRESH child JVM running only that query, and the
    // artifact carries a machine-readable verdict — no hand
    // archaeology. (The bar was 1.5x through r13; on rows with ~15%
    // same-code stddev a 1.4x drift — graph_clustering_coeff
    // 1.89 -> 2.67 s in the r13 driver window — never fired, leaving
    // exactly the mover a human then had to arbitrate. 1.3x fires on
    // such drift and lets the machine stamp it in_band_solo.)
    //
    // The verdict is CONDITIONED ON CAUSE, not on the bare solo time:
    // the child samples its own GC and 1-min load, runs TWO warmups
    // (one warmup left r13's solo `decontaminate` at 1.27 s — 2x
    // slower than the contended context it was meant to arbitrate —
    // and mislabeled it "regressed"; the builder's clean band was
    // 0.33-0.39 s), and a solo min that still exceeds the band is
    // split into contended (high load), gc_bound (collector-dominated
    // run), unstable_solo_over_band (slower than the context it arbitrates —
    // cold/dispersive measurement, never evidence of regression), or
    // regressed (clean child reproduces the slowdown). Child JVMs
    // inherit this JVM's args (heap, add-opens) and classpath;
    // SPARK_GRAFT_ADJUDICATE=off disables (set in the children so
    // recursion is impossible).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")

    val adjBlock = {
      val enabled =
        sys.env.getOrElse("SPARK_GRAFT_ADJUDICATE", "on") != "off"
      val prevPath = sys.env.get("SPARK_GRAFT_PREV_BENCH").orElse {
        val rx = "BENCH_r(\\d+)_full\\.json".r
        val dir = new java.io.File(".").listFiles()
        // never adjudicate against this run's OWN output file — when
        // the round artifact is regenerated in place, the newest
        // BENCH_r*_full.json IS outPath and a self-comparison labels
        // same-day band drift "regressed" (caught live in r13)
        val self = java.nio.file.Paths.get(outPath)
          .toAbsolutePath.normalize
        Option(dir).toSeq.flatten.flatMap(f => f.getName match {
          case rx(n)
            if f.toPath.toAbsolutePath.normalize != self =>
            Some((n.toInt, f.getName))
          case _ => None
        }).sortBy(-_._1).headOption.map(_._2)
      }
      val (prevMins: Map[String, Double], prevCalib: Double,
           prevCalibF32: Double) =
        prevPath.flatMap { p =>
          try {
            val om = new com.fasterxml.jackson.databind.ObjectMapper()
            val root = om.readTree(java.nio.file.Files.readString(
              java.nio.file.Paths.get(p)))
            val q = root.get("queries")
            if (q == null || !q.isObject) None
            else {
              val it = q.fieldNames()
              val b = Map.newBuilder[String, Double]
              while (it.hasNext) {
                val n = it.next(); b += n -> q.get(n).asDouble(-1.0)
              }
              val c = Option(root.get("cpu_calib_sec"))
                .map(_.asDouble(-1.0)).getOrElse(-1.0)
              val cf = Option(root.get("cpu_calib_f32_sec"))
                .map(_.asDouble(-1.0)).getOrElse(-1.0)
              Some((b.result().filter(_._2 > 0), c, cf))
            }
          } catch { case _: Exception => None }
        }.getOrElse((Map.empty[String, Double], -1.0, -1.0))
      // Board-level clamp warning: when a present instrument's RAW
      // ratio is outside the [0.6, 1.8] clamp, the normalized band
      // cannot absorb the drift and every verdict below runs on the
      // same drifted box — stamp the artifact so a >1.8x host-slowdown
      // round is never silently read as "regressed" (r18 ADVICE; the
      // removed host_drift branch's allowance was uncapped).
      // Guarded on `enabled`: children run with SPARK_GRAFT_ADJUDICATE=off
      // and must not print the clamp warning once per spawn on a
      // drifted host (r19 ADVICE).
      val clampWarn = if (!enabled) "" else {
        def raw(p: Double, n: Double) = if (p > 0 && n > 0) n / p else 1.0
        if (calibClampExceeded(prevCalib, calibSec,
                               prevCalibF32, calibF32Sec)) {
          System.err.println(
            f"[adjudicate] WARNING calib ratio outside [0.6,1.8] clamp " +
            f"(int ${raw(prevCalib, calibSec)}%.3f, " +
            f"f32 ${raw(prevCalibF32, calibF32Sec)}%.3f) — " +
            "band cannot absorb this drift; treat 'regressed' verdicts " +
            "this round as suspect host slowdown")
          s""","calib_clamp_exceeded":true,"calib_ratio_int":${fmt(
            raw(prevCalib, calibSec))},"calib_ratio_f32":${fmt(
            raw(prevCalibF32, calibF32Sec))}"""
        } else ""
      }
      // Mover selection against the CALIB-NORMALIZED previous min:
      // on a pure host-drift round (every query scaled by the calib
      // ratio) nothing clears band(prevAdj), so no children spawn and
      // the artifact carries zero verdicts — the r17 board moved +15%
      // one-for-one with calib and still cost four adjudications.
      val movers = results.collect {
        case (name, rs) if rs.nonEmpty && prevMins.contains(name) &&
          rs.map(_._1).min >
            band(calibAdjust2(prevMins(name), prevCalib, calibSec,
                              prevCalibF32, calibF32Sec)) =>
          (name, rs.map(_._1).min, prevMins(name),
           calibAdjust2(prevMins(name), prevCalib, calibSec,
                        prevCalibF32, calibF32Sec))
      }.sortBy { case (_, cur, _, prevAdj) => -(cur - prevAdj) }
        .take(sys.env.getOrElse("SPARK_GRAFT_ADJ_MAX", "4").toInt)
      if (!enabled || (movers.isEmpty && clampWarn.isEmpty)) ""
      else if (movers.isEmpty)
        s""","adjudication":{"prev":"${prevPath.getOrElse("")}","movers":{}$clampWarn}"""
      else {
        val javaBin = System.getProperty("java.home") + "/bin/java"
        val jvmArgs = java.lang.management.ManagementFactory
          .getRuntimeMXBean.getInputArguments
        // One fresh child JVM timing only `name`; returns (min, gc-of-
        // min-run ms, max 1-min load). Callable twice: a would-be
        // "regressed" verdict must be CONFIRMED by a second child (see
        // below) before the machine blames code.
        def soloChild(name: String): (Double, Long, Double) = {
          val tmp = java.nio.file.Files.createTempFile("adj_", ".json")
          val cmd = new java.util.ArrayList[String]()
          cmd.add(javaBin)
          jvmArgs.forEach(a => { cmd.add(a); () })
          cmd.add("-cp"); cmd.add(System.getProperty("java.class.path"))
          cmd.add("graft.Bench")
          val pb = new ProcessBuilder(cmd)
          pb.environment().put("SPARK_GRAFT_BENCH_ONLY", name)
          pb.environment().put("SPARK_GRAFT_BENCH_RUNS", "3")
          // TWO warmups in the fresh child: cold-JVM JIT/first-shuffle
          // cost survives a single warmup and fabricates "regressed"
          // (the r13 decontaminate false positive)
          pb.environment().put("SPARK_GRAFT_BENCH_WARMUPS", "2")
          pb.environment().put("SPARK_GRAFT_AQE_RUNS", "0")
          pb.environment().put("SPARK_GRAFT_ADJUDICATE", "off")
          pb.environment().put("SPARK_GRAFT_BENCH_OUT", tmp.toString)
          pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
          pb.redirectErrorStream(true)
          pb.redirectOutput(new java.io.File("/dev/null"))
          try {
            val proc = pb.start()
            val done = proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS)
            if (!done) { proc.destroyForcibly(); (-1.0, -1L, -1.0) }
            else {
              val om = new com.fasterxml.jackson.databind.ObjectMapper()
              val root = om.readTree(java.nio.file.Files.readString(tmp))
              val s = root.get("stats").get(name)
              (root.get("queries").get(name).asDouble(-1.0),
               if (s == null || s.isNull) -1L
               else s.get("gc_ms_min_run").asLong(-1L),
               if (s == null || s.isNull) -1.0
               else s.get("load_max").asDouble(-1.0))
            }
          } catch { case t: Throwable =>
            System.err.println(s"WARN Bench adjudicate $name: $t")
            (-1.0, -1L, -1.0)
          } finally { java.nio.file.Files.deleteIfExists(tmp); () }
        }
        val verdicts = movers.map { case (name, ctxMin, prevMin, prevAdj) =>
          val (soloMin, soloGcMs, soloLoad) = soloChild(name)
          // Verdict, conditioned on cause (every non-band verdict
          // carries the gc/load fields that justify it):
          //   in_band_solo  — clean child is inside the prev band:
          //                   the context number was noise, not code.
          //   contended     — child itself ran under external load
          //                   (load_max far above this JVM's own
          //                   ~cpus); nothing about the code is known.
          //   gc_bound      — the child's min run spent >25% of its
          //                   wall-clock collecting; heap pressure,
          //                   not plan cost.
          //   unstable_solo_over_band — child is slower than the
          //                   contended context it was meant to
          //                   arbitrate with low gc/load: dispersive
          //                   measurement (this box shows ±70% on
          //                   heavy shuffle rows). The _over_band
          //                   suffix keeps the possible-regression
          //                   signal visible (this branch is only
          //                   reachable when the solo min exceeds the
          //                   prev band): a human scanning verdicts
          //                   can still flag it, while the machine
          //                   refuses to stamp "regressed" on a
          //                   measurement that can't arbitrate itself.
          //   (host drift is no longer a VERDICT: the band itself is
          //   calib-normalized at mover selection — see calibAdjust —
          //   so a drift-explained mover never reaches this chain.)
          //   dispersive_across_jvms — the first child reproduced the
          //                   slowdown but a SECOND fresh child landed
          //                   back inside the prev band: the row's
          //                   cross-JVM (JIT) dispersion spans the
          //                   band, so one child's min cannot convict
          //                   code (the r15 ann_ivf_kmeans false
          //                   positive: clean fresh-JVM mins measured
          //                   0.84-1.19 s on byte-identical code+data
          //                   the next day).
          //   dispersive_over_band — both children exceeded the band
          //                   but disagree by >25%: possible
          //                   regression, magnitude untrustworthy —
          //                   kept visible, like
          //                   unstable_solo_over_band.
          //   regressed     — TWO independent clean, warmed, unloaded
          //                   children reproduce the slowdown within
          //                   25% of each other.
          // pure, spec-gated chain (BenchAdjudicatorSpec): first
          // witness -> cause-conditioned verdict; "regressed" only
          // survives a concurring second fresh child
          val verdict0 = soloVerdict(soloMin, prevAdj, ctxMin,
            soloGcMs, soloLoad, cpus.toInt)
          val (verdict, solo2Min) =
            if (verdict0 != "regressed") (verdict0, -1.0)
            else {
              val (m2, _, _) = soloChild(name)
              (confirmRegression(soloMin, prevAdj, m2), m2)
            }
          System.err.println(s"[adjudicate] $name prev=${fmt(prevMin)} " +
            s"prev_adj=${fmt(prevAdj)} " +
            s"ctx=${fmt(ctxMin)} solo=${fmt(soloMin)} " +
            s"solo2=${fmt(solo2Min)} " +
            s"gc=${soloGcMs}ms load=${fmt(math.max(soloLoad, 0))} " +
            s"-> $verdict")
          "\"" + name + "\":{\"prev_min\":" + fmt(prevMin) +
            ",\"prev_adj\":" + fmt(prevAdj) +
            ",\"ctx_min\":" + fmt(ctxMin) +
            ",\"solo_min\":" + fmt(soloMin) +
            ",\"solo2_min\":" + fmt(solo2Min) +
            ",\"solo_gc_ms\":" + soloGcMs +
            ",\"solo_load_max\":" + fmt(soloLoad) +
            ",\"solo_warmups\":2" +
            ",\"calib_prev\":" + fmt(prevCalib) +
            ",\"calib_now\":" + fmt(calibSec) +
            ",\"calib_f32_prev\":" + fmt(prevCalibF32) +
            ",\"calib_f32_now\":" + fmt(calibF32Sec) +
            ",\"verdict\":\"" + verdict + "\"}"
        }
        s""","adjudication":{"prev":"${prevPath.getOrElse("")}","movers":{${verdicts.mkString(",")}}$clampWarn}"""
      }
    }

    val json =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${minsJson(results)},"stats":${statsJson(results)},"errors":$errs,"warmup":$nWarmups,"runs":$nRuns,"cpu_calib_sec":${fmt(calibSec)},"cpu_calib_f32_sec":${fmt(calibF32Sec)},"aqe_primary":$aqePrimary$aqeBlock$adjBlock,"sf":"$sfDir"}"""
    // The driver's tail capture truncated BENCH_r05's stdout — also
    // write the full JSON to a file so the artifact can't be clipped.
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (json + "\n").getBytes("UTF-8"))
    } catch { case t: Throwable =>
      System.err.println(s"WARN Bench: could not write $outPath: $t") }
    // Print a COMPACT summary as the very last stdout write, AFTER
    // spark.stop(). Nine rounds of `parsed: null` established the
    // driver's tail-capture window is ~2 KB — the full ~12 KB stats
    // line always truncated mid-object and could never parse. The
    // final line must therefore be small (this one is ~250 B); the
    // full per-query stats payload lives in bench_out.json above,
    // which has been the reliable artifact since round 5.
    spark.stop()
    // r10 verdict: a truncated tail once cost 26 of 46 round-over-round
    // comparisons, so the round artifact must be self-contained. The
    // per-query MIN map (no stats) is ~1.4 KB for 46 queries — inside
    // the ~2 KB tail window the compact line was sized for.
    val compactHead =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir",""" +
      s""""runs":$nRuns,"queries_n":${results.size},"errors_n":${failed.size},""" +
      s""""aqe_primary":$aqePrimary,"""
    val compactTail = s""""full_stats":"$outPath"}"""
    val withQueries =
      compactHead + s""""queries":${minsJson(results)},""" + compactTail
    // guard: if the headline set ever grows the line past the tail
    // window, drop the per-query map rather than truncate mid-JSON
    val compact =
      if (withQueries.length <= 1900) withQueries
      else compactHead + compactTail
    println(compact)
    System.out.flush()
  }
}
