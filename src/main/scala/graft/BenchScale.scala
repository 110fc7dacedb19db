package graft

import org.apache.spark.sql.SparkSession

/** Scaling probe: times the heaviest catalog queries across every
  * available scale factor and reports per-decade scaling exponents
  * (slope of log t vs log SF). The per-SF bench can't see super-linear
  * blowups — a quadratic subtree looks fine at any single scale — but
  * the exponent can: ~1 is linear, noticeably above ~1.3 on the top
  * decade means a term that will not survive a 100× scale-up. Small
  * SFs are overhead-dominated (exponents below 1 there are fixed-cost
  * amortization, not sub-linearity), so the top decade is the signal.
  *
  * The probed set is the catalog's heavy tail plus the queries whose
  * cost terms are structurally at risk: the graph queries' co-purchase
  * edge build is per-order quadratic in items-per-order (bounded in
  * TPC-H-shaped data — this probe is the proof), and the corpus
  * text/dedup shuffles grow with total token count.
  */
object BenchScale {
  val probes: Seq[String] = Seq(
    "pagerank_fixed", "graph_clustering_coeff", "graph_triangle_count",
    "dedup_cluster_cc", "bucketed_join_colocated", "text_tfidf_topk",
    "dedup_cdc_chunks", "heavy_hitters_words", "ann_ivf_kmeans",
    "dedup_semdedup", "text_gopher_repetition", "dedup_repeated_spans",
    "dedup_minhash_lsh", "q5_region_revenue",
    // round-10 cohort 2: the scale-sized SemDeDup (the fix for the
    // r9 1.27 exponent — its row is the proof the cells ∝ n rule
    // holds |cell| constant), plus the next tier by absolute cost so
    // the exponent net catches the next super-linear term before a
    // verdict does.
    "dedup_semdedup_scaled", "sql_tpch_q18",
    "entity_resolution_e2e", "events_funnel", "graph_truss_decomposition",
    // round-10 cohort 3: the next headline tier by absolute cost —
    // the capped wedge-join similarity (the most expensive headline
    // query), the multi-stage curation composite, the PPJoin n-gram
    // verify path, the broadcast decontamination probe, the
    // trigram-explode scorer, and the stateful sessionizer
    "graph_common_neighbors_capped", "corpus_curate",
    "dedup_ngram_jaccard", "decontaminate", "text_charlm_surprisal",
    "events_sessionize",
    // round-11: the IVFADC compositions — probed so their exponents
    // are measured against the IVF row's ~0.2 (the candidate scan
    // must stay cell-pruned, never full-corpus). The residual variant
    // shares the plan class, so it rides the probe but not the
    // headline set (ann_ivfpq_adc covers the class there).
    "ann_ivfpq_adc", "ann_ivfpq_residual", "ann_ivfpq_persisted",
    // round-12: the self-routing cluster variant — on the saturated
    // synthetic corpus it must pick the LSH pair path and hold the
    // sf1→sf3 exponent near-linear where the exact-join sibling
    // measured 1.91; its routing metric rides along as the (cheap)
    // diagnostic row.
    "dedup_cluster_cc_auto", "dedup_prefix_saturation",
    // round-12: the sorted-neighborhood entity-resolution variant —
    // the linear-candidate fix for the measured n² growth of the
    // fixed-key blocking in entity_resolution_e2e (sf1→sf3 exponent
    // 1.65); its row is the proof the 8n candidate rule holds.
    "entity_resolution_snm",
    // round-12: the hierarchical SemDeDup — the flat scaled variant's
    // sf3→sf10 slope measured 1.31 (k ∝ n makes its n×k train/assign
    // scans quadratic, crossover at n ≈ targetCell²/2 as its Scaladoc
    // predicted); the two-level quantizer costs n·O(√k) and this row
    // is the proof it holds the slope down where the flat form bends.
    "dedup_semdedup_hier",
    // round-14: the stop-chunk-suppressed CDC dedup — the linear
    // sibling of dedup_cdc_chunks, whose chunk-hash self-join bound
    // the r14 census measured exactly ∝ n² on this templated corpus
    // (242/720/2411 cand/doc at sf1/3/10; the uncapped row is now
    // census-fenced at sf ≥ 1). This row is the proof the ≤ 64-doc
    // chunk cap holds the slope down.
    "dedup_cdc_chunks_capped",
    // round-15: the two headline rows whose curves had literally never
    // been measured with the real plan executing — both were hollow
    // under the count() basis through r13 (countPrunedScans: langid
    // executes 1 of 3 leaves under count(), asof 1 of 2) and got real
    // only with the r14 toRdd shift. langid's profile-train +
    // re-explode shape is the exact class that regressed charlm in r6.
    "text_langid_ngram", "events_asof_join")

  private def fmt(d: Double) =
    String.format(java.util.Locale.US, "%.6f", Double.box(d))

  /** Render the run's measured rows as the artifact JSON. Pure — the
    * merge/clobber discipline around it is only as safe as this text
    * being valid JSON, so it is spec-pinned (BenchScaleMergeSpec).
    * Rows: (query, per-SF (sf, seconds) cells — NEVER empty; callers
    * drop fully-fenced rows, see main — trimmed?). `trimmed` = the
    * quadratic fence removed dirs, so the two largest KEPT cells span
    * a different decade than the board's adjudicated sf1->sf3 slope:
    * the exponent is emitted as null and the merge's null-never-
    * overwrites rule preserves the measured slope.
    */
  def renderArtifact(rows: Seq[(String, Seq[(Double, Double)], Boolean)],
                     nRuns: Int): String = {
    val json = rows.map { case (name, perSf, trimmed) =>
      // per-CELL basis stamps alongside each timing: a partial probe
      // (SCALE_ONLY with a subset of SF dirs) merges into a row whose
      // surviving cells may be stale count()-era measurements, and a
      // row-level basis alone would misattribute their provenance
      // (advisor r15). The merge recomputes the row-level field from
      // the per-cell stamps after every merge.
      val times = perSf.map { case (sf, t) =>
        "\"sf" + sf + "\":" + fmt(t) + ",\"sf" + sf + "_basis\":\"toRdd\""
      }
      val sorted = perSf.sortBy(_._1)
      val exp =
        if (trimmed || sorted.size < 2) "null"
        else {
          val (sfLo, tLo) = sorted(sorted.size - 2)
          val (sfHi, tHi) = sorted.last
          fmt(math.log(tHi / tLo) / math.log(sfHi / sfLo))
        }
      // per-row runs: the merge preserves rows from prior runs with
      // different run counts, so the top-level "runs" only describes
      // the latest contribution — the row-level field is the one that
      // stays true for surviving cells.
      // "basis" (row level): correct for THIS fresh row (every cell
      // here was just timed via toRdd.count). After a merge it is
      // only kept when every surviving cell carries a matching
      // per-cell stamp — see mergeArtifacts.
      "\"" + name + "\":{" + times.mkString(",") +
        ",\"top_decade_exponent\":" + exp + ",\"runs\":" + nRuns +
        ",\"basis\":\"toRdd\"}"
    }.mkString("{", ",", "}")
    // top-level runs = the LATEST merge contribution only (per-row
    // "runs" is authoritative for cells that survived from older runs)
    s"""{"metric":"scaling","runs":$nRuns,"queries":$json}"""
  }

  /** Merge a fresh scaling run into the existing artifact text.
    * Per-query, the new run's fields override same-named fields on
    * the old row FIELD-BY-FIELD, with JSON nulls never overwriting
    * (a single-SF probe has no exponent and must not blank a
    * measured slope); rows and cells the run did not probe survive
    * verbatim. Exponents are never recomputed from merged cells —
    * mixing JVM populations across days would fabricate a slope no
    * single run measured. Throws on unparseable input (the caller
    * falls back to overwrite, loudly).
    */
  def mergeArtifacts(prevJson: String, nowJson: String,
                     nRuns: Int): String = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val prev = om.readTree(prevJson)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val now = om.readTree(nowJson)
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val pq = prev.`with`("queries"); val nq = now.`with`("queries")
    // Row-level "basis" is only true when EVERY timing cell on the
    // merged row carries a matching per-cell stamp: a partial probe
    // merging into a row with surviving count()-era cells must not
    // label the whole row toRdd (advisor r15). Cells are the keys
    // shaped `sf<number>` (sf1_to_sf3_exponent has an underscore and
    // is excluded by the pattern).
    val cellKey = "^sf[0-9.]+$".r
    def restampBasis(
        row: com.fasterxml.jackson.databind.node.ObjectNode): Unit = {
      val names = {
        val b = Seq.newBuilder[String]
        val it = row.fieldNames(); while (it.hasNext) b += it.next()
        b.result()
      }
      val cells = names.filter(n => cellKey.findFirstIn(n).isDefined)
      val bases = cells.map(c => Option(row.get(c + "_basis"))
        .filterNot(_.isNull).map(_.asText()))
      if (cells.nonEmpty && bases.forall(_.contains("toRdd")))
        { row.put("basis", "toRdd"); () }
      else { row.remove("basis"); () }
    }
    val it = nq.fieldNames()
    val touched = Seq.newBuilder[String]
    while (it.hasNext) {
      val name = it.next()
      touched += name
      (pq.get(name), nq.get(name)) match {
        case (old: com.fasterxml.jackson.databind.node.ObjectNode,
              neu: com.fasterxml.jackson.databind.node.ObjectNode) =>
          val fit = neu.fieldNames()
          while (fit.hasNext) {
            val f = fit.next()
            if (!neu.get(f).isNull) { old.set(f, neu.get(f)); () }
          }
        case _ => pq.set(name, nq.get(name)); ()
      }
    }
    // restamp only rows this merge touched — untouched rows keep
    // whatever provenance (note/basis fields) earlier rounds recorded
    touched.result().foreach { name =>
      pq.get(name) match {
        case row: com.fasterxml.jackson.databind.node.ObjectNode =>
          restampBasis(row)
        case _ => ()
      }
    }
    prev.put("runs", nRuns)
    om.writeValueAsString(prev)
  }

  def main(args: Array[String]): Unit = {
    val sfDirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
               "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_SCALE_RUNS", "3").toInt
    // Shuffle-partition override for spill-band probes: the default
    // (= cpus) sizes per-partition working sets for the common case;
    // the corpus-explode rows at sf3 carry ~1 GiB/partition at 32,
    // and raising the count trades scheduling overhead for staying
    // inside the execution-memory band (measured per row below).
    val shuffleParts =
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sfOf(dir: String): Double =
      dir.split("sf").last.toDouble // ".../sf0.01" -> 0.01

    // Dev loop: SPARK_GRAFT_SCALE_ONLY=a,b probes just those queries
    // (unset -> full probe set; the driver never sets it).
    val selected = sys.env.get("SPARK_GRAFT_SCALE_ONLY") match {
      case Some(csv) =>
        val want = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
        probes.filter(want.contains)
      case None => probes
    }
    // JVM-wide warmup OUTSIDE any timed row: the first query of the
    // first SF otherwise absorbs one-time infra (FS listing, codegen
    // framework, broadcast machinery) and its smallest-SF cell lands
    // 5-10x high in the artifact (r11: truss 13.4s at sf0.001 vs 2.2s
    // at sf0.01). Per-query warmup runs below still cover per-plan
    // codegen; this covers the per-JVM part.
    sfDirs.headOption.foreach { dir =>
      try SparkEntry.queries("q1_agg")(spark, dir).count()
      catch { case _: Throwable => () }
    }
    // The measured-quadratic definition rows (Verify.measuredQuadratic)
    // have adjudicated sf1/sf3 exponents on the board already (1.90,
    // 1.91, 1.24, 1.65 — PLANS.md); re-probing them at sf ≥ 1 costs
    // minutes to re-measure a documented pathology, so the sweep stops
    // at sf < 1 for them unless SPARK_GRAFT_INCLUDE_QUADRATIC=true.
    // The artifact merge preserves their existing large-SF cells.
    val includeQuadratic =
      sys.env.getOrElse("SPARK_GRAFT_INCLUDE_QUADRATIC", "false") == "true"

    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT",
      "BENCH_SFSCALE.json")
    // Validate-then-merge-then-write; called INCREMENTALLY after every
    // completed row as well as at the end. The artifact used to be
    // written only after the whole sweep: a JVM death mid-sweep (r14:
    // dedup_repeated_spans crashed the process at sf10 on
    // maxResultSize) lost every cell already measured that day —
    // including two complete rows from other queries. The merge is
    // idempotent, so re-publishing the full row set at the end is
    // safe.
    def publish(rows: Seq[(String, Seq[(Double, Double)], Boolean)],
                quiet: Boolean): Unit = {
      val out = renderArtifact(rows, nRuns)
      // The overwrite fallback is only safe when the NEW text is the
      // parseable side — if THIS run produced unparseable JSON,
      // writing it would clobber a good board with garbage (the exact
      // failure the merge exists to prevent).
      val newParses =
        try { new com.fasterxml.jackson.databind.ObjectMapper().readTree(out)
              true }
        catch { case _: Exception => false }
      if (!newParses) {
        System.err.println(s"[scale] ERROR: this run's own JSON does " +
          s"not parse; refusing to write $outPath. Unwritten payload:\n$out")
      } else {
        val merged = {
          val p = java.nio.file.Paths.get(outPath)
          if (!java.nio.file.Files.exists(p)) out
          else try mergeArtifacts(java.nio.file.Files.readString(p), out,
            nRuns)
          catch {
            case e: Exception => // old side unparseable -> overwrite, loudly
              System.err.println(s"[scale] WARN: could not merge into " +
                s"existing $outPath (${e}); overwriting")
              out
          }
        }
        java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
          (merged + "\n").getBytes("UTF-8"))
        if (!quiet) println(merged)
      }
    }

    val rows = selected.filter(SparkEntry.queries.contains).flatMap { name =>
      val fn = SparkEntry.queries(name)
      val trimmed = !includeQuadratic &&
        Verify.measuredQuadratic.contains(name) &&
        sfDirs.exists(d => sfOf(d) >= 1.0)
      val dirsFor =
        if (!trimmed) sfDirs
        else {
          System.err.println(s"[scale] $name: skipping sf>=1 dirs " +
            "(measured-quadratic definition row; " +
            "SPARK_GRAFT_INCLUDE_QUADRATIC=true to include)")
          sfDirs.filter(d => sfOf(d) < 1.0)
        }
      // A fence that removes EVERY dir (the sweep was invoked with only
      // sf>=1 dirs — the sf1/sf3 recipe the fence targets) leaves
      // nothing measured: emit no row at all. A row with zero cells
      // would render as `{,...}` (invalid JSON) and its merge would
      // clobber the board via the overwrite fallback.
      if (dirsFor.isEmpty) {
        System.err.println(s"[scale] $name: fence removed every dir; " +
          "no row emitted (existing board row survives the merge)")
        None
      } else {
        val perSf = dirsFor.map { dir =>
          def timed(): Double = {
            spark.catalog.clearCache()
            spark.sparkContext.getPersistentRDDs.values
              .foreach(_.unpersist(blocking = false))
            val t0 = System.nanoTime()
            // toRdd, not count(): count() re-optimizes and prunes
            // cardinality-preserving tails, making hollow cells that
            // stay flat across SFs (the r14 charlm/gopher finding —
            // see Bench.timed)
            fn(spark, dir).queryExecution.toRdd.count()
            (System.nanoTime() - t0) / 1e9
          }
          timed() // warmup
          val t = (1 to nRuns).map(_ => timed()).min
          System.err.println(s"[scale] $name ${sfOf(dir)}: ${f"$t%.3f"}s")
          dir -> t
        }
        val row = (name, perSf.map { case (d, t) => (sfOf(d), t) }, trimmed)
        publish(Seq(row), quiet = true) // survive a mid-sweep JVM death
        Some(row)
      }
    }

    // MERGE into an existing artifact instead of clobbering it: a
    // SPARK_GRAFT_SCALE_ONLY dev run with the default output path once
    // replaced the full 31-row board with a single-query file (r12,
    // commit 921fd90). Per-query, this run's sf cells and exponents
    // override the old row's same-named fields; rows (and cells) this
    // run did not probe are preserved verbatim. Exponents are never
    // recomputed from merged cells — mixing JVM populations across
    // days would fabricate a slope no single run measured.
    publish(rows, quiet = false)
    spark.stop()
  }
}
