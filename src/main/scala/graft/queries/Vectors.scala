package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.Similarity

/** Similarity-search queries over `embeddings` (vec_id, embedding
  * Array[Float] 64-dim, label). Quantized integer cosine keeps every
  * value bit-identical to the DuckDB oracle.
  */
object Vectors {
  type Q = (SparkSession, String) => DataFrame

  /** Per-index-dir build locks: same-JVM shared-index builders must
    * serialize (see sharedIvfPqIndex — two pool threads once built
    * into one tmp dir and published a doubled index).
    */
  private val indexBuildLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def prepped(s: SparkSession, d: String): DataFrame =
    Similarity.prep(t(s, d, "embeddings"), "vec_id", "embedding", Some("label"))

  val queries: Map[String, Q] = Map(
    "embedding_label_centroids" -> ((s, d) => {
      // V3: per-label centroid of the first 4 embedding dims — the
      // class-prototype builder (SemDeDup cells, nearest-centroid
      // classification, drift monitors all start here). Float dims
      // are fixed-pointed to e6 BEFORE summing, so the per-label sum
      // is order-independent bigint arithmetic — a raw float sum
      // would drift with partition count. One narrow projection, one
      // aggregate, no shuffle beyond the label groupBy.
      def fp(i: Int) =
        round(lit(1000000.0) *
          element_at(col("embedding"), i).cast("double")).cast("long")
      val agged = t(s, d, "embeddings")
        .select(col("label"), fp(1).as("x1"), fp(2).as("x2"),
                fp(3).as("x3"), fp(4).as("x4"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"), sum(col("x1")).as("s1"),
             sum(col("x2")).as("s2"), sum(col("x3")).as("s3"),
             sum(col("x4")).as("s4"))
      def mean(sc: String) =
        round(col(sc).cast("double") / col("n").cast("double"), 0)
          .cast("long")
      agged.select(col("label"), col("n"),
          mean("s1").as("c1_fp_e6"), mean("s2").as("c2_fp_e6"),
          mean("s3").as("c3_fp_e6"), mean("s4").as("c4_fp_e6"))
        .orderBy("label")
    }),
    "ann_cosine_topk" -> ((s, d) => {
      val corpus = prepped(s, d)
      Similarity.cosineTopK(corpus.where(col("id") < 5), corpus, 10)
        .select(col("query_id"), col("vec_id"), col("rank"), col("cos"))
        .orderBy("query_id", "rank")
    }),
    "ann_ivf_label" -> ((s, d) => {
      val corpus = prepped(s, d)
      Similarity.cellTopK(corpus.where(col("id") < 5), corpus, 5)
        .select(col("query_id"), col("vec_id"), col("rank"), col("cos"))
        .orderBy("query_id", "rank")
    }),
    "ann_pq_adc" -> ((s, d) => {
      // product quantization + ADC scan + exact re-rank
      // (operators/Pq): every step — deterministic seeds, one Lloyd
      // refinement over exact integer sums, integer-L2 encode, ADC
      // lookups, exact re-rank — is integer arithmetic plus single
      // IEEE divisions, so the full pipeline is hash-matched against
      // a DuckDB mirror; recall and score-exactness are additionally
      // pinned against brute force in PqSpec.
      val corpus = prepped(s, d)
      graft.operators.Pq.topK(corpus.where(col("id") < 5), corpus, 10)
        .select(col("query_id"), col("vec_id"), col("rank"), col("cos"))
        .orderBy("query_id", "rank")
    }),
    "ann_lsh_hyperplane" -> ((s, d) => {
      // Scale path: sign-random-projection buckets (md5-derived ±1
      // planes shared verbatim with the oracle SQL).
      val corpus = prepped(s, d)
      Similarity.srpTopK(corpus.where(col("id") < 5), corpus, 5,
          Similarity.hyperplanes(Planes, Dim))
        .select(col("query_id"), col("vec_id"), col("rank"), col("cos"))
        .orderBy("query_id", "rank")
    }),
    "dedup_embedding_cosine" -> ((s, d) =>
      Similarity.nearDupPairs(prepped(s, d), 0.45)
        .orderBy("id1", "id2")),
    "dedup_semdedup" -> ((s, d) =>
      // SemDeDup: near-dup pairs restricted to learned k-means cells
      // (operators/Similarity.semDedupPairs) — the bucketed scale path
      // next to dedup_embedding_cosine's exhaustive baseline; same
      // 0.45 threshold, cells = 8, so the result is exactly the
      // baseline's pairs whose endpoints landed in one cell.
      Similarity.semDedupPairs(prepped(s, d), cells = 8, threshold = 0.45)
        .select(col("id1"), col("id2"), col("cell"), col("cos"))
        .orderBy("id1", "id2")),
    "dedup_semdedup_scaled" -> ((s, d) =>
      // The SCALE path next to the pinned cells=8 row: cells derived
      // from the corpus count (cells = max(8, ceil(n/250))) so |cell|
      // stays ~constant and the within-cell pair term linear as the
      // corpus grows — the sizing rule semDedupPairs's contract
      // promises, now benched and oracle-checked (the DuckDB mirror
      // computes the identical cells via a scalar subquery). At the
      // sf0.01 gate n=500 → cells=8, so this row doubles as a
      // consistency pin against dedup_semdedup.
      Similarity.semDedupPairsScaled(prepped(s, d), targetCell = 250,
          threshold = 0.45)
        .select(col("id1"), col("id2"), col("cell"), col("cos"))
        .orderBy("id1", "id2")),
    "dedup_semdedup_hier" -> ((s, d) =>
      // The HIERARCHICAL scale path: same cells = max(8, ceil(n/250))
      // pair math as dedup_semdedup_scaled, but a two-level quantizer
      // (⌈√k⌉ coarse cells, fine cells trained/assigned within each
      // coarse cell) cuts training + assignment from n·k to n·O(√k) —
      // the flat variant's measured sf3→sf10 slope is 1.31 because
      // k ∝ n makes its n×k scans quadratic. The DuckDB oracle
      // mirrors both levels step-for-step (seeding by row_number,
      // quantized-mean Lloyd, integer dots), so the variant is
      // hash-checked at every SF.
      Similarity.semDedupPairsHier(prepped(s, d), targetCell = 250,
          threshold = 0.45)
        .orderBy("id1", "id2")),
    "ann_ivf_kmeans" -> ((s, d) => {
      // REAL IVF: deterministic seeds (vec_id < 8) -> one Lloyd
      // refinement over quantized integer means -> nprobe=2 probing.
      // The learned-coarse-quantizer path (vs. ann_ivf_label's
      // precomputed cells); centroids broadcast, corpus never shuffles.
      val corpus = prepped(s, d)
      graft.operators.Ivf.topK(corpus.where(col("id") < 5), corpus, 5,
          cells = 8, nprobe = 2)
        .select(col("query_id"), col("vec_id"), col("rank"), col("cos"))
        .orderBy("query_id", "rank")
    }),
    "ann_ivfpq_adc" -> ((s, d) => {
      // IVFADC — the production ANN composition: IVF cell probing
      // prunes the scan to nprobe cells, PQ ADC scores only the
      // surviving candidates, exact re-rank on the shortlist. Searches
      // the SHARED offline index (training + encoding are the
      // build-once step a deployment amortizes — and with them inside
      // the timed query this row dispersed 10.3-38.7 s across JVMs at
      // sf3, drowning the scan it exists to watch). Contrast with
      // ann_ivfpq_persisted: this row reads the encoded table with NO
      // static cell filter, so the cell prune happens in the broadcast
      // hash join on the scanned rows (PlanShapeSpec pins that join) —
      // the in-memory/scan-all-score-probed shape — while persisted
      // adds listing-time partition pruning (reads only probed cells).
      // The fully in-query composition (train+encode+search one plan)
      // remains covered by ann_ivfpq_residual and ann_ivf_kmeans.
      // Same math either way (the build is deterministic) → same
      // oracle, hash-matched.
      val corpus = prepped(s, d)
      val idxRoot = sharedIvfPqIndex(s, d, corpus)
      graft.operators.Pq.searchIvfPq(corpus.where(col("id") < 5),
          s.read.parquet(idxRoot.resolve("encoded").toString),
          s.read.parquet(idxRoot.resolve("cents").toString),
          s.read.parquet(idxRoot.resolve("cb").toString), corpus,
          k = 10, nprobe = 2, m = 8, codes = 16, rerank = 50)
        .select(col("query_id"), col("vec_id"), col("rank"), col("cos"))
        .orderBy("query_id", "rank")
    }),
    "ann_ivfpq_persisted" -> ((s, d) => {
      // The PERSISTED-index IVFADC path — the deployment shape: the
      // encoded corpus is written partitionBy(cell) (the offline build
      // a production system runs once), read back, and searched with a
      // STATIC probed-cells partition filter, so unprobed cells' files
      // are never read (PlanShapeSpec pins the literal filter;
      // WorkCountSpec gates partitions READ). Same math as
      // ann_ivfpq_adc → same oracle, hash-matched.
      val corpus = prepped(s, d)
      val idxRoot = sharedIvfPqIndex(s, d, corpus)
      val qs = corpus.where(col("id") < 5)
      val cents = s.read.parquet(idxRoot.resolve("cents").toString)
      // STATIC listing-time pruning of the cell-partitioned index:
      // the probed cell ids (bounded by nprobe·|queries|) become a
      // literal partition filter — Catalyst's DPP planned away to
      // `dynamicpruningexpression(true)` here and read all 8 cells
      // (see Pq.probedCellsOf). PlanShapeSpec pins the literal IN;
      // WorkCount's ivf probe measures 2-of-8 partitions read for a
      // one-query batch.
      val probed = graft.operators.Pq.probedCellsOf(qs, cents, nprobe = 2)
      graft.operators.Pq.searchIvfPq(qs,
          s.read.parquet(idxRoot.resolve("encoded").toString)
            .where(col("cell").isin(probed.map(Int.box): _*)),
          cents,
          s.read.parquet(idxRoot.resolve("cb").toString), corpus,
          k = 10, nprobe = 2, m = 8, codes = 16, rerank = 50)
        .select(col("query_id"), col("vec_id"), col("rank"), col("cos"))
        .orderBy("query_id", "rank")
    }),
    "ann_ivfpq_residual" -> ((s, d) => {
      // IVFADC with RESIDUAL encoding (Pq.ivfResidualTopK) — the exact
      // Jégou §IV / FAISS-IVFADC form: PQ codes quantize v − centroid,
      // and the ADC estimate decomposes into the exact per-(query,
      // probed-cell) q·cv term plus the residual LUT sum. All integer
      // arithmetic; the oracle composes the IVF chain, the residual
      // subtraction, and the PQ chain over residuals.
      val corpus = prepped(s, d)
      graft.operators.Pq.ivfResidualTopK(corpus.where(col("id") < 5),
          corpus, 10, cells = 8, nprobe = 2)
        .select(col("query_id"), col("vec_id"), col("rank"), col("cos"))
        .orderBy("query_id", "rank")
    })
  )

  /** The SHARED on-disk IVF-PQ index for `d` — built at most once per
    * (sf, params) and reused across runs and JVMs: the deployment
    * contract ("build once, search many"), and what the bench rows'
    * exponents claim to measure (timed reruns hit the marker and pay
    * only the online search). The build is deterministic (seeded
    * k-means, integer codebooks), so any JVM's build is
    * interchangeable; publication is atomic (build into a
    * PID-suffixed tmp dir, rename into place), so two concurrent JVMs
    * (Bench + Verify on one sf) either both reuse or one wins the
    * rename and the other adopts the winner's copy. All three offline
    * frames persist (encoded corpus partitionBy(cell), centroids,
    * codebook); the marker carries key+params so a stale or
    * foreign-version dir is rebuilt, never trusted. Returns the root
    * to read `encoded`/`cents`/`cb` from.
    */
  private def sharedIvfPqIndex(s: SparkSession, d: String,
                               corpus: DataFrame): java.nio.file.Path = {
    val dir = graft.Scratch.sharedDir("graft_ivfpq_idx", d)
    val marker = dir.resolve("_GRAFT_INDEX_OK")
    // v=3: v=2 indexes may be race-corrupted (see below) — never trust
    val tag = s"$d|cells=8|m=8|codes=16|v=3"
    def markerOk = java.nio.file.Files.exists(marker) &&
      java.nio.file.Files.readString(marker) == tag
    if (markerOk) return dir
    // SAME-JVM builders must serialize: Verify runs ann_ivfpq_adc and
    // ann_ivfpq_persisted CONCURRENTLY from its thread pool, and the
    // PID-suffixed tmp dir only separates JVMs — in r16 both threads
    // of one Verify JVM built into the same tmp path, their two
    // write jobs interleaved `_temporary` staging, and the published
    // index held every vector TWICE (1000 rows / 500 distinct ids at
    // sf0.01), shifting ADC top-k results off the oracle. The lock
    // makes the second thread wait and take the marker fast-path.
    val lock = Vectors.indexBuildLocks
      .computeIfAbsent(dir.toString, _ => new Object)
    lock.synchronized {
      if (markerOk) dir else {
        // pid + thread id: unique even among same-JVM builders of
        // DIFFERENT dirs sharing this code path
        val tmp = java.nio.file.Paths.get(dir.toString + ".tmp." +
          ProcessHandle.current().pid() + "." +
          Thread.currentThread().getId)
        val (cents, cb, encoded) =
          graft.operators.Pq.buildIvfPqIndex(corpus, cells = 8, m = 8,
            codes = 16)
        encoded.write.mode("overwrite").partitionBy("cell")
          .parquet(tmp.resolve("encoded").toString)
        cents.write.mode("overwrite").parquet(tmp.resolve("cents").toString)
        cb.write.mode("overwrite").parquet(tmp.resolve("cb").toString)
        // publish-time validation: the encoded table must hold each
        // corpus vector exactly once — the r16 corruption published a
        // doubled index behind a green marker and poisoned every
        // subsequent reuse, so fail HERE, before the marker exists
        val nEnc = s.read.parquet(tmp.resolve("encoded").toString).count()
        val nCorpus = corpus.count()
        require(nEnc == nCorpus,
          s"IVF-PQ index build wrote $nEnc encoded rows for $nCorpus " +
            s"corpus vectors (tmp=$tmp) — refusing to publish")
        java.nio.file.Files.writeString(tmp.resolve("_GRAFT_INDEX_OK"), tag)
        if (!markerOk) { // another JVM may have published meanwhile
          graft.Scratch.deleteRecursively(dir) // stale/foreign leftovers
          try java.nio.file.Files.move(tmp, dir,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          catch { case _: java.nio.file.FileSystemException => () }
        }
        if (markerOk) { graft.Scratch.deleteRecursively(tmp); dir }
        else tmp // lost a pathological race: search our private copy
      }
    }
  }

  private val Planes = 8
  private val Dim = 64

  /** Shared oracle CTE: quantized vectors + exact integer norms. */
  private val prepSql =
    """e AS (SELECT vec_id, label,
      |         list_transform(embedding,
      |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS v
      |       FROM embeddings),
      |n AS (SELECT vec_id, label, v,
      |         CAST(list_sum(list_transform(v, p -> p * p)) AS BIGINT) AS n2
      |      FROM e)""".stripMargin

  private val cosSql =
    """CAST(CAST(list_sum(list_transform(range(1, len(q.v) + 1),
      |        k -> q.v[k] * c.v[k])) AS BIGINT) AS DOUBLE)
      | / sqrt(CAST(q.n2 * c.n2 AS DOUBLE))""".stripMargin

  /** Quantized-cosine SQL for arbitrary (vector, norm) column pairs. */
  private def cosFor(va: String, vb: String, n2a: String, n2b: String) =
    s"""CAST(CAST(list_sum(list_transform(range(1, len($va) + 1),
       |        k -> $va[k] * $vb[k])) AS BIGINT) AS DOUBLE)
       | / sqrt(CAST($n2a * $n2b AS DOUBLE))""".stripMargin

  /** Shared IVF coarse-quantizer CTE chain (mirrors `Ivf.assign` +
    * `Ivf.refine`): seeds = vec_id < `cellsExpr` → assign → one
    * quantized-mean Lloyd step → re-assign. Ends with
    * `asg(vec_id, v, n2, cell)` and `cn(cell, cv, cn2)`; expects
    * `$prepSql` above it. `cellsExpr` is any SQL scalar — a literal
    * for the pinned queries, a scalar subquery for the scale-sized
    * SemDeDup variant.
    */
  private def ivfAssignSqlFor(cellsExpr: String) =
    s"""seeds AS (SELECT CAST(vec_id AS INT) AS cell, v AS cv, n2 AS cn2
       |          FROM n WHERE vec_id < ($cellsExpr)),
       |s0 AS (SELECT x.vec_id, x.v, x.n2, s.cell,
       |         row_number() OVER (PARTITION BY x.vec_id
       |           ORDER BY ${cosFor("x.v", "s.cv", "x.n2", "s.cn2")} DESC,
       |                    s.cell) AS rn
       |       FROM n x CROSS JOIN seeds s),
       |asg0 AS (SELECT vec_id, v, n2, cell FROM s0 WHERE rn = 1),
       |comp AS (SELECT cell, k AS pos,
       |           CAST(floor(CAST(sum(v[k]) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cq
       |         FROM asg0, UNNEST(range(1, 65)) AS r(k) GROUP BY 1, 2),
       |cents AS (SELECT cell, list(cq ORDER BY pos) AS cv FROM comp GROUP BY 1),
       |cn AS (SELECT cell, cv,
       |         CAST(list_sum(list_transform(cv, p -> p * p)) AS BIGINT) AS cn2
       |       FROM cents),
       |s1 AS (SELECT x.vec_id, x.v, x.n2, c.cell,
       |         row_number() OVER (PARTITION BY x.vec_id
       |           ORDER BY ${cosFor("x.v", "c.cv", "x.n2", "c.cn2")} DESC,
       |                    c.cell) AS rn
       |       FROM n x CROSS JOIN cn c),
       |asg AS (SELECT vec_id, v, n2, cell FROM s1 WHERE rn = 1)""".stripMargin

  private lazy val ivfAssignSql = ivfAssignSqlFor("8")

  /** Scale-sized cell count, mirroring
    * `Similarity.semDedupPairsScaled`: max(8, ceil(n / 250)). Integer
    * ceil on both sides — (n + 249) // 250 in Scala, ceil(n/250.0)
    * in SQL — agree for all positive n.
    */
  private val scaledCellsSql =
    "SELECT GREATEST(8, CAST(ceil(count(*) / 250.0) AS BIGINT)) FROM embeddings"

  /** Hierarchical-quantizer parameters, mirroring
    * `Similarity.semDedupPairsHier`: k = the scale-sized cell count,
    * k1 = ⌈√k⌉ coarse cells, f = ⌈k/k1⌉ fine cells per coarse cell.
    * ceil(sqrt()) agrees across engines (IEEE sqrt is correctly
    * rounded); f uses integer ceil on both sides. The ceil-division
    * is spelled floor((a)/CAST(b AS DOUBLE)) rather than DuckDB's
    * `//` operator, which at the start of a continuation line reads
    * like a C-style comment and invites a silent-miscompile edit.
    * Double division is exact here: a, b ≪ 2^53 and when a/b lands
    * on an integer the quotient is exactly representable.
    */
  private val hierParamsSql =
    s"""hp AS (SELECT ($scaledCellsSql) AS k),
       |hp2 AS (SELECT k,
       |          CAST(ceil(sqrt(CAST(k AS DOUBLE))) AS BIGINT) AS k1,
       |          CAST(floor(
       |            (k + CAST(ceil(sqrt(CAST(k AS DOUBLE))) AS BIGINT) - 1)
       |            / CAST(ceil(sqrt(CAST(k AS DOUBLE))) AS DOUBLE)
       |          ) AS BIGINT) AS f
       |        FROM hp)""".stripMargin

  /** Fine-level CTE chain for the hierarchical SemDeDup: expects the
    * coarse chain (`ivfAssignSqlFor(k1)` → `asg`) above it. Seeds =
    * the f lowest-vec_id members per coarse cell, one quantized-mean
    * Lloyd step, reassignment — all joined on `ccell` so every step
    * mirrors `Similarity.assignWithin`/`refineWithin` exactly. The
    * heavy membership frames are MATERIALIZED (DuckDB 1.0 inlines
    * every CTE reference — the round-12 cluster_cc lesson).
    */
  private lazy val hierFineSql =
    s"""casg AS MATERIALIZED (SELECT vec_id, v, n2, cell AS ccell FROM asg),
       |fseed0 AS (SELECT ccell, vec_id, v, n2,
       |             row_number() OVER (PARTITION BY ccell
       |               ORDER BY vec_id) - 1 AS j
       |           FROM casg),
       |fseeds AS (SELECT ccell, CAST(j AS INT) AS j, v AS cv, n2 AS cn2
       |           FROM fseed0 WHERE j < (SELECT f FROM hp2)),
       |fs0 AS (SELECT x.vec_id, x.v, x.n2, x.ccell, s.j,
       |          row_number() OVER (PARTITION BY x.vec_id
       |            ORDER BY ${cosFor("x.v", "s.cv", "x.n2", "s.cn2")} DESC,
       |                     s.j) AS rn
       |        FROM casg x JOIN fseeds s ON s.ccell = x.ccell),
       |fa0 AS (SELECT vec_id, v, n2, ccell, j FROM fs0 WHERE rn = 1),
       |fcomp AS (SELECT ccell, j, k AS pos,
       |            CAST(floor(CAST(sum(v[k]) AS DOUBLE) / count(*) + 0.5)
       |              AS BIGINT) AS cq
       |          FROM fa0, UNNEST(range(1, 65)) AS r(k) GROUP BY 1, 2, 3),
       |fcents AS (SELECT ccell, j, list(cq ORDER BY pos) AS cv
       |           FROM fcomp GROUP BY 1, 2),
       |fcn AS (SELECT ccell, j, cv,
       |          CAST(list_sum(list_transform(cv, p -> p * p)) AS BIGINT) AS cn2
       |        FROM fcents),
       |fs1 AS (SELECT x.vec_id, x.v, x.n2, x.ccell, c.j,
       |          row_number() OVER (PARTITION BY x.vec_id
       |            ORDER BY ${cosFor("x.v", "c.cv", "x.n2", "c.cn2")} DESC,
       |                     c.j) AS rn
       |        FROM casg x JOIN fcn c ON c.ccell = x.ccell),
       |fasg AS MATERIALIZED (SELECT vec_id, v, n2, ccell, j
       |                      FROM fs1 WHERE rn = 1)""".stripMargin

  /** IVFADC mirror, shared by the in-memory and persisted-index
    * paths (identical math - persistence only changes the layout).
    */
  private lazy val ivfPqAdcOracleSql: String = {
      // IVFADC mirror: the ann_ivf_kmeans coarse-quantizer chain
      // (ivfAssignSql → asg/cn) composed with the ann_pq_adc codebook/
      // encode chain (PQ CTEs prefixed p- to avoid the seeds clash),
      // with the ADC scan restricted to each query's nprobe=2 probed
      // cells via asg's cell tags. No residual encoding on either
      // side, so surviving candidates score identically to the flat
      // ADC scan. All integer arithmetic + single IEEE divisions.
      val l2 = (a: String, b: String) =>
        s"""list_sum(list_transform(range(1, 9),
           |        k -> ($a[k] - $b[k]) * ($a[k] - $b[k])))""".stripMargin
      s"""WITH $prepSql,
         |$ivfAssignSql,
         |subs AS (SELECT vec_id AS id, CAST(t.m AS INT) AS m,
         |           list_slice(v, t.m * 8 + 1, t.m * 8 + 8) AS sub
         |         FROM n, UNNEST(range(0, 8)) AS t(m)),
         |pseeds AS (SELECT m, CAST(id AS INT) AS code, sub AS c
         |           FROM subs WHERE id < 16),
         |a0 AS (SELECT id, m, sub, code FROM (
         |         SELECT s.id, s.m, s.sub, sd.code,
         |           row_number() OVER (PARTITION BY s.id, s.m
         |             ORDER BY ${l2("s.sub", "sd.c")}, sd.code) AS rn
         |         FROM subs s JOIN pseeds sd USING (m)) WHERE rn = 1),
         |rf AS (SELECT m, code, list(cq ORDER BY pos) AS c FROM (
         |         SELECT m, code, t.k AS pos,
         |           CAST(floor(CAST(sum(sub[t.k]) AS DOUBLE) / count(*)
         |                      + 0.5) AS BIGINT) AS cq
         |         FROM a0, UNNEST(range(1, 9)) AS t(k)
         |         GROUP BY 1, 2, 3) GROUP BY 1, 2),
         |cb AS (SELECT s.m, s.code, COALESCE(r.c, s.c) AS c
         |       FROM pseeds s LEFT JOIN rf r ON r.m = s.m AND r.code = s.code),
         |enc AS (SELECT id, m, code FROM (
         |          SELECT s.id, s.m, cb.code,
         |            row_number() OVER (PARTITION BY s.id, s.m
         |              ORDER BY ${l2("s.sub", "cb.c")}, cb.code) AS rn
         |          FROM subs s JOIN cb USING (m)) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, v AS qv, n2 AS qn2 FROM n
         |      WHERE vec_id < 5),
         |ps AS (SELECT q.query_id, c.cell,
         |         row_number() OVER (PARTITION BY q.query_id
         |           ORDER BY ${cosFor("q.qv", "c.cv", "q.qn2", "c.cn2")} DESC,
         |                    c.cell) AS rn
         |       FROM q CROSS JOIN cn c),
         |probe AS (SELECT query_id, cell FROM ps WHERE rn <= 2),
         |lut AS (SELECT qq.vec_id AS query_id, qq.n2 AS qn2, cb.m, cb.code,
         |          CAST(list_sum(list_transform(range(1, 9),
         |            k -> qq.v[cb.m * 8 + k] * cb.c[k])) AS BIGINT) AS pd
         |        FROM n qq CROSS JOIN cb WHERE qq.vec_id < 5),
         |adc AS (SELECT l.query_id, e2.id AS vec_id, c.n2,
         |          CAST(sum(l.pd) AS BIGINT) AS adot, any_value(l.qn2) AS qn2
         |        FROM enc e2
         |        JOIN asg a ON a.vec_id = e2.id
         |        JOIN probe p ON p.cell = a.cell
         |        JOIN lut l ON l.query_id = p.query_id
         |                  AND l.m = e2.m AND l.code = e2.code
         |        JOIN n c ON c.vec_id = e2.id
         |        WHERE e2.id <> l.query_id GROUP BY 1, 2, 3),
         |short AS (SELECT query_id, vec_id FROM (
         |            SELECT query_id, vec_id,
         |              row_number() OVER (PARTITION BY query_id
         |                ORDER BY CAST(adot AS DOUBLE)
         |                           / sqrt(CAST(qn2 * n2 AS DOUBLE)) DESC,
         |                         vec_id) AS rn
         |            FROM adc) WHERE rn <= 50),
         |scored AS (SELECT s.query_id, s.vec_id,
         |             ${cosFor("sq.v", "sc.v", "sq.n2", "sc.n2")} AS cos
         |           FROM short s JOIN n sq ON sq.vec_id = s.query_id
         |                        JOIN n sc ON sc.vec_id = s.vec_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos DESC, vec_id) AS INT) AS rank FROM scored)
         |SELECT query_id, vec_id, rank, cos FROM ranked
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "embedding_label_centroids" ->
      """WITH dims AS (
        |  SELECT label, i,
        |    CAST(round(1000000.0 * CAST(embedding[CAST(i AS INT)]
        |                               AS DOUBLE)) AS BIGINT) AS xf
        |  FROM embeddings, UNNEST([1, 2, 3, 4]) AS u(i))
        |SELECT label, CAST(count(*) / 4 AS BIGINT) AS n,
        |  CAST(round(CAST(sum(CASE WHEN i = 1 THEN xf END) AS DOUBLE)
        |    / (count(*) / 4)) AS BIGINT) AS c1_fp_e6,
        |  CAST(round(CAST(sum(CASE WHEN i = 2 THEN xf END) AS DOUBLE)
        |    / (count(*) / 4)) AS BIGINT) AS c2_fp_e6,
        |  CAST(round(CAST(sum(CASE WHEN i = 3 THEN xf END) AS DOUBLE)
        |    / (count(*) / 4)) AS BIGINT) AS c3_fp_e6,
        |  CAST(round(CAST(sum(CASE WHEN i = 4 THEN xf END) AS DOUBLE)
        |    / (count(*) / 4)) AS BIGINT) AS c4_fp_e6
        |FROM dims GROUP BY label ORDER BY label""".stripMargin,
    "ann_cosine_topk" ->
      s"""WITH $prepSql,
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, $cosSql AS cos
         |  FROM n q JOIN n c ON q.vec_id < 5 AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, vec_id) AS INT) AS rank
         |           FROM scored)
         |SELECT query_id, vec_id, rank, cos FROM ranked
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "ann_ivf_label" ->
      s"""WITH $prepSql,
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, $cosSql AS cos
         |  FROM n q JOIN n c ON q.vec_id < 5 AND c.label = q.label
         |                    AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, vec_id) AS INT) AS rank
         |           FROM scored)
         |SELECT query_id, vec_id, rank, cos FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "ann_lsh_hyperplane" -> {
      // bucket bit p: sign of the exact integer dot with plane p; the
      // plane constants are generated from the same md5 rule the Spark
      // side uses, so both engines agree bit-for-bit.
      val planeSql = graft.operators.Similarity.hyperplanes(Planes, Dim)
        .map(p => p.mkString("[", ",", "]"))
      val bucketExpr = planeSql.map { pl =>
        s"""(CASE WHEN CAST(list_sum(list_transform(range(1, ${Dim + 1}),
           |   k -> v[k] * ($pl)[k])) AS BIGINT) >= 0
           | THEN '1' ELSE '0' END)""".stripMargin
      }.mkString(" || ")
      s"""WITH $prepSql,
         |b AS (SELECT vec_id, label, v, n2, $bucketExpr AS bucket FROM n),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         |    CAST(CAST(list_sum(list_transform(range(1, len(q.v) + 1),
         |            k -> q.v[k] * c.v[k])) AS BIGINT) AS DOUBLE)
         |     / sqrt(CAST(q.n2 * c.n2 AS DOUBLE)) AS cos
         |  FROM b q JOIN b c ON q.vec_id < 5 AND c.bucket = q.bucket
         |                    AND c.vec_id <> q.vec_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |                       ORDER BY cos DESC, vec_id) AS INT) AS rank
         |           FROM scored)
         |SELECT query_id, vec_id, rank, cos FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
    },
    "dedup_embedding_cosine" ->
      s"""WITH $prepSql,
         |pairs AS (
         |  SELECT q.vec_id AS id1, c.vec_id AS id2, $cosSql AS cos
         |  FROM n q JOIN n c ON q.vec_id < c.vec_id)
         |SELECT id1, id2, cos FROM pairs WHERE cos >= 0.45
         |ORDER BY 1, 2""".stripMargin,
    "dedup_semdedup" ->
      // same IVF assignment chain as ann_ivf_kmeans, then pairs
      // restricted to a shared cell.
      s"""WITH $prepSql,
         |$ivfAssignSql
         |SELECT * FROM (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2, a.cell,
         |    ${cosFor("a.v", "b.v", "a.n2", "b.n2")} AS cos
         |  FROM asg a JOIN asg b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id)
         |WHERE cos >= 0.45
         |ORDER BY 1, 2""".stripMargin,
    "dedup_semdedup_scaled" ->
      // identical chain with the cell count computed from the corpus
      // size (mirrors semDedupPairsScaled's max(8, ceil(n/250))).
      s"""WITH $prepSql,
         |${ivfAssignSqlFor(scaledCellsSql)}
         |SELECT * FROM (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2, a.cell,
         |    ${cosFor("a.v", "b.v", "a.n2", "b.n2")} AS cos
         |  FROM asg a JOIN asg b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id)
         |WHERE cos >= 0.45
         |ORDER BY 1, 2""".stripMargin,
    "dedup_semdedup_hier" ->
      // two-level mirror: the shared coarse chain sized k1, then the
      // fine chain (seed-by-row_number, Lloyd, reassign) per coarse
      // cell; pairs share a (ccell, j) fine cell, cell = ccell·f + j.
      s"""WITH $prepSql,
         |$hierParamsSql,
         |${ivfAssignSqlFor("SELECT k1 FROM hp2")},
         |$hierFineSql
         |SELECT * FROM (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2,
         |    CAST(a.ccell * (SELECT f FROM hp2) + a.j AS INT) AS cell,
         |    ${cosFor("a.v", "b.v", "a.n2", "b.n2")} AS cos
         |  FROM fasg a JOIN fasg b
         |    ON a.ccell = b.ccell AND a.j = b.j AND a.vec_id < b.vec_id)
         |WHERE cos >= 0.45
         |ORDER BY 1, 2""".stripMargin,
    "ann_ivf_kmeans" ->
      // mirrors graft.operators.Ivf exactly: seed cells = vec_id < 8,
      // one quantized-mean Lloyd step (floor(sum/n + 0.5)), reassign,
      // nprobe=2 probe, exact rank.
      s"""WITH $prepSql,
         |$ivfAssignSql,
         |q AS (SELECT vec_id AS query_id, v AS qv, n2 AS qn2 FROM n WHERE vec_id < 5),
         |ps AS (SELECT q.query_id, q.qv, q.qn2, c.cell,
         |         row_number() OVER (PARTITION BY q.query_id
         |           ORDER BY ${cosFor("q.qv", "c.cv", "q.qn2", "c.cn2")} DESC,
         |                    c.cell) AS rn
         |       FROM q CROSS JOIN cn c),
         |probe AS (SELECT query_id, qv, qn2, cell FROM ps WHERE rn <= 2),
         |scored AS (SELECT p.query_id, a.vec_id,
         |             ${cosFor("p.qv", "a.v", "p.qn2", "a.n2")} AS cos
         |           FROM probe p JOIN asg a USING (cell)
         |           WHERE a.vec_id <> p.query_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos DESC, vec_id) AS INT) AS rank FROM scored)
         |SELECT query_id, vec_id, rank, cos FROM ranked
         |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
    "ann_pq_adc" -> {
      // Mirrors graft.operators.Pq.topK(m=8, codes=16, rerank=50, k=10)
      // step for step: subvector split → seed codebook (vec_id < 16) →
      // integer-L2 assign (tie: lowest code) → quantized-mean Lloyd
      // step with empty-cluster fallback to the seed → encode → per-
      // query partial-dot LUT → ADC shortlist (top-50 by ADC cosine,
      // vec_id tiebreak) → exact re-rank. All integer arithmetic plus
      // single IEEE double divisions — both engines agree bitwise.
      val l2 = (a: String, b: String) =>
        s"""list_sum(list_transform(range(1, 9),
           |        k -> ($a[k] - $b[k]) * ($a[k] - $b[k])))""".stripMargin
      s"""WITH $prepSql,
         |subs AS (SELECT vec_id AS id, CAST(t.m AS INT) AS m,
         |           list_slice(v, t.m * 8 + 1, t.m * 8 + 8) AS sub
         |         FROM n, UNNEST(range(0, 8)) AS t(m)),
         |seeds AS (SELECT m, CAST(id AS INT) AS code, sub AS c
         |          FROM subs WHERE id < 16),
         |a0 AS (SELECT id, m, sub, code FROM (
         |         SELECT s.id, s.m, s.sub, sd.code,
         |           row_number() OVER (PARTITION BY s.id, s.m
         |             ORDER BY ${l2("s.sub", "sd.c")}, sd.code) AS rn
         |         FROM subs s JOIN seeds sd USING (m)) WHERE rn = 1),
         |rf AS (SELECT m, code, list(cq ORDER BY pos) AS c FROM (
         |         SELECT m, code, t.k AS pos,
         |           CAST(floor(CAST(sum(sub[t.k]) AS DOUBLE) / count(*)
         |                      + 0.5) AS BIGINT) AS cq
         |         FROM a0, UNNEST(range(1, 9)) AS t(k)
         |         GROUP BY 1, 2, 3) GROUP BY 1, 2),
         |cb AS (SELECT s.m, s.code, COALESCE(r.c, s.c) AS c
         |       FROM seeds s LEFT JOIN rf r ON r.m = s.m AND r.code = s.code),
         |enc AS (SELECT id, m, code FROM (
         |          SELECT s.id, s.m, cb.code,
         |            row_number() OVER (PARTITION BY s.id, s.m
         |              ORDER BY ${l2("s.sub", "cb.c")}, cb.code) AS rn
         |          FROM subs s JOIN cb USING (m)) WHERE rn = 1),
         |lut AS (SELECT q.vec_id AS query_id, q.n2 AS qn2, cb.m, cb.code,
         |          CAST(list_sum(list_transform(range(1, 9),
         |            k -> q.v[cb.m * 8 + k] * cb.c[k])) AS BIGINT) AS pd
         |        FROM n q CROSS JOIN cb WHERE q.vec_id < 5),
         |adc AS (SELECT l.query_id, e2.id AS vec_id, c.n2,
         |          CAST(sum(l.pd) AS BIGINT) AS adot, any_value(l.qn2) AS qn2
         |        FROM enc e2 JOIN lut l ON l.m = e2.m AND l.code = e2.code
         |        JOIN n c ON c.vec_id = e2.id
         |        WHERE e2.id <> l.query_id GROUP BY 1, 2, 3),
         |short AS (SELECT query_id, vec_id FROM (
         |            SELECT query_id, vec_id,
         |              row_number() OVER (PARTITION BY query_id
         |                ORDER BY CAST(adot AS DOUBLE)
         |                           / sqrt(CAST(qn2 * n2 AS DOUBLE)) DESC,
         |                         vec_id) AS rn
         |            FROM adc) WHERE rn <= 50),
         |scored AS (SELECT s.query_id, s.vec_id,
         |             ${cosFor("q.v", "c.v", "q.n2", "c.n2")} AS cos
         |           FROM short s JOIN n q ON q.vec_id = s.query_id
         |                        JOIN n c ON c.vec_id = s.vec_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos DESC, vec_id) AS INT) AS rank FROM scored)
         |SELECT query_id, vec_id, rank, cos FROM ranked
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    },
    "ann_ivfpq_adc" -> ivfPqAdcOracleSql,
    "ann_ivfpq_persisted" -> ivfPqAdcOracleSql,
    "ann_ivfpq_residual" -> {
      // Residual-encoding IVFADC mirror: the ivfAssignSql chain, then
      // rv = v − cv[cell] per vector, the PQ chain trained/encoded on
      // rv, and the ADC estimate any_value(qcv) + Σ pd — qcv the exact
      // integer q·cv of the probed cell. Integer arithmetic end to end.
      val l2 = (a: String, b: String) =>
        s"""list_sum(list_transform(range(1, 9),
           |        k -> ($a[k] - $b[k]) * ($a[k] - $b[k])))""".stripMargin
      s"""WITH $prepSql,
         |$ivfAssignSql,
         |resid AS (SELECT a.vec_id AS id,
         |            list_transform(range(1, 65), j -> a.v[j] - c.cv[j]) AS rv,
         |            a.cell, a.n2
         |          FROM asg a JOIN cn c USING (cell)),
         |subs AS (SELECT id, CAST(t.m AS INT) AS m,
         |           list_slice(rv, t.m * 8 + 1, t.m * 8 + 8) AS sub
         |         FROM resid, UNNEST(range(0, 8)) AS t(m)),
         |pseeds AS (SELECT m, CAST(id AS INT) AS code, sub AS c
         |           FROM subs WHERE id < 16),
         |a0 AS (SELECT id, m, sub, code FROM (
         |         SELECT s.id, s.m, s.sub, sd.code,
         |           row_number() OVER (PARTITION BY s.id, s.m
         |             ORDER BY ${l2("s.sub", "sd.c")}, sd.code) AS rn
         |         FROM subs s JOIN pseeds sd USING (m)) WHERE rn = 1),
         |rf AS (SELECT m, code, list(cq ORDER BY pos) AS c FROM (
         |         SELECT m, code, t.k AS pos,
         |           CAST(floor(CAST(sum(sub[t.k]) AS DOUBLE) / count(*)
         |                      + 0.5) AS BIGINT) AS cq
         |         FROM a0, UNNEST(range(1, 9)) AS t(k)
         |         GROUP BY 1, 2, 3) GROUP BY 1, 2),
         |cb AS (SELECT s.m, s.code, COALESCE(r.c, s.c) AS c
         |       FROM pseeds s LEFT JOIN rf r ON r.m = s.m AND r.code = s.code),
         |enc AS (SELECT id, m, code FROM (
         |          SELECT s.id, s.m, cb.code,
         |            row_number() OVER (PARTITION BY s.id, s.m
         |              ORDER BY ${l2("s.sub", "cb.c")}, cb.code) AS rn
         |          FROM subs s JOIN cb USING (m)) WHERE rn = 1),
         |q AS (SELECT vec_id AS query_id, v AS qv, n2 AS qn2 FROM n
         |      WHERE vec_id < 5),
         |ps AS (SELECT q.query_id, c.cell,
         |         CAST(list_sum(list_transform(range(1, 65),
         |           j -> q.qv[j] * c.cv[j])) AS BIGINT) AS qcv,
         |         row_number() OVER (PARTITION BY q.query_id
         |           ORDER BY ${cosFor("q.qv", "c.cv", "q.qn2", "c.cn2")} DESC,
         |                    c.cell) AS rn
         |       FROM q CROSS JOIN cn c),
         |probe AS (SELECT query_id, cell, qcv FROM ps WHERE rn <= 2),
         |lut AS (SELECT qq.vec_id AS query_id, qq.n2 AS qn2, cb.m, cb.code,
         |          CAST(list_sum(list_transform(range(1, 9),
         |            k -> qq.v[cb.m * 8 + k] * cb.c[k])) AS BIGINT) AS pd
         |        FROM n qq CROSS JOIN cb WHERE qq.vec_id < 5),
         |adc AS (SELECT l.query_id, e2.id AS vec_id, r.n2,
         |          CAST(any_value(p.qcv) + sum(l.pd) AS BIGINT) AS adot,
         |          any_value(l.qn2) AS qn2
         |        FROM enc e2
         |        JOIN resid r ON r.id = e2.id
         |        JOIN probe p ON p.cell = r.cell
         |        JOIN lut l ON l.query_id = p.query_id
         |                  AND l.m = e2.m AND l.code = e2.code
         |        WHERE e2.id <> l.query_id GROUP BY 1, 2, 3),
         |short AS (SELECT query_id, vec_id FROM (
         |            SELECT query_id, vec_id,
         |              row_number() OVER (PARTITION BY query_id
         |                ORDER BY CAST(adot AS DOUBLE)
         |                           / sqrt(CAST(qn2 * n2 AS DOUBLE)) DESC,
         |                         vec_id) AS rn
         |            FROM adc) WHERE rn <= 50),
         |scored AS (SELECT s.query_id, s.vec_id,
         |             ${cosFor("sq.v", "sc.v", "sq.n2", "sc.n2")} AS cos
         |           FROM short s JOIN n sq ON sq.vec_id = s.query_id
         |                        JOIN n sc ON sc.vec_id = s.vec_id),
         |ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos DESC, vec_id) AS INT) AS rank FROM scored)
         |SELECT query_id, vec_id, rank, cos FROM ranked
         |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    }
  )
}
