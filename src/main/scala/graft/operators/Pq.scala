package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns.qcosine

/** Product quantization (PQ) ANN — the memory-bandwidth half of the
  * standard large-corpus recipe (IVF partitions the scan, PQ shrinks
  * the bytes PER SCANNED VECTOR; Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI'11):
  *
  *   - the d-dim quantized vector is split into M subvectors; each
  *     subspace learns K centroids (deterministic seeds + one Lloyd
  *     step over exact integer sums, same discipline as [[Ivf]]);
  *   - every corpus vector is ENCODED as M small codes — at
  *     M=8, K=16 that is 8 nibbles ≈ 4 bytes instead of d longs, a
  *     ~100× memory-traffic cut on the scan;
  *   - a query scores candidates by ADC (asymmetric distance): one
  *     M×K partial-dot lookup table per query, then each candidate
  *     costs M array lookups — no vector arithmetic on the scan path;
  *   - the ADC top-`rerank` candidates are re-scored with EXACT
  *     quantized cosine, so the final top-k ranking is exact over the
  *     candidate set (approximation only affects recall, never the
  *     reported scores).
  *
  * Everything is codegen'd higher-order expressions over broadcast
  * codebooks — no UDF, no corpus shuffle before the final per-query
  * top-k.
  */
object Pq {

  /** Train per-subspace codebooks on prepped corpus (`id`, `v`, `n2`):
    * seeds = subvectors of rows `id < k`, one Lloyd refinement with
    * quantized-integer means. Returns (`m`, `code`, `c`: array<long>).
    */
  def train(corpus: DataFrame, m: Int, k: Int): DataFrame = {
    val subs = corpus
      .select(col("id"), explode(sequence(lit(0), lit(m - 1))).as("m"),
        col("v"))
      .select(col("id"), col("m"),
        expr(s"slice(v, m * (size(v) div $m) + 1, size(v) div $m)").as("sub"))
    val seeds = subs.where(col("id") < k)
      .select(col("m"), col("id").cast("int").as("code"),
        col("sub").as("c"))
    val assigned = assignSubs(subs, seeds)
    // quantized mean per (m, code, pos) — exact integer sums, floor+0.5
    val refined = assigned
      .select(col("m"), col("code"), posexplode(col("sub")).as(Seq("pos", "q")))
      .groupBy(col("m"), col("code"), col("pos"))
      .agg((sum(col("q")).cast("double") / count(lit(1))).as("mean"))
      .withColumn("cq", floor(col("mean") + 0.5d).cast("long"))
      .groupBy(col("m"), col("code"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cq")))),
        x => x.getField("cq")).as("rc"))
    // empty-cluster guard: a code that attracts no rows after the Lloyd
    // step keeps its seed centroid, so the codebook is ALWAYS a dense
    // M×K grid — the positional [m*K + code] ADC LUT layout in topK
    // depends on that density, and the SQL oracle mirrors this rule.
    seeds.join(refined, Seq("m", "code"), "left")
      .select(col("m"), col("code"),
        coalesce(col("rc"), col("c")).as("c"))
  }

  /** Nearest codebook entry per (row, subspace) by exact integer L2;
    * ties break to the lowest code. Codebook broadcasts as one folded
    * array — the (possibly corpus-sized) `subs` side never shuffles.
    */
  private def assignSubs(subs: DataFrame, codebook: DataFrame): DataFrame = {
    val cb = broadcast(codebook.agg(
      collect_list(struct(col("m"), col("code"), col("c"))).as("cb")))
    subs.crossJoin(cb)
      .select(col("id"), col("m"), col("sub"),
        aggregate(filter(col("cb"), e => e.getField("m") === col("m")),
          struct(lit(Long.MaxValue).as("best"), lit(-1).as("code")),
          (acc, e) => {
            val dist = l2(col("sub"), e.getField("c"))
            when(dist < acc.getField("best") ||
                 (dist === acc.getField("best") &&
                  e.getField("code") < acc.getField("code")),
              struct(dist.as("best"), e.getField("code").as("code")))
              .otherwise(acc)
          }).getField("code").as("code"))
  }

  private def l2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, x) => acc + x)

  /** Encode every corpus row as its M-code array (`id`, `codes`, `n2`).
    * One map-side pass; the output row carries ~M small ints instead
    * of the d-dim vector — the representation the 100 TB scan reads.
    */
  def encode(corpus: DataFrame, codebook: DataFrame, m: Int): DataFrame =
    assignSubs(
      corpus.select(col("id"),
          explode(sequence(lit(0), lit(m - 1))).as("m"), col("v"))
        .select(col("id"), col("m"),
          expr(s"slice(v, m * (size(v) div $m) + 1, size(v) div $m)").as("sub")),
      codebook)
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("m"), col("code")))),
        x => x.getField("code")).as("codes"))

  /** Per-query ADC lookup table: partial dot of each (m, code)
    * centroid with the query's m-th subvector, laid out [m*K + code]
    * by the (m, code) sort — candidate scoring is pure array lookups.
    * Output: (query_id, qv, qn2, lut).
    */
  private def lutsFor(qs: DataFrame, cb: DataFrame, m: Int): DataFrame = {
    val cbArr = broadcast(cb.agg(array_sort(
      collect_list(struct(col("m"), col("code"), col("c")))).as("cb")))
    val subLen = expr(s"size(v) div $m")
    qs.crossJoin(cbArr)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("n2").as("qn2"),
        transform(col("cb"), e =>
          aggregate(zip_with(
              slice(col("v"), e.getField("m") * subLen + 1, subLen),
              e.getField("c"), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x)).as("lut"))
  }

  /** ADC cosine of the current row's `codes` against its `lut`:
    * approx dot = `base` + Σ over subspaces of one LUT lookup each
    * (`base` carries the exact query·centroid term in the residual
    * variant; 0 when codes quantize the raw vectors).
    */
  private def adcCosine(m: Int, codes: Int, base: Column = lit(0L)): Column =
    qcosine(
      base + aggregate(sequence(lit(0), lit(m - 1)), lit(0L),
        (acc, mm) => acc + element_at(col("lut"),
          (mm * codes + element_at(col("codes"), mm + 1) + 1)
            .cast("int"))),
      col("qn2"), col("n2"))

  /** ADC shortlist (top-`rerank` per query by ADC cosine, vec_id
    * tiebreak) followed by exact re-rank over the shortlist only.
    * `cands` columns: (query_id, qv, qn2, vec_id, n2, adc).
    */
  private def rerankExact(cands: DataFrame, corp: DataFrame,
                          k: Int, rerank: Int): DataFrame = {
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id"))
    val shortlist = cands.withColumn("rn", row_number().over(wAdc))
      .where(col("rn") <= rerank)
      .select(col("query_id"), col("qv"), col("qn2"), col("vec_id"))
    // the shortlist is BOUNDED by queries×rerank rows by construction
    // — always the broadcast build. Left to estimates, the initial
    // plan broadcast CORP (the raw corpus scan) instead: fine while
    // the corpus is genuinely small, but the corpus side must never be
    // the collect-to-driver side at scale (r14 audit).
    val exact = broadcast(shortlist)
      .join(corp.select(col("id").as("vec_id"), col("v"), col("n2")),
        "vec_id")
      .select(col("query_id"), col("vec_id"),
        qcosine(call_function("graft_qdot", col("qv"), col("v")),
          col("qn2"), col("n2")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    exact.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** End-to-end PQ top-k with exact re-rank: ADC-score the encoded
    * corpus (M lookups/candidate), keep `rerank` per query, re-score
    * those exactly. `queries`/`corpus` are prepped (`Similarity.prep`).
    *
    * This is the textbook BRUTE-FORCE ADC scan (every encoded vector
    * is scored for every query) — the recall baseline. The production
    * 100 TB form is [[ivfTopK]], which prunes the scan to the probed
    * IVF cells first.
    */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
           m: Int = 8, codes: Int = 16, rerank: Int = 50): DataFrame = {
    val corp = corpus.select(col("id"), col("v"), col("n2"))
    val qs = queries.select(col("id"), col("v"), col("n2"))
    val cb = train(corp, m, codes).localCheckpoint(false)
    val encoded = encode(corp, cb, m)
      .join(corp.select(col("id"), col("n2")), "id")
    val cands = encoded.crossJoin(lutsFor(qs, cb, m))
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("qn2"),
        col("id").as("vec_id"), col("n2"),
        adcCosine(m, codes).as("adc"))
    rerankExact(cands, corp, k, rerank)
  }

  /** IVFADC — the standard large-corpus ANN composition (Jégou et al.
    * TPAMI'11 §IV): IVF partitions the scan, PQ shrinks the bytes per
    * scanned vector, and a query touches only its `nprobe` probed
    * cells. Same coarse quantizer as [[Ivf.topK]] (deterministic
    * seeds, one quantized-mean Lloyd step), same codebook/encode/ADC
    * as [[topK]] (no residual encoding: codes quantize the raw
    * vectors, so ADC scores here are IDENTICAL to the flat scan's for
    * every surviving candidate — recall is the only thing nprobe
    * trades away).
    *
    * 100 TB shape: centroids and codebooks broadcast; the corpus is
    * scanned map-side for cell assignment + encoding and NEVER
    * shuffles; (probe × lut) is queries×nprobe rows and broadcasts
    * into a hash join on the cell key, so ADC scoring touches only
    * probed-cell rows. With the encoded table written partitioned by
    * cell (the layout a real deployment persists), the cell join
    * becomes listing-time partition pruning and unprobed cells are
    * never read at all.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              cells: Int = 8, nprobe: Int = 2,
              m: Int = 8, codes: Int = 16, rerank: Int = 50): DataFrame = {
    val corp = corpus.select(col("id"), col("v"), col("n2"))
    val (cents, cb, encoded) = buildIvfPqIndex(corp, cells, m, codes)
    searchIvfPq(queries, encoded, cents, cb, corp, k, nprobe, m, codes,
      rerank)
  }

  /** Coarse quantizer shared by every IVFADC variant: deterministic
    * seeds (rows id < cells), one quantized-mean Lloyd refinement,
    * lazily checkpointed (C rows — the refinement subtree runs once).
    */
  private def coarseQuantizer(corp: DataFrame, cells: Int): DataFrame = {
    val seeds = corp.where(col("id") < cells)
      .select(col("id").cast("int").as("cell"),
        col("v").as("cv"), col("n2").as("cn2"))
    Ivf.refine(Ivf.assign(corp, seeds)).localCheckpoint(false)
  }

  /** Build the three IVFADC index frames once — the OFFLINE half a
    * production deployment persists: the centroid table (C rows), the
    * PQ codebook (M×K rows), and the encoded corpus
    * (id, codes, n2, cell — ~M bytes + a cell tag per vector). The
    * encoded frame is designed to be written `partitionBy("cell")`:
    * the search-side cell join then prunes at listing time
    * ([[searchIvfPq]], `ann_ivfpq_persisted`).
    */
  def buildIvfPqIndex(corpus: DataFrame, cells: Int, m: Int,
                      codes: Int): (DataFrame, DataFrame, DataFrame) = {
    val corp = corpus.select(col("id"), col("v"), col("n2"))
    val cents = coarseQuantizer(corp, cells)
    val cellOf = Ivf.assign(corp, cents).select(col("id"), col("cell"))
    val cb = train(corp, m, codes).localCheckpoint(false)
    val encoded = encode(corp, cb, m)
      .join(corp.select(col("id"), col("n2")), "id")
      .join(cellOf, "id")
    (cents, cb, encoded)
  }

  /** The ONLINE half: probe queries to `nprobe` cells, ADC-score only
    * probed-cell rows of `encoded`, exact-re-rank against `corpus`.
    * `encoded` may be the frame [[buildIvfPqIndex]] just built OR a
    * persisted copy read back from a cell-partitioned table — in the
    * latter case the broadcast cell join plants a dynamic-partition-
    * pruning filter on the scan and unprobed cells are never read.
    */
  def searchIvfPq(queries: DataFrame, encoded: DataFrame,
                  cents: DataFrame, cb: DataFrame, corpus: DataFrame,
                  k: Int, nprobe: Int, m: Int, codes: Int,
                  rerank: Int): DataFrame = {
    val corp = corpus.select(col("id"), col("v"), col("n2"))
    val qs = queries.select(col("id"), col("v"), col("n2"))
    // (query, probed cell) × LUT — tiny, broadcast into the cell join.
    // When `encoded` is an in-memory build (ivfTopK/adc) the hash join
    // alone bounds the scoring; a PERSISTED cell-partitioned index
    // must additionally be pre-filtered with [[probedCellsOf]] before
    // reaching here, or the scan reads every cell (see that method).
    val probeLuts = broadcast(
      Ivf.probe(qs, cents, nprobe).select(col("query_id"), col("cell"))
        .join(lutsFor(qs, cb, m), "query_id"))
    val cands = encoded.join(probeLuts, "cell")
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("qn2"),
        col("id").as("vec_id"), col("n2"),
        adcCosine(m, codes).as("adc"))
    rerankExact(cands, corp, k, rerank)
  }

  /** The distinct cell ids a query batch probes — bounded by
    * nprobe·|queries| (the serving batch), so collecting them is a
    * tiny job over the C-row centroid table. Callers searching a
    * PERSISTED cell-partitioned index plant these as a literal
    * `cell IN (...)` on the partition column BEFORE [[searchIvfPq]]:
    * STATIC listing-time pruning, because Catalyst's dynamic
    * partition pruning is not reliable here — measured on the
    * cell-partitioned index, the inserted DPP filter was planned to
    * `dynamicpruningexpression(true)` (broadcast-reuse lookup fails
    * for this plan in both AQE modes) and the scan read ALL cells:
    * 8/8 partitions, the whole 20k-row index for a 2-cell probe.
    * In-memory callers (ivfTopK) skip it — with no partitions to
    * prune, the extra action is pure job overhead.
    */
  def probedCellsOf(queries: DataFrame, cents: DataFrame,
                    nprobe: Int): Seq[Int] =
    Ivf.probe(queries.select(col("id"), col("v"), col("n2")), cents, nprobe)
      .select(col("cell")).distinct().collect().map(_.getInt(0)).toSeq

  /** IVFADC with RESIDUAL encoding — the exact form of Jégou et al.
    * TPAMI'11 §IV: PQ codes quantize r = v − centroid(cell) instead
    * of v itself. Residuals concentrate around 0, so the same M×K
    * code budget spends its resolution on the part of the vector the
    * coarse quantizer did NOT explain — the reason production systems
    * (FAISS IVFADC) encode residuals. The ADC estimate decomposes
    * exactly: dot(q, cv + r̂) = q·cv (computed exactly per probed
    * (query, cell) — C·nprobe scalars) + q·r̂ (the usual LUT sum over
    * one GLOBAL residual codebook), all integer arithmetic, so the
    * DuckDB mirror stays bit-exact.
    *
    * Same 100 TB shape as [[ivfTopK]]: the corpus never shuffles
    * (residual subtraction is a broadcast centroid join), the
    * candidate scan is the cell-keyed hash join over probed cells
    * only, and the exact re-rank touches the shortlist alone.
    */
  def ivfResidualTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                      cells: Int = 8, nprobe: Int = 2,
                      m: Int = 8, codes: Int = 16,
                      rerank: Int = 50): DataFrame = {
    val corp = corpus.select(col("id"), col("v"), col("n2"))
    val qs = queries.select(col("id"), col("v"), col("n2"))
    val cents = coarseQuantizer(corp, cells)
    // residual frame (id, v := v − cv[cell], cell, n2): feeds BOTH the
    // codebook training and the encode scan — materialize once. n2
    // stays the ORIGINAL vector's exact norm (the ADC denominator).
    val centsB = broadcast(cents.select(col("cell"), col("cv")))
    val resid = Ivf.assign(corp, cents).join(centsB, "cell")
      .select(col("id"),
        zip_with(col("v"), col("cv"), (x, y) => x - y).as("v"),
        col("cell"), col("n2"))
      .localCheckpoint(false)
    val cb = train(resid, m, codes).localCheckpoint(false)
    val encoded = encode(resid, cb, m)
      .join(resid.select(col("id"), col("cell"), col("n2")), "id")
    // probed cells carry the exact q·cv term; the residual LUT is per
    // query (one global codebook) — together (probe × LUT) is still
    // queries×nprobe rows, broadcast into the cell join
    val probeLuts = broadcast(
      Ivf.probe(qs, cents, nprobe).join(centsB, "cell")
        .select(col("query_id"), col("cell"),
          call_function("graft_qdot", col("qv"), col("cv")).as("qcv"))
        .join(lutsFor(qs, cb, m), "query_id"))
    val cands = encoded.join(probeLuts, "cell")
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("qv"), col("qn2"),
        col("id").as("vec_id"), col("n2"),
        adcCosine(m, codes, col("qcv")).as("adc"))
    rerankExact(cands, corp, k, rerank)
  }
}
