package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns._

/** Document deduplication operators (training-data pipeline
  * extensions). Every variant is shuffle-join based — no cross join,
  * no driver-side collection — so each scales to sharded 100 TB
  * corpora:
  *
  *   - exact:   one hash-groupBy (window over fingerprint).
  *   - MinHash: row-local signatures (native graft_minhash) -> band
  *              keys -> bucket self-join -> exact-Jaccard verify on
  *              candidates only (approximate recall, cheapest).
  *   - Jaccard: EXACT pairs via PPJoin-style prefix+length filtering
  *              (no false negatives; prefix order is md5 for engine
  *              portability — on Zipf-distributed real corpora, order
  *              by ascending global frequency instead for far smaller
  *              candidate buckets).
  *   - SimHash: 60-bit fingerprint; 4×15-bit chunk banding guarantees
  *              full recall at hamming <= 3 (pigeonhole) with an
  *              equi-join instead of an O(n^2) comparison.
  */
object Dedup {

  /** id column + canonical (min) id per exact-normalized-text group. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = md5(lower(trim(col(textCol))))
    docs.select(col(idCol), fp.as("fp"))
      .withColumn("canonical_id", min(col(idCol)).over(Window.partitionBy("fp")))
  }

  /** Distinct (id, shingle) pairs. */
  def docShingles(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 3): DataFrame =
    docs.select(col(idCol).as("doc"), explode(shingles(col(textCol), n)).as("s"))
      .distinct()

  /** EXACT n-gram Jaccard pairs >= `threshold` (same result set as the
    * naive all-pairs computation) with PPJoin-style pruning:
    *
    *   - prefix filter: under any global shingle order, two sets with
    *     Jaccard >= t must share one of each other's first
    *     n - ceil(t*n) + 1 shingles — so the inverted index holds only
    *     prefixes (md5 order keeps the choice engine-portable);
    *   - length filter: |A|/|B| must lie in [t, 1/t];
    *   - verification via the native merge-scan intersect on candidate
    *     pairs only.
    *
    * Emits (d1, d2, jac) with d1 < d2.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame =
    jaccardPairsFromBase(shingleBase(docs, idCol, textCol), threshold)

  /** The shared (doc, sh, n) shingle-hash frame every pair path starts
    * from, lazily checkpointed: first action materializes; blocks
    * freed by ContextCleaner when the plan is GC'd — persist() would
    * pin an input-sized cache entry per call (see Packing). Factored
    * out (r20) so [[pairsAuto]] computes it ONCE for the saturation
    * census AND the routed pair path instead of re-shingling the
    * corpus per consumer.
    */
  private def shingleBase(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    graft.functions.expressions.SortedLongIntersectSize.register(docs.sparkSession)
    graft.functions.expressions.ShingleHashes.register(docs.sparkSession)
    graft.functions.expressions.MinHashSignature.register(docs.sparkSession)
    docs
      .select(col(idCol).as("doc"),
        expr(s"graft_shingle_hashes($textCol, 3)").as("sh"))
      .withColumn("n", size(col("sh")))
      .localCheckpoint(false)
  }

  /** [[jaccardPairs]] over a prebuilt [[shingleBase]] frame. */
  private def jaccardPairsFromBase(base: DataFrame,
                                   threshold: Double): DataFrame = {
    // sh is sorted by hash — a uniform global order — so the prefix is
    // simply the leading slice; no per-doc reordering pass needed.
    // Same float guard as the positional bound: when t*n rounds UP past
    // an exact integer (t=0.07, n=100 -> 7.000000000000001) a bare ceil
    // would shorten the prefix by one and silently drop a qualifying
    // pair that the verify step can never recover. Subtracting epsilon
    // can only LENGTHEN the prefix (extra candidates, filtered later).
    val prefixLen =
      (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1).cast("int")
    val prefixes = base
      .select(col("doc"), col("n"),
        posexplode(slice(col("sh"), lit(1), prefixLen)).as(Seq("p", "s")))
    verifyCandidates(base,
      candidatesFromPrefixes(prefixes, threshold, positional = true),
      threshold)
  }

  /** Benchmark decontamination: each corpus doc that shares at least
    * one 3-gram shingle with ANY benchmark doc, with its overlap count
    * — the "remove eval-set contamination" step of training-data prep.
    *
    * The benchmark side (eval sets) is small by nature, so its distinct
    * shingle-hash set BROADCASTS: the 100 TB corpus is scanned once,
    * shingled row-locally (native graft_shingle_hashes), and probed
    * map-side — the only exchange is the per-doc count aggregation over
    * matching (doc, shingle) pairs, which contamination's rarity keeps
    * tiny. Returns (`doc`, `n_shared`); anti-join the ids to purge.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String): DataFrame = {
    graft.functions.expressions.ShingleHashes.register(corpus.sparkSession)
    // graft_shingle_hashes emits the DISTINCT sorted hash set per doc,
    // so exploding yields distinct (doc, h) pairs with no extra dedup.
    def sh(df: DataFrame) = df.select(col(idCol).as("doc"),
      explode(expr(s"graft_shingle_hashes($textCol, 3)")).as("h"))
    val bench = sh(benchmark).select(col("h")).distinct()
    sh(corpus).join(broadcast(bench), "h")
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Saturation diagnostic for the exact PPJoin path — the cheap
    * pre-flight that tells you whether [[jaccardPairs]]' candidate
    * join is about to go quadratic. On open-vocabulary (Heaps-law)
    * text, per-shingle document frequency stays ~constant as the
    * corpus grows and the prefix buckets stay small; on
    * template-heavy/bounded-vocabulary data (logs, boilerplate HTML,
    * a saturated synthetic generator) the shingle space SATURATES, DF
    * grows ∝ n, and the candidate bound Σ c·(c−1)/2 over prefix
    * buckets grows ∝ n² — the measured sf1→sf3 1.91 exponent on
    * dedup_cluster_cc traced to exactly this. One scan + one
    * bucket-sized aggregate, no joins: run it BEFORE the pair join
    * (that is what [[pairsAuto]] does).
    *
    * Output (single row, all exact integers + two fixed-point
    * ratios): n_docs (docs with ≥1 shingle), n_prefix_tokens,
    * n_buckets, max_bucket, cand_pairs_bound, avg_df_fp_e3,
    * cand_per_doc_fp_e3.
    */
  def prefixSaturationStats(docs: DataFrame, idCol: String,
                            textCol: String,
                            threshold: Double): DataFrame = {
    graft.functions.expressions.ShingleHashes.register(docs.sparkSession)
    prefixSaturationStatsFromBase(docs
      .select(col(idCol).as("doc"),
        expr(s"graft_shingle_hashes($textCol, 3)").as("sh"))
      .withColumn("n", size(col("sh"))), threshold)
  }

  /** [[prefixSaturationStats]] over a prebuilt (doc, sh, n) frame —
    * [[pairsAuto]] passes its shared checkpointed [[shingleBase]] so
    * the census and the routed pair path shingle the corpus once.
    */
  private def prefixSaturationStatsFromBase(rawBase: DataFrame,
                                            threshold: Double): DataFrame = {
    val base = rawBase.where(col("n") > 0)
    val prefixLen =
      (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1).cast("int")
    val buckets = base
      .select(explode(slice(col("sh"), lit(1), prefixLen)).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("c"))
    val nd = base.agg(count(lit(1)).as("n_docs"))
    buckets
      .agg(sum(col("c")).as("n_prefix_tokens"),
        count(lit(1)).as("n_buckets"),
        max(col("c")).as("max_bucket"),
        // summed as exact LONGS (a double sum would drift with
        // partition order); c·(c−1) is even, halved once at the end
        sum(col("c") * (col("c") - 1)).as("cand2x"))
      .crossJoin(nd) // 1-row aggregate: broadcast, no data motion
      .select(col("n_docs"), col("n_prefix_tokens"), col("n_buckets"),
        col("max_bucket"), expr("cand2x DIV 2").as("cand_pairs_bound"))
      .select(col("n_docs"), col("n_prefix_tokens"), col("n_buckets"),
        col("max_bucket"), col("cand_pairs_bound"),
        round(lit(1000.0) * col("n_prefix_tokens").cast("double")
          / col("n_buckets").cast("double"), 0).cast("long")
          .as("avg_df_fp_e3"),
        round(lit(1000.0) * col("cand_pairs_bound").cast("double")
          / col("n_docs").cast("double"), 0).cast("long")
          .as("cand_per_doc_fp_e3"))
  }

  /** Near-dup pairs with SELF-SELECTING strategy: measure the PPJoin
    * prefix-bucket candidate bound ([[prefixSaturationStats]] — one
    * cheap aggregate), then run the EXACT prefix-filtered join while
    * the bound stays under `maxCandPerDoc` candidates per document,
    * and fall back to the MinHash-LSH candidate path (same exact
    * Jaccard verification on the shortlist) once the corpus is
    * saturated and the exact join's Σ c² term would go quadratic.
    * The routing compare is pure integer cross-multiplication
    * (bound > maxCandPerDoc · n_docs), so an engine mirroring the
    * same rule routes identically at every scale. LSH recall below
    * the band s-curve is the documented trade — the alternative on a
    * saturated corpus is an O(n²) join that never finishes.
    * Emits (d1, d2, jac) like both underlying paths.
    */
  def pairsAuto(docs: DataFrame, idCol: String, textCol: String,
                threshold: Double, maxCandPerDoc: Long = 64): DataFrame = {
    // ONE shared shingle pass (r20): the census head() materializes
    // the checkpointed base, and whichever pair path wins the route
    // reads the same materialized frame — the old shape re-shingled
    // the whole corpus for the census and again for the pair join.
    val base = shingleBase(docs, idCol, textCol)
    val stats = prefixSaturationStatsFromBase(base, threshold)
      .select(col("cand_pairs_bound"), col("n_docs")).head()
    val saturated =
      stats.getLong(0) > maxCandPerDoc * stats.getLong(1)
    if (saturated) minhashLshPairsFromBase(base, threshold = threshold)
    else jaccardPairsFromBase(base, threshold)
  }

  /** EXACT Jaccard pairs like [[jaccardPairs]], but the PPJoin global
    * shingle order is ASCENDING DOCUMENT FREQUENCY (ties by hash)
    * instead of raw hash order. On Zipf-distributed corpora the
    * prefixes then hold the RAREST shingles, so the inverted-index
    * buckets — and the candidate join that dominates at 100 TB —
    * shrink by orders of magnitude. Costs one extra corpus-shingle
    * aggregation (the document-frequency table) and a per-doc
    * rank — the standard PPJoin trade. Result set is identical under
    * any total order (same oracle).
    */
  def jaccardPairsFreq(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double): DataFrame = {
    graft.functions.expressions.SortedLongIntersectSize.register(docs.sparkSession)
    graft.functions.expressions.ShingleHashes.register(docs.sparkSession)
    val base = docs
      .select(col(idCol).as("doc"),
        expr(s"graft_shingle_hashes($textCol, 3)").as("sh"))
      .withColumn("n", size(col("sh")))
      .localCheckpoint(false) // lazy: first action materializes; blocks
      // freed by ContextCleaner when the plan is GC'd — persist()
      // would pin an input-sized cache entry per call (see Packing)
    val exploded = base.select(col("doc"), col("n"), explode(col("sh")).as("s"))
    // sh is per-doc distinct, so count(*) is document frequency.
    val dfreq = exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc")).orderBy(col("df"), col("s"))
    // epsilon guard: see jaccardPairs — a float round-up of t*n must
    // not shorten the prefix
    val prefixLen =
      (col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1).cast("int")
    // rn is the 1-based position in the (df, hash) GLOBAL total order —
    // consistent across docs, so the positional filter's
    // earliest-common-token argument holds here exactly as in the
    // hash-order variant (p is 0-based there; rn − 1 matches)
    val prefixes = exploded.join(dfreq, "s")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= prefixLen)
      .select(col("doc"), col("n"), (col("rn") - 1).as("p"), col("s"))
    verifyCandidates(base,
      candidatesFromPrefixes(prefixes, threshold, positional = true),
      threshold)
  }

  /** Prefix-bucket self-join + length filter -> distinct candidate
    * pairs (d1 < d2). `prefixes` columns: (doc, n, s).
    */
  /** Candidate pairs from shared prefix tokens, with the PPJoin length
    * filter and (when the prefixes carry 0-based array positions `p`
    * in the GLOBAL sorted-hash order) the positional filter: for the
    * earliest shared-in-prefix token no common token precedes it —
    * any earlier common token would sit at earlier positions on BOTH
    * sides of the same global order and hence inside both prefixes —
    * so overlap ≤ min(n1−p1, n2−p2), and a Jaccard ≥ t needs overlap
    * ≥ ⌈t/(1+t)·(n1+n2)⌉. Later shared tokens may under-bound and be
    * filtered, but the distinct keeps a pair if ANY of its rows
    * passes, and a true pair's earliest row always does — sound, no
    * false negatives.
    */
  private def candidatesFromPrefixes(prefixes: DataFrame,
                                     threshold: Double,
                                     positional: Boolean = false): DataFrame = {
    val lengthOk =
      col("a.s") === col("b.s") && col("a.doc") < col("b.doc") &&
        col("b.n") * threshold <= col("a.n") &&
        col("a.n") * threshold <= col("b.n")
    val cond =
      if (!positional) lengthOk
      else lengthOk &&
        // t/(1+t) is computed in floating point; when the quotient
        // rounds UP (e.g. t=0.25 → 0.2000…0111) the product can land
        // an ulp above an exact integer and ceil then inflates the
        // required overlap by 1, dropping a genuinely qualifying pair.
        // Subtracting a small epsilon before ceil (standard PPJoin
        // guard) keeps the bound sound; at worst it admits one extra
        // candidate, which the exact verify step filters anyway.
        least(col("a.n") - col("a.p"), col("b.n") - col("b.p")) >=
          ceil(lit(threshold / (1.0 + threshold)) * (col("a.n") + col("b.n"))
            - lit(1e-9))
    prefixes.as("a").join(prefixes.as("b"), cond)
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .distinct()
  }

  /** Verification: native merge-scan intersection over the sorted
    * shingle arrays — the doc-side lookups broadcast (base is
    * corpus-row-sized, not shingle-row-sized), so candidates never
    * shuffle with their array payloads.
    */
  private def verifyCandidates(base: DataFrame, cand: DataFrame,
                               threshold: Double): DataFrame = {
    val a = base.select(col("doc").as("d1"), col("sh").as("sh1"), col("n").as("n1"))
    val b = base.select(col("doc").as("d2"), col("sh").as("sh2"), col("n").as("n2"))
    cand.join(a, "d1").join(b, "d2")
      .withColumn("i", expr("graft_sorted_long_intersect_size(sh1, sh2)"))
      .select(col("d1"), col("d2"),
        (col("i").cast("double") / (col("n1") + col("n2") - col("i"))).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** MinHash+LSH near-dup detection, fully row-local until the band
    * join: per-doc distinct shingle ARRAY (no explode), single-pass
    * k-component signature via the native `graft_minhash` expression,
    * band keys, bucket self-join for candidates, and exact-Jaccard
    * verification via `array_intersect` on just the candidate pairs.
    * The only shuffles are the tiny band join and the candidate
    * lookups — the corpus-wide shingle exchange is gone, which is what
    * survives a 100 TB corpus.
    */
  /** (doc, band, key) LSH band keys — the bucket-join key material
    * shared by [[minhashLshPairs]] and [[lshBucketCensus]]. Expects
    * `base` columns (doc, sig) with sig = k-component minhash.
    */
  private def bandedKeys(base: DataFrame, k: Int, bands: Int): DataFrame = {
    val rpb = k / bands
    val bandStructs = (0 until bands).map { b =>
      val comps = (0 until rpb).map(r => element_at(col("sig"), b * rpb + r + 1))
      struct(lit(b).as("band"), md5(concat_ws("|", comps: _*)).as("key"))
    }
    base.select(col("doc"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("key"))
  }

  /** Work-count census for the LSH candidate path — the measured
    * counterpart of [[prefixSaturationStats]] for the BUCKETED
    * strategy: bucket sizes per (band, key) and the candidate bound
    * Σ c·(c−1)/2, i.e. the number of pair rows the band self-join in
    * [[minhashLshPairs]] can emit before dedup/verify. One scan + one
    * bucket-sized aggregate, no joins. On any corpus where LSH is the
    * right route, cand_per_doc stays O(bands · dup-cluster size) —
    * flat in n — while the exact path's prefix census grows ∝ n.
    * Output (single row): n_docs, n_band_rows, n_buckets, max_bucket,
    * cand_pairs_bound, cand_per_doc_fp_e3.
    */
  def lshBucketCensus(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 16, bands: Int = 4): DataFrame = {
    graft.functions.expressions.MinHashSignature.register(docs.sparkSession)
    graft.functions.expressions.ShingleHashes.register(docs.sparkSession)
    val base = docs
      .select(col(idCol).as("doc"),
        expr(s"graft_shingle_hashes($textCol, 3)").as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", expr(s"graft_minhash(sh, $k)"))
    val buckets = bandedKeys(base, k, bands)
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("c"))
    val nd = base.agg(count(lit(1)).as("n_docs"))
    buckets
      .agg(sum(col("c")).as("n_band_rows"),
        count(lit(1)).as("n_buckets"),
        max(col("c")).as("max_bucket"),
        sum(col("c") * (col("c") - 1)).as("cand2x"))
      .crossJoin(nd)
      .select(col("n_docs"), col("n_band_rows"), col("n_buckets"),
        col("max_bucket"), expr("cand2x DIV 2").as("cand_pairs_bound"),
        round(lit(1000.0) * (expr("cand2x DIV 2")).cast("double")
          / col("n_docs").cast("double"), 0).cast("long")
          .as("cand_per_doc_fp_e3"))
  }

  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    graft.functions.expressions.MinHashSignature.register(docs.sparkSession)
    graft.functions.expressions.SortedLongIntersectSize.register(docs.sparkSession)
    graft.functions.expressions.ShingleHashes.register(docs.sparkSession)
    minhashLshFromSigBase(docs
      .select(col(idCol).as("doc"),
        expr(s"graft_shingle_hashes($textCol, 3)").as("sh"))
      .withColumn("n", size(col("sh")))
      .withColumn("sig", expr(s"graft_minhash(sh, $k)"))
      .localCheckpoint(false), // lazy: first action materializes; blocks
      // freed by ContextCleaner when the plan is GC'd — persist()
      // would pin an input-sized cache entry per call (see Packing)
      k, bands, threshold)
  }

  /** [[minhashLshPairs]] over a prebuilt [[shingleBase]] frame
    * ([[pairsAuto]]'s saturated route): only the signature column is
    * added (and lazily checkpointed — it feeds the band keys and both
    * verify lookups), the shingle pass itself is shared.
    */
  private def minhashLshPairsFromBase(base: DataFrame, k: Int = 16,
                                      bands: Int = 4,
                                      threshold: Double): DataFrame =
    minhashLshFromSigBase(
      base.withColumn("sig", expr(s"graft_minhash(sh, $k)"))
        .localCheckpoint(false),
      k, bands, threshold)

  /** Band join + exact verify over a materialized
    * (doc, sh, n, sig) frame.
    */
  private def minhashLshFromSigBase(base: DataFrame, k: Int, bands: Int,
                                    threshold: Double): DataFrame = {
    val banded = bandedKeys(base, k, bands)
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("d1"), col("y.doc").as("d2"))
      .distinct()
    val a = base.select(col("doc").as("d1"), col("sh").as("sh1"), col("n").as("n1"))
    val b = base.select(col("doc").as("d2"), col("sh").as("sh2"), col("n").as("n2"))
    cand.join(a, "d1").join(b, "d2")
      .withColumn("i", expr("graft_sorted_long_intersect_size(sh1, sh2)"))
      .select(col("d1"), col("d2"),
        (col("i").cast("double") / (col("n1") + col("n2") - col("i"))).as("jac"))
      .where(col("jac") >= threshold)
  }

  /** SimHash fingerprints (60-bit) per doc via the native expression. */
  def simhashFingerprints(docs: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    graft.functions.expressions.Simhash60.register(docs.sparkSession)
    docs.select(col(idCol).as("doc"),
      expr(s"graft_simhash60($textCol)").as("sim"))
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming (<= 3
    * for guaranteed recall with 4 chunks over 60 bits).
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fp = simhashFingerprints(docs, idCol, textCol)
      .localCheckpoint(false) // lazy: first action materializes; blocks
      // freed by ContextCleaner when the plan is GC'd — persist()
      // would pin an input-sized cache entry per call (see Packing)
    val chunkStructs = (0 until 4).map { c =>
      struct(lit(c).as("c"),
        shiftright(col("sim"), 15 * c).bitwiseAND(lit(32767L)).as("k"))
    }
    val chunks = fp.select(col("doc"), col("sim"),
        explode(array(chunkStructs: _*)).as("ck"))
      .select(col("doc"), col("sim"), col("ck.c").as("c"), col("ck.k").as("k"))
    chunks.as("x").join(chunks.as("y"),
        col("x.c") === col("y.c") && col("x.k") === col("y.k") &&
        col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("d1"), col("y.doc").as("d2"),
        expr("bit_count(x.sim ^ y.sim)").cast("int").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
