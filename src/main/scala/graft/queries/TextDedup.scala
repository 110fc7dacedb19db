package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.TextFns._
import graft.operators.Dedup

/** Text-analysis + deduplication queries over `documents` (training-
  * data pipeline extensions; BASELINE.json north star). Oracles
  * reproduce every hash via md5 so DuckDB matches bit-for-bit.
  */
object TextDedup {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "text_char_entropy" -> ((s, d) => {
      // Character-distribution entropy gate (graft_char_entropy, a
      // single-pass codegen'd expression): low entropy = repeated-char
      // junk, high = byte soup. Pure projection — the explode→groupBy
      // formulation the oracle uses would shuffle one row PER
      // CHARACTER; this shuffles nothing. Fixed-point per-term longs
      // (see CharEntropy) keep the hash comparable.
      graft.functions.expressions.CharEntropy.register(s)
      t(s, d, "documents")
        .select(col("doc_id"),
          expr("graft_char_entropy(text)").as("entropy_fp_e6"))
        .orderBy("doc_id")
    }),
    "text_pmi_bigrams" -> ((s, d) => {
      // Top-50 word collocations by pointwise mutual information —
      // the phrase-mining signal (word2vec-phrases / NPMI gates).
      // Bigram and unigram counts are two corpus-wide aggregates on
      // token keys; the three totals that normalize them are 1-row
      // broadcasts. PMI itself is a double from exact integer counts
      // with the oracle's exact expression shape, fixed-pointed to e6
      // for a stable hash; min-count 5 prunes the noise tail before
      // the top-k sort.
      val docs = t(s, d, "documents")
      val w = split(col("text"), " ")
      // split ONCE into a bound column before the lambda (r20): HOF
      // lambdas are interpreted, so the old inline form re-ran
      // split(text) for BOTH element_at calls of every bigram —
      // O(words²) splits per doc; this is O(words), same bigrams.
      val bigrams = docs.select(w.as("w")).select(explode(expr(
        """CASE WHEN size(w) >= 2
          |THEN transform(sequence(1, size(w) - 1),
          |     i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))
          |ELSE array() END""".stripMargin)).as("bg"))
      val unigrams = docs.select(explode(w).as("tok"))
      // cb feeds the nb total and the PMI numerator; cu feeds the nu
      // total and BOTH word-marginal joins — materialize each once or
      // the corpus explode+shuffle subtree re-evaluates per consumer
      // (2× for bigrams, 3× for unigrams).
      val cb = bigrams.groupBy("bg").agg(count(lit(1)).as("cxy"))
        .localCheckpoint()
      val cu = unigrams.groupBy("tok").agg(count(lit(1)).as("cw"))
        .localCheckpoint()
      val nb = cb.agg(sum(col("cxy")).as("nb"))
      val nu = cu.agg(sum(col("cw")).as("nu"))
      val parts = cb.where(col("cxy") >= 5)
        .withColumn("w1", split(col("bg"), " ").getItem(0))
        .withColumn("w2", split(col("bg"), " ").getItem(1))
      parts
        .join(cu.select(col("tok").as("w1"), col("cw").as("c1")), "w1")
        .join(cu.select(col("tok").as("w2"), col("cw").as("c2")), "w2")
        .crossJoin(nb).crossJoin(nu)
        .select(col("w1"), col("w2"), col("cxy"),
          round(lit(1000000.0) * log(
            (col("cxy").cast("double") / col("nb").cast("double"))
              / ((col("c1").cast("double") / col("nu").cast("double"))
                 * (col("c2").cast("double") / col("nu").cast("double")))),
            0).cast("long").as("pmi_fp_e6"))
        .orderBy(col("pmi_fp_e6").desc, col("w1"), col("w2"))
        .limit(50)
    }),
    "text_dedup_tokens_ordered" -> ((s, d) => {
      // First-occurrence-preserving token dedup INSIDE each row — the
      // repetition-collapse preprocessing step. Zero shuffle; one
      // native O(tokens) hash-set pass per row (graft_token_dedup_
      // ordered, pinned == the filter-with-index HOF formulation it
      // replaced: array_position rescans the array per element —
      // O(k²)/row, ~450 µs/doc, 2.26 s of sf0.1 census wall for a
      // scan-shaped projection).
      graft.functions.expressions.TokenDedupOrdered.register(s)
      t(s, d, "documents")
        .select(col("doc_id"),
          expr("graft_token_dedup_ordered(text)").as("r"))
        .select(col("doc_id"), col("r.n_tokens").as("n_tokens"),
          col("r.n_unique").as("n_unique"),
          col("r.dedup_text").as("dedup_text"))
        .orderBy("doc_id")
    }),
    "text_feature_hashing" -> ((s, d) => {
      // Hashing-trick featurization (CountVectorizer without a
      // vocabulary): token → salted-md5 bucket mod 64, per-doc bucket
      // counts. The shuffle key is (doc_id, bucket), so partial
      // aggregation collapses each doc to ≤ 64 rows map-side — the
      // fixed-width sparse vector ML ingestion wants, with no
      // vocabulary build pass and no OOV handling.
      val toks = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      toks.select(col("doc_id"),
          pmod(hash60(col("tok")), lit(64)).as("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("doc_id", "bucket")
    }),
    "text_token_stats" -> ((s, d) => {
      val w = tokens(col("text"))
      t(s, d, "documents").select(
          col("doc_id"),
          size(w).as("word_cnt"),
          col("n_chars"),
          (col("n_chars").cast("double") / size(w)).as("chars_per_token"))
        .orderBy("doc_id")
    }),
    "text_quality_score" -> ((s, d) => {
      val w = tokens(col("text"))
      val wordCnt = size(w)
      val uniqRatio = size(array_distinct(w)).cast("double") / wordCnt
      val avgWordLen = length(replace(col("text"), lit(" "), lit("")))
        .cast("double") / wordCnt
      t(s, d, "documents").select(
          col("doc_id"), wordCnt.as("word_cnt"), uniqRatio.as("uniq_ratio"),
          avgWordLen.as("avg_word_len"),
          (wordCnt >= 50 && uniqRatio >= 0.3).as("is_quality"))
        .orderBy("doc_id")
    }),
    "text_langid" -> ((s, d) => {
      // Stopword-marker argmax; langMarkers order breaks ties (en
      // first). Scores looked up by language KEY, guess built
      // generically from the marker list (TextFns.langGuess).
      val sc = langScores(col("text"))
      t(s, d, "documents").select(
          col("doc_id"), sc("en").as("score_en"), sc("de").as("score_de"),
          sc("es").as("score_es"), sc("fr").as("score_fr"),
          langGuess(col("text")).as("lang_guess"))
        .orderBy("doc_id")
    }),
    "text_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(
          col("doc_id"), md5(col("text")).as("fp"),
          hash60(col("text")).as("fp60"))
        .orderBy("doc_id")),
    "text_rolling_fingerprint" -> ((s, d) =>
      // Rabin–Karp-style polynomial rolling hash over character codes,
      // mod 2^31-1 (no 64-bit overflow: acc*31 + code < 2^36). Pure
      // codegen HOF fold — incremental-update-friendly shape for
      // streaming fingerprints.
      t(s, d, "documents").select(col("doc_id"),
          aggregate(transform(split(col("text"), ""), c => ascii(c).cast("long")),
            lit(0L), (acc, ch) => (acc * 31 + ch) % 2147483647L).as("rh"))
        .orderBy("doc_id")),
    "text_cdc_chunks" -> ((s, d) =>
      // Content-defined chunking (functions/expressions/CdcBoundaries,
      // the FastCDC/LBFS cut rule): boundary where the W=16 rolling
      // polynomial hash ≡ 0 (mod 32) — so a 1-byte edit moves O(1)
      // chunks instead of every fixed-width chunk after it, the
      // property chunk-level dedup at 100 TB depends on. O(n) per doc,
      // row-local native codegen; chunk hashes are md5 over the cut
      // substrings, recomputable by any engine from (start, len).
      cdcChunks(s, d).orderBy("doc_id", "chunk_no")),
    "dedup_cdc_chunks" -> ((s, d) => {
      // Chunk-level dedup — the consumer CDC chunking exists for:
      // documents sharing ≥ 2 content-defined chunk hashes are near-
      // dup candidates even when one is a shifted/edited copy (the
      // boundaries re-synchronize after an edit, so shared tails keep
      // identical chunk md5s). Self equi-join on the chunk hash —
      // bucketed by content, never all-pairs; the ≥ 2 floor drops
      // coincidental single-chunk collisions.
      val dc = cdcChunks(s, d).select("doc_id", "chunk_md5").distinct()
      dc.as("a").join(dc.as("b"),
          col("a.chunk_md5") === col("b.chunk_md5") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 2)
        .orderBy("d1", "d2")
    }),
    "dedup_cdc_chunks_capped" -> ((s, d) => {
      // STOP-CHUNK-suppressed chunk dedup — the linear sibling of
      // dedup_cdc_chunks. The r14 census (cdcPairCensus / WorkCount
      // `cdc` probe) measured the uncapped self-join's pair bound
      // Σ f·(f−1)/2 growing exactly ∝ n² on this templated corpus
      // (242 → 720 → 2,411 cand/doc at sf1/sf3/sf10; max chunk
      // frequency ∝ n, 2,494 → 25,265): a constant FRACTION of docs
      // share boilerplate chunks, so the uncapped join is
      // definition-quadratic — fenced at sf ≥ 1 like the PPJoin rows.
      // The fix is the same as PPJoin's stopword discipline: a chunk
      // hash shared by more than CAP=64 docs is template boilerplate
      // and carries no pairwise dedup signal (it re-synchronizes in
      // EVERY doc built from the template); dropping those hashes
      // bounds the join at Σ_{f≤CAP} f·(f−1)/2 ≤ (CAP/2)·chunk_rows —
      // linear in corpus size, and the surviving pairs are exactly the
      // uncapped result restricted to rare-chunk evidence.
      val cap = 64
      val dc = cdcChunks(s, d).select("doc_id", "chunk_md5").distinct()
      val rare = dc.groupBy(col("chunk_md5"))
        .agg(count(lit(1)).as("f"))
        .where(col("f") <= cap)
        .select(col("chunk_md5"))
      val kept = dc.join(rare, "chunk_md5")
      kept.as("a").join(kept.as("b"),
          col("a.chunk_md5") === col("b.chunk_md5") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 2)
        .orderBy("d1", "d2")
    }),
    "text_stopword_ratio" -> ((s, d) => {
      // stopword density — the quality-scoring signal used to filter
      // boilerplate/low-content docs from training corpora.
      val w = tokens(col("text"))
      val stopCnt = size(filter(w, tk => tk === "the" || tk === "a"))
      t(s, d, "documents").select(col("doc_id"),
          size(w).as("word_cnt"), stopCnt.as("stop_cnt"),
          (stopCnt.cast("double") / size(w)).as("stop_ratio"))
        .orderBy("doc_id")
    }),
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), "doc_id", "text")
        .orderBy("doc_id")),
    "dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(t(s, d, "documents"), "doc_id", "text", 0.5)
        .orderBy("d1", "d2")),
    "dedup_ngram_jaccard_freq" -> ((s, d) =>
      // same exact result set under frequency-ordered PPJoin prefixes
      // (rare shingles first -> far smaller candidate buckets on Zipf
      // corpora); same oracle as dedup_ngram_jaccard.
      Dedup.jaccardPairsFreq(t(s, d, "documents"), "doc_id", "text", 0.5)
        .orderBy("d1", "d2")),
    "dedup_cluster_cc" -> ((s, d) => {
      // pairs -> duplicate GROUPS: connected components over the exact
      // Jaccard>=0.5 pair graph, with each doc's cluster id = min doc
      // id in its component — the "keep one canonical doc per
      // duplicate set" step of corpus curation. Oracle walks the same
      // graph with a recursive CTE.
      //
      // Alternating large-star/small-star contraction (O(log n)
      // rounds), not hash-min propagation: as the corpus grows,
      // near-dup components grow too, and hash-min's O(diameter)
      // round count made the query the board's only super-linear
      // entry (sf-scale exponent 1.13; the sf1 head-to-head measured
      // 87 s hash-min vs 23 s alternating on the same pair graph).
      // Both emit the identical min-id labeling.
      val pairs = Dedup.jaccardPairs(t(s, d, "documents"),
        "doc_id", "text", 0.5)
      graft.operators.Components.connectedAuto(pairs, "d1", "d2")
        .select(col("node").as("doc"), col("component").as("cluster"))
        .orderBy("doc")
    }),
    "dedup_prefix_saturation" -> ((s, d) =>
      // The pre-flight diagnostic for the exact PPJoin path: prefix-
      // bucket census (bucket count, max, candidate-pair bound Σ c·
      // (c−1)/2, candidates per doc). On Heaps-law text the bound per
      // doc stays flat as the corpus grows; on bounded-vocabulary
      // data it grows ∝ n — the measured sf1→sf3 1.91 exponent on
      // dedup_cluster_cc is this number exploding. One scan + one
      // bucket aggregate, no joins; pairsAuto routes on it.
      Dedup.prefixSaturationStats(t(s, d, "documents"),
        "doc_id", "text", 0.5)),
    "dedup_cluster_cc_auto" -> ((s, d) => {
      // dedup_cluster_cc with SELF-SELECTING pair strategy
      // (Dedup.pairsAuto): the saturation bound above decides, by
      // pure integer compare (cand_pairs_bound > 64 · n_docs), between
      // the exact PPJoin pairs and MinHash-LSH candidates (exact-
      // verified) — so a template-heavy corpus can't silently drag
      // the pipeline into the quadratic regime. The oracle mirrors
      // the SAME routing rule in SQL, so both engines pick the same
      // branch at every SF.
      val pairs = Dedup.pairsAuto(t(s, d, "documents"),
        "doc_id", "text", 0.5)
      graft.operators.Components.connectedAuto(pairs, "d1", "d2")
        .select(col("node").as("doc"), col("component").as("cluster"))
        .orderBy("doc")
    }),
    "dedup_component_size_hist" -> ((s, d) => {
      // G12/C11: size distribution of NEAR-dup components — the
      // observability counterpart to dedup_cluster_cc (which emits
      // the assignment): how many duplicate groups of each size does
      // the Jaccard≥0.5 graph contain? Giant components here mean a
      // boilerplate family or a threshold set too low — the knob
      // check before a dedup pass deletes half the corpus. Component
      // assignment reuses operators/Components; the histogram is two
      // tiny aggregates on top.
      val pairs = Dedup.jaccardPairs(t(s, d, "documents"),
        "doc_id", "text", 0.5)
      // same O(log n) contraction as dedup_cluster_cc (shared pair
      // graph, shared scale argument)
      graft.operators.Components.connectedAuto(pairs, "d1", "d2")
        .groupBy(col("component")).agg(count(lit(1)).as("sz"))
        .groupBy(col("sz")).agg(count(lit(1)).as("n_components"))
        .select(col("sz"), col("n_components"),
          (col("sz") * col("n_components")).as("n_docs"))
        .orderBy("sz")
    }),
    "text_bpe_token_count" -> ((s, d) => {
      // BPE-ish pre-tokenization (GPT-2-style: letter runs, digit
      // runs, punctuation runs, each absorbing one leading space) next
      // to the whitespace count — the token-budget estimate a training
      // pipeline bills by. Spark side is the native one-byte-scan
      // graft_token_count (no regex engine, no match-array allocation
      // — NativeExpressionsSpec pins it equal to the regexp
      // formulation); the DuckDB oracle keeps the portable RE2 regex.
      graft.functions.expressions.TokenCount.register(s)
      val bpe = expr("graft_token_count(text)")
      t(s, d, "documents").select(
          col("doc_id"),
          size(tokens(col("text"))).as("n_ws_tokens"),
          bpe.as("n_bpe_tokens"))
        .orderBy("doc_id")
    }),
    "decontaminate" -> ((s, d) => {
      // benchmark decontamination: docs overlapping the "eval set"
      // (here: every 50th doc) by >= 1 shingle, with overlap counts.
      val docs = t(s, d, "documents")
      Dedup.decontaminate(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "doc_id", "text")
        .select(col("doc").as("doc_id"), col("n_shared"))
        .orderBy("doc_id")
    }),
    "quota_per_source" -> ((s, d) => {
      // domain balancing: deterministic per-source quota (first 10 by
      // doc_id). One window sort per source partition; under extreme
      // source skew swap for sample_stratified-style hash gates.
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      t(s, d, "documents")
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 10)
        .select(col("source"), col("doc_id"), col("rk"))
        .orderBy("source", "doc_id")
    }),
    "dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLshPairs(t(s, d, "documents"), "doc_id", "text")
        .orderBy("d1", "d2")),
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), "doc_id", "text")
        .orderBy("d1", "d2")),
    "text_ngram_topk" -> ((s, d) => {
      // corpus vocabulary: top-50 word trigrams by document frequency
      // (distinct docs), the frequency-table step of corpus curation.
      // Row-local TYPE dedup before the explode, so the (doc, shingle)
      // type frame needs no corpus-wide .distinct() exchange — at
      // 100 TB that shuffle was the whole cost of this query (r16
      // extension; same move as text_novelty_ngrams). The shingle
      // build is the native graft_shingles (pinned == array_sort(
      // array_distinct(HOF shingles)), NativeExpressionsSpec): the
      // HOF transform/element_at/concat_ws formulation allocated a
      // column-object tree per gram — ~2.3 s of this row's 3.2 s
      // sf0.1 census wall; the native byte-walk emits the same
      // distinct grams at scan speed (order under explode is
      // irrelevant to the groupBy).
      graft.functions.expressions.WordShingles.register(s)
      t(s, d, "documents")
        .select(col("doc_id"),
          explode(expr("graft_shingles(text, 3)")).as("s"))
        .groupBy(col("s"))
        .agg(count(lit(1)).as("doc_freq"))
        .orderBy(col("doc_freq").desc, col("s"))
        .limit(50)
    }),
    "text_length_histogram" -> ((s, d) =>
      // document length distribution in 100-char buckets.
      t(s, d, "documents")
        .groupBy(floor(col("n_chars") / 100).cast("long").as("bucket"))
        .agg(count(lit(1)).as("cnt"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("bucket")),
    "corpus_curate" -> ((s, d) =>
      // END-TO-END curation: quality gate -> language gate -> exact
      // dedup -> MinHash+LSH near-dup removal, with per-doc provenance.
      // The whole composition is oracle-checked, not just the pieces.
      graft.operators.CorpusPipeline
        .curate(t(s, d, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("lang_guess"), col("canonical_id"),
                col("drop_reason"))
        .orderBy("doc_id")),
    "text_normalize" -> ((s, d) => {
      // Canonical text normalization — the pre-tokenizer stage every
      // pipeline runs before dedup/training: lowercase, tokenize,
      // strip stopwords, re-join. Pure map-side projection (zero
      // shuffle); the md5 of the normalized form is the canonical key
      // downstream exact-dedup can group on.
      val toks = tokens(lower(col("text")))
      val kept = filter(toks,
        tk => !(tk === "the" || tk === "a" || tk === "and"))
      t(s, d, "documents").select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          size(kept).as("n_kept"),
          md5(concat_ws(" ", kept)).as("norm_md5"))
        .orderBy("doc_id")
    }),
    "text_gopher_repetition" -> ((s, d) => {
      // Gopher repetition filters (Rae et al. 2021, Table A1) over
      // word n-grams: coverage of the heaviest 2-gram and total
      // characters inside duplicated 5-grams, each as a fraction of
      // n_chars; keep thresholds 0.20 / 0.15 are the paper's.
      // "Heaviest" = max over grams of count × gram length — stays
      // deterministic under count ties, unlike argmax-by-count.
      // Both stats are per-DOCUMENT, so the native one-pass
      // graft_gopher_rep computes them row-locally: ONE scan, zero
      // data exchanges before the output sort. Through r16 this row
      // exploded every gram into a (doc, n, gram) shuffle and joined
      // the per-doc reduce back onto a doc spine — ~|corpus words|
      // rows shuffled twice for a statistic that never needed another
      // row (measured 4.9 s of the sf0.1 bench; the rewrite is
      // scan-speed). Docs with < 2 tokens get (0, 0) from the
      // expression itself — a quality gate that silently skips
      // documents is not a gate.
      graft.functions.expressions.GopherRepetition.register(s)
      // two-step select: the struct is evaluated ONCE per row
      // (CollapseProject refuses to inline a non-cheap expression
      // referenced more than once); coalesce keeps the old left-join
      // zeros for null text (the expression is null-in-null-out; the
      // join-era shape scored such docs (0, 0, keep=true))
      val t2 = coalesce(col("r.t2"), lit(0L))
      val d5 = coalesce(col("r.d5"), lit(0L))
      t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          expr("graft_gopher_rep(text)").as("r"))
        .select(col("doc_id"),
          t2.cast("long").as("top2_chars"),
          d5.cast("long").as("dup5_chars"),
          (t2.cast("double") / col("n_chars")).as("top2_frac"),
          (d5.cast("double") / col("n_chars")).as("dup5_frac"),
          (t2.cast("double") / col("n_chars") <= 0.20 &&
            d5.cast("double") / col("n_chars") <= 0.15)
            .as("keep"))
        .orderBy("doc_id")
    }),
    "text_zipf_slope" -> ((s, d) => {
      // T23: Zipf slope of the token frequency distribution — OLS of
      // ln(freq) on ln(rank) over the top-20 types (natural text
      // sits near −1; generated/templated text drifts). Each ln is
      // FIXED-POINTED e4 per term before any sum (the charlm recipe —
      // the only libm calls are per-row, rounded identically by both
      // engines; e4 keeps n·Σx² inside bigint), so the five OLS sums
      // are exact integers and the slope is one shaped division,
      // fixed-point e6. Ranks are total (count desc, then token).
      //
      // Head cap 20, not the original 1000 (r19 gate-tier sweep): the
      // generated corpus vocabulary is 31 types at sf0.01 and 88 at
      // sf1, so rk <= 1000 NEVER bound at any gate SF — the cap was a
      // parameter owned by no tier (the assoc_rules top-20 class). At
      // 20 the cap drops real tail types at every SF, so a cap
      // mutation moves the OLS sums and the gate kills it;
      // GateSensitivitySpec pins vocab > cap at the gate SF.
      // the explode emits native per-row token TYPE counts (pre-
      // combined before the Generate — the tfidf/charlm r16 move);
      // sum(c) equals the old occurrence count(*) exactly
      graft.functions.expressions.TokenTypeCounts.register(s)
      val tf = t(s, d, "documents")
        .select(explode(expr("graft_token_counts(text)")).as("t"))
        .groupBy(col("t.term").as("tok")).agg(sum(col("t.c")).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("tok"))
      val ranked = tf
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 20)
        .select(
          round(lit(10000.0) * log(col("rk").cast("double")), 0)
            .cast("long").as("lr"),
          round(lit(10000.0) * log(col("c").cast("double")), 0)
            .cast("long").as("lf"))
      ranked.agg(count(lit(1)).as("n"), sum(col("lr")).as("sx"),
          sum(col("lf")).as("sy"), sum(col("lr") * col("lr")).as("sxx"),
          sum(col("lr") * col("lf")).as("sxy"))
        .select(col("n"),
          round(lit(1000000.0) *
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"),
            0).cast("long").as("zipf_slope_fp_e6"))
    }),
    "tokenizer_fertility_by_lang" -> ((s, d) => {
      // T22: tokenizer fertility per language — BPE-ish tokens per
      // whitespace word, the metric that exposes which languages a
      // tokenizer fragments (fertility ≫ 1 ⇒ that language pays more
      // compute per word and the mixture is silently skewed). Sums
      // are exact integers from the native one-pass graft_token_count;
      // fertility is one shaped division fixed-pointed e6. One scan,
      // one language-key aggregate.
      graft.functions.expressions.TokenCount.register(s)
      t(s, d, "documents")
        .select(col("lang"),
          expr("graft_token_count(text)").cast("long").as("bpe"),
          size(tokens(col("text"))).cast("long").as("ws"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("bpe")).as("bpe_tokens"),
          sum(col("ws")).as("ws_tokens"))
        .select(col("lang"), col("n_docs"), col("bpe_tokens"),
          col("ws_tokens"),
          round(lit(1000000.0) * col("bpe_tokens").cast("double")
            / col("ws_tokens").cast("double"), 0).cast("long")
            .as("fertility_fp_e6"))
        .orderBy("lang")
    }),
    "text_novelty_ngrams" -> ((s, d) => {
      // T20: n-gram novelty — per document, the fraction of its word
      // trigram TYPES that occur in NO other document (the
      // memorization/novelty axis: boilerplate scores ~0, unique
      // prose ~1). Same one-explode discipline as tfidf: the (doc,
      // gram) type frame is materialized once and feeds both the
      // document-frequency aggregate and the per-doc rollup; df is
      // vocabulary-sized and re-joins broadcast-style. Exact integer
      // counts; the fraction is one shaped division fixed-pointed e6.
      // gram TYPES per doc, deduplicated ROW-LOCALLY before the
      // explode — the corpus-wide (doc, gram) .distinct() exchange
      // this carried through r16 did per-doc work on the shuffle
      // network. graft_shingles is the native distinct-gram build
      // (pinned == array_sort(array_distinct(HOF shingles))); the HOF
      // transform/concat_ws formulation it replaces allocated a
      // column tree per gram (r17 census audit, same as
      // text_ngram_topk).
      graft.functions.expressions.WordShingles.register(s)
      val dg = t(s, d, "documents")
        .select(col("doc_id"), explode(expr("graft_shingles(text, 3)")).as("g"))
        .localCheckpoint() // feeds df AND the per-doc rollup
      val df = dg.groupBy(col("g")).agg(count(lit(1)).as("df"))
      val perDoc = dg.join(df, "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_types"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      t(s, d, "documents").select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_types"), lit(0L)).as("n_types"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          when(col("n_types").isNotNull,
            round(lit(1000000.0) * col("n_novel").cast("double")
              / col("n_types").cast("double"), 0).cast("long"))
            .as("novelty_fp_e6"))
        .orderBy("doc_id")
    }),
    "text_readability_fk" -> ((s, d) => {
      // T19: Flesch–Kincaid grade estimate — the readability control
      // knob for curriculum/quality binning. Words and sentences from
      // the shared engine-portable splits; syllables approximated by
      // vowel-group runs (the standard regex proxy). All three counts
      // are exact integers; the grade is ONE shaped double expression
      // fixed-pointed e3. Map-side projection, zero shuffle.
      // Sentences = segments between runs of the corpus-native
      // delimiter token 'a', the text_sentence_stats r20 rescope: the
      // synthetic corpus has ZERO '.', '!' or '?' at any SF, so the
      // original '[.!?] +' split never split and n_sents was the
      // constant 1 — the words/sentence term of the FK grade was a
      // dead passthrough of n_words. Zero-segment docs emit NULL
      // grade on both sides.
      val words = size(tokens(col("text"))).cast("long")
      val sents = size(filter(
        transform(split(concat(lit(" "), col("text"), lit(" ")),
          " a( a)* "), x => trim(x)),
        x => length(x) > 0)).cast("long")
      val syll = size(regexp_extract_all(col("text"),
        lit("[aeiouyAEIOUY]+"), lit(0))).cast("long")
      t(s, d, "documents")
        .select(col("doc_id"), words.as("n_words"), sents.as("n_sents"),
          syll.as("n_syll"))
        .select(col("doc_id"), col("n_words"), col("n_sents"),
          col("n_syll"),
          when(col("n_sents") > 0,
            round(lit(1000.0) *
              (lit(0.39) * col("n_words").cast("double")
                 / col("n_sents").cast("double") +
               lit(11.8) * col("n_syll").cast("double")
                 / col("n_words").cast("double") - lit(15.59)), 0)
              .cast("long")).as("fk_grade_fp_e3"))
        .orderBy("doc_id")
    }),
    "dedup_containment" -> ((s, d) => {
      // C10: asymmetric containment dedup — ordered pairs where ≥ 90%
      // of doc a's shingles appear in doc b (a is an EXCERPT of b).
      // Symmetric Jaccard misses exactly this case: a short quote
      // inside a long document has tiny Jaccard but full containment.
      // PPJoin-style prefix prunes only the CONTAINED side (|B| is
      // unconstrained, so b's full posting list is indexed); the
      // verify is the native sorted-set merge scan, and the threshold
      // test is integer cross-multiplication (i·10 ≥ 9·|A| — no
      // float at the decision boundary).
      graft.functions.expressions.ShingleHashes.register(s)
      graft.functions.expressions.SortedLongIntersectSize.register(s)
      val base = t(s, d, "documents")
        .select(col("doc_id").as("doc"),
          expr("graft_shingle_hashes(text, 3)").as("sh"))
        .withColumn("n", size(col("sh")))
        .where(col("n") >= 5) // containment of a trivial set is noise
        .localCheckpoint(false)
      val prefixLen = (col("n") - ceil(lit(0.9) * col("n")) + 1).cast("int")
      val aPref = base.select(col("doc").as("a"), col("n").as("na"),
        explode(slice(col("sh"), lit(1), prefixLen)).as("h"))
      val bAll = base.select(col("doc").as("b"), explode(col("sh")).as("h"))
      val cands = aPref.join(bAll, "h")
        .where(col("a") =!= col("b"))
        .select(col("a"), col("b")).distinct()
      cands
        .join(base.select(col("doc").as("a"), col("sh").as("sha"),
          col("n").as("na")), "a")
        .join(base.select(col("doc").as("b"), col("sh").as("shb")), "b")
        .withColumn("i",
          expr("graft_sorted_long_intersect_size(sha, shb)").cast("long"))
        .where(col("i") * 10 >= col("na") * 9)
        .select(col("a"), col("b"), col("i"), col("na").cast("long").as("na"),
          round(lit(1000000.0) * col("i").cast("double")
            / col("na").cast("double"), 0).cast("long")
            .as("containment_fp_e6"))
        .orderBy("a", "b")
    }),
    "dedup_incremental" -> ((s, d) => {
      // C7: incremental ingestion dedup — new documents checked
      // against the ALREADY-INGESTED corpus's fingerprint set, never
      // re-deduping the whole corpus (at 100 TB the prior corpus is
      // petabytes; its md5 fingerprint set is a thin index you keep).
      // Split is deterministic (doc_id mod 3 = the "new" batch); the
      // check is a left-semi-shaped left join on the exact-dedup
      // fingerprint (md5 of normalized text — the Dedup.exact key),
      // so only fingerprints cross the wire, never text. Output: the
      // new batch with its verdict + the blocking fingerprint.
      val docs = t(s, d, "documents")
      val fp = md5(lower(trim(col("text"))))
      val prior = docs.where(col("doc_id") % 3 =!= 0)
        .select(fp.as("fp")).distinct()
      docs.where(col("doc_id") % 3 === 0)
        .select(col("doc_id"), fp.as("fp"))
        // the prior-fingerprint index is thin PER ROW but ∝ corpus in
        // ROWS — broadcasting it (what the estimate-driven initial
        // plan picked; r14 audit) collects the whole index to the
        // driver at scale. The 100 TB shape is a shuffle join on fp.
        .join(prior.withColumn("dup", lit(true)).hint("merge"),
          Seq("fp"), "left")
        .select(col("doc_id"), col("fp"),
          coalesce(col("dup"), lit(false)).as("already_ingested"))
        .orderBy("doc_id")
    }),
    "text_gopher_quality" -> ((s, d) => {
      // T18: the Gopher QUALITY rules (Rae et al. 2021 Table A1) —
      // the companion gate to text_gopher_repetition's repetition
      // rules: word count in [50, 100k], mean word length in [3, 10],
      // ≥ 80% of words contain an alphabetic character, and ≥ 2
      // stopword hits (the/and markers, the replace-length trick
      // shared verbatim with the oracle). Line-shape rules (bullet /
      // ellipsis starts) are inapplicable to this single-line corpus
      // and documented out. All metrics are exact integers or one
      // shaped fixed-point division; the whole gate is a map-side
      // projection — zero shuffle before the output sort.
      val w = tokens(col("text"))
      val wordCnt = size(w).cast("long")
      val charSum = aggregate(w, lit(0L), (acc, x) => acc + length(x))
      val alphaCnt = size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long")
      val stopHits = (markerCount(col("text"), "the") +
        markerCount(col("text"), "and")).cast("long")
      t(s, d, "documents")
        .select(col("doc_id"), wordCnt.as("word_cnt"),
          round(lit(1000.0) * charSum.cast("double")
            / wordCnt.cast("double"), 0).cast("long")
            .as("mean_word_len_fp_e3"),
          round(lit(1000000.0) * alphaCnt.cast("double")
            / wordCnt.cast("double"), 0).cast("long")
            .as("alpha_frac_fp_e6"),
          stopHits.as("stop_hits"))
        .withColumn("keep",
          col("word_cnt").between(50L, 100000L) &&
          col("mean_word_len_fp_e3").between(3000L, 10000L) &&
          col("alpha_frac_fp_e6") >= 800000L &&
          col("stop_hits") >= 2L)
        .orderBy("doc_id")
    }),
    "text_pii_redact" -> ((s, d) => {
      // PII scrub — the masking rewrite pass of a training-data
      // pipeline: e-mail / IPv4 / SSN-shaped spans → typed placeholder
      // tokens, with per-doc match counts. The corpus is synthetic
      // word-soup with no real PII, so spans are INJECTED
      // deterministically from doc_id (identical integer arithmetic in
      // the oracle); the operator under test is the chained native
      // regexp_replace — codegen'd, map-side, zero shuffle: the shape
      // of a full-corpus rewrite at 100 TB. Patterns stay inside the
      // RE2 ∩ java.util.regex common subset so both engines agree.
      val id = col("doc_id").cast("string")
      def when0(m: Int, c: org.apache.spark.sql.Column) =
        when(col("doc_id") % m === 0, c).otherwise(lit(""))
      val aug = concat(col("text"),
        when0(3, concat(lit(" contact u"), id, lit("@mail"),
          (col("doc_id") % 7).cast("string"), lit(".example.com"))),
        when0(4, concat(lit(" from "),
          (col("doc_id") % 223 + 1).cast("string"), lit("."),
          (col("doc_id") % 251).cast("string"), lit("."),
          ((col("doc_id") * 7) % 256).cast("string"), lit("."),
          (col("doc_id") % 100).cast("string"))),
        when0(5, concat(lit(" ssn "),
          (col("doc_id") % 900 + 100).cast("string"), lit("-"),
          (col("doc_id") % 90 + 10).cast("string"), lit("-"),
          (col("doc_id") % 9000 + 1000).cast("string"))))
      t(s, d, "documents")
        .withColumn("aug", aug)
        .select(col("doc_id"),
          size(regexp_extract_all(col("aug"), lit(EmailRe), lit(0)))
            .as("n_emails"),
          size(regexp_extract_all(col("aug"), lit(Ipv4Re), lit(0)))
            .as("n_ips"),
          size(regexp_extract_all(col("aug"), lit(SsnRe), lit(0)))
            .as("n_ssns"),
          md5(redactPii(col("aug"))).as("redacted_md5"))
        .orderBy("doc_id")
    }),
    "text_tfidf_topk" -> ((s, d) => {
      // TF-IDF keyword extraction: top-3 terms per document by
      // tf × ln(N/df), ties broken by term. Plan: one explode →
      // (doc, term) counts; document frequency derived FROM the tf
      // frame (no second corpus scan); N is a 1-row broadcast; the df
      // side is vocabulary-sized (≪ corpus) so the join broadcasts at
      // runtime. Scores are rounded to 8 decimals and the window
      // orders by the ROUNDED score, so cross-engine ordering and
      // values agree to the quantum. `tf` feeds both the df derivation
      // and the final join, so it is materialized once — otherwise the
      // corpus explode+shuffle subtree evaluates twice.
      val docs = t(s, d, "documents")
      // doc_id is row-grain, so the native per-row token TYPE counts
      // ARE the (doc, term, tf) frame — explode them directly and the
      // corpus-sized groupBy(doc_id, term) exchange disappears
      // entirely (r16 extension; equivalence pinned in
      // NativeExpressionsSpec)
      graft.functions.expressions.TokenTypeCounts.register(s)
      val tf = docs
        .select(col("doc_id"),
          explode(expr("graft_token_counts(text)")).as("t"))
        .select(col("doc_id"), col("t.term").as("term"),
          col("t.c").as("tf"))
        .localCheckpoint()
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      tf.join(df, "term").crossJoin(n) // 1-row N → broadcast
        .withColumn("score",
          round(col("tf") * log(col("n").cast("double") / col("df")), 8))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("score"),
                col("rk"))
        .orderBy("doc_id", "rk")
    }),
    "text_charlm_surprisal" -> ((s, d) => {
      // Character-trigram LM quality signal (the KenLM-perplexity
      // filter shape of CCNet/Gopher, self-trained): P(c₃|c₁c₂) from
      // corpus trigram counts, per-doc surprisal Σ −ln P. The exploded
      // (doc, tri) frame feeds both train and score but is NOT
      // materialized: it is ~|corpus chars| rows, 10-20× its input's
      // bytes, so re-exploding twice (two cheap map-side scans) beats
      // writing it to disk — the same recompute-beats-disk exception
      // as dedup_repeated_spans. The trigram-TYPE-count frame is not
      // checkpointed either: measured at sf0.1, the eager
      // materialization job costs ~1.4 s while recomputing the
      // explode+groupBy for its two consumers costs ~0.1 s total —
      // checkpoint only pays when the materialization is cheaper than
      // the recompute, not merely when a frame has 2+ consumers.
      // Log-probs are FIXED-POINT
      // (round(−1e6·ln p) as long) so the per-doc sum is
      // order-independent integer arithmetic — hash-comparable,
      // unlike a double Σlog.
      val docs = t(s, d, "documents")
      // TRAIN: one corpus explode into the trigram-type counts. The
      // explode emits the native per-row TYPE counts (O(chars) —
      // substring(text, i, 3) in a transform re-scans from the string
      // head, making the occurrence array O(n²) per row; and one row
      // per type per doc is the map-side combine done BEFORE the
      // Generate), so sum(c) here equals the old occurrence count(*)
      // exactly. Lazy persist (NOT localCheckpoint): c3 is
      // vocabulary-sized and feeds both the model numerator and the
      // context totals — the cache manager swaps both references for
      // one InMemoryRelation inside the single train action.
      graft.functions.expressions.CharTrigramCounts.register(s)
      val dtris = docs.select(
        explode(expr("graft_char_trigram_counts(text)")).as("t"))
        .select(col("t.tri").as("tri"), col("t.c").as("c"))
      val c3 = dtris.groupBy("tri").agg(sum(col("c")).as("c3")).persist()
      val c2 = c3.groupBy(substring(col("tri"), 1, 2).as("p2"))
        .agg(sum(col("c3")).as("c2"))
      val lm = c3.withColumn("p2", substring(col("tri"), 1, 2))
        .join(c2, "p2")
        .select(col("tri"),
          round(-lit(1000000.0) *
            log(col("c3").cast("double") / col("c2")), 0)
            .cast("long").as("slog"))
      // The model is trigram-TYPE grain (bounded by the alphabet
      // cubed, never by the corpus) — the same bound that justified
      // broadcasting it into the r14-era scoring join. Collecting it
      // (gated: CharlmScore.MaxModelEntries fails loudly if the
      // vocabulary ever scales with data) and scoring with the native
      // one-pass expression replaces the SECOND corpus explode + the
      // broadcast join over ~|corpus chars| rows + the doc-grain
      // reduce + the spine join the catalog carried through r16
      // (measured 4.6 s of the sf0.1 bench, ~half of it score-side):
      // score is now a scan-speed projection, one hash probe per
      // trigram. The collect runs inside the query builder, so Bench
      // times train + score together — nothing escapes the stopwatch.
      // boundedCollect limits the DRIVER MATERIALIZATION itself (not
      // just the arrays post-hoc): a vocabulary that scales with the
      // corpus ships at most MaxModelEntries+1 rows before failing
      // loudly (r16 ADVICE — the old gate ran after the full collect).
      val model = graft.functions.expressions.CharlmScore.boundedCollect(lm)
      c3.unpersist(blocking = false)
      // register→analyze under the expression's lock: on a SHARED
      // session, another thread's register of the same function
      // between this register and the eager analysis below would
      // cross models (r16 ADVICE; Verify's pool runs builders on one
      // session). Only the ANALYSIS is serialized — the returned
      // frame executes outside the lock.
      graft.functions.expressions.CharlmScore.synchronized {
        graft.functions.expressions.CharlmScore.register(s,
          model.map(_.getString(0)), model.map(_.getLong(1)))
        docs.select(col("doc_id"), expr("graft_charlm_score(text)").as("r"))
          .select(col("doc_id"),
            coalesce(col("r.n_tri"), lit(0L)).as("n_tri"),
            coalesce(col("r.surprisal_fp"), lit(0L)).as("surprisal_fp"))
          .orderBy("doc_id")
      }
    }),
    "text_langid_ngram" -> ((s, d) => {
      // Learned n-gram-profile language ID (the textcat/CLD family,
      // next to text_langid's fixed stopword markers): train per-
      // language profiles = top-50 char trigrams by corpus count (ties
      // by trigram), score each doc by |distinct doc trigrams ∩
      // profile|, guess = argmax with language-order tiebreak. The
      // profile table is 200 rows by definition, so classification is
      // a scan-speed projection; the corpus never shuffles on a
      // content key except the one train aggregate.
      val docs = t(s, d, "documents")
      // Train: ONE corpus explode into the (lang, tri) count — the
      // only content-key shuffle left in this row. Through r16 the
      // SCORE side also shuffled the corpus (a (doc_id, tri) distinct
      // + profile join + per-doc reduce + spine join — measured 2.9 s
      // of the sf0.1 bench); "distinct doc trigrams ∩ profile" is
      // row-local set arithmetic, so score is now the native one-pass
      // graft_langid_score. The profile table is bounded by
      // DEFINITION — top-50 × 4 languages, ≤200 rows at ANY scale —
      // so collecting it (gated: LangidScore.MaxProfileEntries) and
      // shipping it as an expression constant is strictly safer than
      // the broadcast join it replaces. The collect runs inside the
      // query builder, so Bench times train + score together. (An
      // intermediate array_intersect formulation measured SLOWER than
      // the join it replaced — 5.8 vs 2.9 s at sf0.1 — because
      // substring(text, i, 3) re-scans from the string head, making
      // the per-row trigram ARRAY O(n²); the native scorer walks
      // three code-point cursors instead, and probes each ≤50-entry
      // profile against the doc's trigram set, never the reverse.)
      // the explode emits native per-row trigram TYPE counts (O(chars)
      // and pre-combined — see charlm's train note); sum(c) equals the
      // old occurrence count(*) exactly
      graft.functions.expressions.CharTrigramCounts.register(s)
      val dtris = docs.select(col("lang"),
          explode(expr("graft_char_trigram_counts(text)")).as("t"))
        .select(col("lang"), col("t.tri").as("tri"), col("t.c").as("tc"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("c").desc, col("tri"))
      val profiles = dtris.groupBy("lang", "tri")
        .agg(sum(col("tc")).as("c"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 50)
        .select(col("lang").as("plang"), col("tri"))
      // ONE language list drives the register argument AND the
      // s$i→column mapping AND the argmax tiebreak (r16 ADVICE: the
      // old code repeated the (index, language) pairing at three
      // sites — updating one but not the others would silently
      // mislabel scores, and the en/de equivalence test could not
      // catch a 4-language ordering slip).
      val langs = Seq("en", "de", "es", "fr")
      val prof = profiles.collect()
      // argmax with language-order tiebreak: language i wins iff its
      // score >= every LATER language's (earlier candidates already
      // failed their when), identical to the old hand-chained whens
      val guess = langs.init.zipWithIndex.foldRight(
          lit(langs.last): org.apache.spark.sql.Column) {
        case ((l, i), rest) =>
          when(langs.drop(i + 1).map(o => col(s"s_$l") >= col(s"s_$o"))
            .reduce(_ && _), lit(l)).otherwise(rest)
      }
      // register→analyze under the expression's lock — see charlm
      graft.functions.expressions.LangidScore.synchronized {
        graft.functions.expressions.LangidScore.register(s,
          langs.map(l => prof.filter(_.getString(0) == l)
            .map(_.getString(1))).toArray)
        docs.select(col("doc_id"), col("lang"),
            expr("graft_langid_score(text)").as("r"))
          .select(col("doc_id") +: col("lang") +:
            langs.zipWithIndex.map { case (l, i) =>
              coalesce(col(s"r.s$i"), lit(0L)).as(s"s_$l") }: _*)
          .withColumn("guess", guess)
          .orderBy("doc_id")
      }
    }),
    "dedup_repeated_spans" -> ((s, d) => {
      // Duplicate-text fraction (Lee et al. 2022 "Deduplicating
      // Training Data…", the suffix-array metric made distributable):
      // hash EVERY 40-char span with the native O(n) rolling-hash
      // expression, count per doc how many span hashes also occur in
      // ANOTHER document. Two shuffles on the span-hash key — the
      // honest replacement for a suffix array at 100 TB; output is one
      // row per doc. dup_frac is a single division, cross-engine
      // exact.
      graft.functions.expressions.RollingHashes.register(s)
      val (w, b, m) = (40, 31, 1099511627689L)
      val spans = t(s, d, "documents")
        .select(col("doc_id"),
          explode(call_function("graft_rolling_hashes", col("text"),
            lit(w), lit(b), lit(m))).as("h"))
      // "h occurs in ≥ 2 distinct docs" ⟺ min(doc_id) ≠ max(doc_id)
      // per h: min/max partial-combine MAP-SIDE into one (mn, mx) row
      // per distinct h, where count_distinct's distinct-expand
      // shuffled the full (h, doc_id) span set — the heavier half of
      // the r12 sf3 heap band (and its GC-cliff dispersion: the old
      // plan's same-code sf3 cells ranged 27–55 s across four r13
      // probe JVMs; this one held 31.8/32.9). The assembly join stays
      // INNER (hstats covers every h, but Catalyst cannot prove it) —
      // a cardinality-preserving left-join assembly was measurably
      // optimized AWAY under Bench's count() action.
      val hstats = spans.groupBy("h")
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      // BOTH join sides are data-sized (spans ∝ corpus bytes, hstats =
      // one row per distinct span hash): force the shuffle join. Left
      // to its estimates, Catalyst picked BroadcastHashJoin here at
      // sf10 (compile-time size estimate under the 64m threshold) and
      // the build-side collect shipped >1 GiB to the driver — the
      // query died on spark.driver.maxResultSize. SMJ keys on h, so
      // the census side reuses its groupBy exchange; PlanShapeSpec
      // pins no-broadcast.
      spans.join(hstats.hint("merge"), "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(when(col("mn") =!= col("mx"), 1L).otherwise(0L))
            .as("n_shared"))
        .select(col("doc_id"), col("n_spans"), col("n_shared"),
          (col("n_shared").cast("double") / col("n_spans")).as("dup_frac"))
        .orderBy("doc_id")
    }),
    "mixture_temperature" -> ((s, d) => {
      // Temperature-based mixture sampling (mT5 / multilingual-BERT
      // exponentiated smoothing): language i is kept with rate
      // ∝ p_i^(α−1) with α = 0.5, i.e. rarer languages are boosted by
      // 1/√p_i, normalized so the LARGEST language's rate is 1. Same
      // execution shape as mixture_rebalance — rates are computed from
      // one tiny aggregate, broadcast, and applied map-side as an
      // md5-space threshold; the corpus scans once and never shuffles.
      // √ is a single IEEE op on both engines, so thresholds agree
      // bitwise.
      val docs = t(s, d, "documents")
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      // keep rate_i = √(n_min/n_i), the α = 0.5 exponentiation
      // normalized to the minority language (rate ≤ 1 everywhere, so a
      // subsample can honor it): the minority keeps ~everything, a
      // language k× larger keeps √(1/k) — flatter than
      // mixture_rebalance's linear n_min/n_i, steeper than uniform.
      val rates = counts
        .crossJoin(counts.agg(min(col("n")).as("mn")))
        .withColumn("thr",
          sqrt(col("mn").cast("double") / col("n").cast("double")) *
            lit(1048576.0))
      val h20 = conv(substring(md5(col("doc_id").cast("string")), 1, 5),
        16, 10).cast("long")
      docs.join(broadcast(rates), Seq("lang"))
        .where(h20 < col("thr"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept_cnt"))
        .orderBy("lang")
    }),
    "mixture_rebalance" -> ((s, d) => {
      // data-mixture rebalancing: downsample every language to the
      // minority language's count. Keep rates are computed FROM the
      // corpus (one tiny aggregate + cross join), broadcast, and
      // applied as a deterministic md5-space filter — corpus scanned
      // once, map-side, no shuffle of kept rows; retargeting the
      // mixture changes the rate frame, not the job graph. Threshold
      // compare is one double division + one multiply in fixed order,
      // IEEE-identical across engines.
      val docs = t(s, d, "documents")
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val rates = counts
        .crossJoin(counts.agg(min(col("n")).as("mn")))
        .withColumn("thr",
          col("mn").cast("double") / col("n").cast("double") *
            lit(1048576.0))
      val h20 = conv(substring(md5(col("doc_id").cast("string")), 1, 5),
        16, 10).cast("long")
      docs.join(broadcast(rates), Seq("lang"))
        .where(h20 < col("thr"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("kept_cnt"),
             sum(col("n_chars")).as("kept_chars"))
        .orderBy("lang")
    })
  )

  /** Content-defined chunks of every document: (doc_id, chunk_no,
    * cstart, clen, chunk_md5) via the native `graft_cdc_boundaries`
    * rolling-hash expression. Shared by `text_cdc_chunks` (the chunk
    * inventory) and `dedup_cdc_chunks` (chunk-hash dedup join).
    */
  private def cdcChunks(s: SparkSession, d: String): DataFrame = {
    graft.functions.expressions.CdcBoundaries.register(s)
    val (w, dv, b, m) = (16, 32, 31, 1048573)
    t(s, d, "documents")
      .select(col("doc_id"), col("text"),
        call_function("graft_cdc_boundaries", col("text"),
          lit(w), lit(dv), lit(b), lit(m)).as("bnd"))
      .withColumn("rng", arrays_zip(
        concat(array(lit(1)), transform(col("bnd"), x => x + 1)).as("cs"),
        concat(col("bnd"), array(length(col("text")))).as("ce")))
      .select(col("doc_id"), col("text"),
        posexplode(col("rng")).as(Seq("chunk_no", "r")))
      .select(col("doc_id"), col("chunk_no").cast("int").as("chunk_no"),
        col("r.cs").as("cstart"),
        (col("r.ce") - col("r.cs") + 1).as("clen"),
        md5(expr("substring(text, r.cs, r.ce - r.cs + 1)")).as("chunk_md5"))
  }

  /** Candidate census for the chunk-hash self-join of
    * `dedup_cdc_chunks`: with f = docs sharing a chunk_md5, the join
    * emits Σ f·(f−1)/2 pair rows BEFORE the ≥2-shared filter — on a
    * templated corpus where a constant FRACTION of docs share
    * boilerplate chunks this is ∝ n², the same definition-quadratic
    * class as the PPJoin prefix bound (Dedup.prefixSaturationStats).
    * One groupBy over the chunk inventory, no join — the cheap
    * pre-flight that predicts the quadratic regime before it runs
    * (WorkCount `cdc` probe / Verify fence reason).
    * Returns (n_docs, n_chunk_rows, n_hashes, max_freq,
    * cand_pairs_bound, cand_per_doc_fp_e3).
    */
  def cdcPairCensus(s: SparkSession, d: String): org.apache.spark.sql.Row =
    cdcChunks(s, d).select("doc_id", "chunk_md5").distinct()
      .groupBy(col("chunk_md5")).agg(count(lit(1)).as("f"))
      .agg(count(lit(1)).as("n_hashes"),
        sum(col("f")).as("n_chunk_rows"),
        max(col("f")).as("max_freq"),
        (sum(col("f") * (col("f") - 1)) / 2).as("cand_pairs_bound"))
      .crossJoin(t(s, d, "documents").agg(count(lit(1)).as("n_docs")))
      .select(col("n_docs"), col("n_chunk_rows"), col("n_hashes"),
        col("max_freq"),
        col("cand_pairs_bound").cast("long").as("cand_pairs_bound"),
        (col("cand_pairs_bound").cast("long") * 1000 /
          greatest(col("n_docs"), lit(1L))).cast("long")
          .as("cand_per_doc_fp_e3"))
      .head()

  /** Direct windowed-sum mirror of the CDC rolling recurrence: h(i) =
    * Σ_{j=0..15} (code(s[i−j])+1)·31^j mod 1048573, boundary where
    * h % 32 = 0 for i in [16, n). Same integers, same md5s as
    * [[cdcChunks]]; ends with `ch(doc_id, chunk_no, cstart, clen,
    * chunk_md5)`.
    */
  private lazy val cdcChunkSql: String = {
    val (w, dv, b, m) = (16, 32, 31, 1048573)
    val pows = Iterator.iterate(1L)(_ * b % m).take(w).toSeq
    s"""d AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |g AS (SELECT doc_id, text, n,
       |        list_transform(range(1, n + 1),
       |          i -> unicode(text[CAST(i AS INT)]) + 1) AS gc
       |      FROM d),
       |bs AS (SELECT doc_id, text, n,
       |         list_filter(list_transform(range($w, n), i ->
       |           CASE WHEN list_sum(list_transform(range(0, $w), j ->
       |                  gc[CAST(i - j AS INT)]
       |                    * ([${pows.mkString(", ")}])[CAST(j + 1 AS INT)]
       |                    % $m)) % $m % $dv = 0
       |                THEN i END), x -> x IS NOT NULL) AS bnd
       |       FROM g),
       |ck AS (SELECT doc_id, text,
       |         list_prepend(1, list_transform(bnd, x -> x + 1)) AS cs,
       |         list_append(bnd, n) AS ce
       |       FROM bs),
       |ch AS (SELECT doc_id, CAST(t.i - 1 AS INT) AS chunk_no,
       |  CAST(cs[CAST(t.i AS INT)] AS INT) AS cstart,
       |  CAST(ce[CAST(t.i AS INT)] - cs[CAST(t.i AS INT)] + 1 AS INT) AS clen,
       |  md5(substr(text, CAST(cs[CAST(t.i AS INT)] AS BIGINT),
       |             CAST(ce[CAST(t.i AS INT)] - cs[CAST(t.i AS INT)] + 1 AS BIGINT)))
       |    AS chunk_md5
       |FROM ck, UNNEST(range(1, len(cs) + 1)) AS t(i))""".stripMargin
  }

  /** Hashed shingle sets: same 60-bit md5 hashing as the native
    * `graft_shingle_hashes` expression, so hash sets match the Spark
    * side bit-for-bit. `src` must expose (doc_id, text).
    */
  private def shinglesSqlFrom(src: String) =
    s"""toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
       |rawsh AS (SELECT doc_id AS doc, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
       |          FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS u(i)),
       |sh AS (SELECT DISTINCT doc,
       |              CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) AS h
       |       FROM rawsh)""".stripMargin

  private val shinglesSql = shinglesSqlFrom("documents")

  private def markerCountSql(word: String): String = {
    val m = s" $word "
    s"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', '$m', ' '))) / ${m.length - 1} AS INT)"
  }
  private def langScoreSql(lang: String): String =
    langMarkers.toMap.apply(lang).map(markerCountSql).mkString("(", " + ", ")")

  private val minhashSigSql: String = {
    val comps = (0 until 16)
      .map(j => s"min(md5('$j|' || CAST(h AS VARCHAR))) AS h$j").mkString(", ")
    s"sig AS (SELECT doc, $comps FROM sh GROUP BY doc)"
  }
  private val bandSql: String = {
    val bands = (0 until 4).map { b =>
      val cols = (0 until 4).map(r => s"h${b * 4 + r}").mkString(" || '|' || ")
      s"md5($cols) AS b$b"
    }.mkString(", ")
    s"banded AS (SELECT doc, $bands FROM sig)"
  }

  private val simhashFpSql =
    """tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
      |th AS (SELECT doc_id, CAST(concat('0x', substr(md5(tk), 1, 15)) AS BIGINT) AS h FROM tok),
      |bits AS (SELECT doc_id, b, sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS sgn
      |         FROM th, (SELECT unnest(range(0, 60)) AS b) GROUP BY 1, 2),
      |fp AS (SELECT doc_id AS doc,
      |              CAST(sum(CASE WHEN sgn > 0 THEN 1::BIGINT << b ELSE 0::BIGINT END) AS BIGINT) AS sim
      |       FROM bits GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_char_entropy" ->
      """WITH pos AS (
        |  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
        |  FROM documents),
        |cnt AS (
        |  SELECT doc_id, substring(text, CAST(i AS INT), 1) AS ch,
        |         count(*) AS c
        |  FROM pos GROUP BY 1, 2),
        |tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY 1),
        |term AS (
        |  SELECT cnt.doc_id,
        |    CAST(round(1000000.0 * (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
        |               * ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)))
        |      AS BIGINT) AS t
        |  FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(s.e, 0) AS BIGINT) AS entropy_fp_e6
        |FROM documents d
        |LEFT JOIN (SELECT doc_id, sum(t) AS e FROM term GROUP BY 1) s
        |  ON d.doc_id = s.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_pmi_bigrams" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w
        |              FROM documents),
        |big AS (
        |  SELECT unnest(list_transform(range(1, len(w)),
        |                               i -> w[i] || ' ' || w[i + 1])) AS bg
        |  FROM toks WHERE len(w) >= 2),
        |uni AS (SELECT unnest(w) AS tok FROM toks),
        |cb AS (SELECT bg, count(*) AS cxy FROM big GROUP BY 1),
        |cu AS (SELECT tok, count(*) AS cw FROM uni GROUP BY 1),
        |nb AS (SELECT CAST(sum(cxy) AS BIGINT) AS nb FROM cb),
        |nu AS (SELECT CAST(sum(cw) AS BIGINT) AS nu FROM cu)
        |SELECT string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2,
        |  cxy,
        |  CAST(round(1000000.0 * ln(
        |    (CAST(cxy AS DOUBLE) / CAST(nb.nb AS DOUBLE))
        |      / ((CAST(c1.cw AS DOUBLE) / CAST(nu.nu AS DOUBLE))
        |         * (CAST(c2.cw AS DOUBLE) / CAST(nu.nu AS DOUBLE)))))
        |    AS BIGINT) AS pmi_fp_e6
        |FROM cb
        |JOIN cu c1 ON c1.tok = string_split(bg, ' ')[1]
        |JOIN cu c2 ON c2.tok = string_split(bg, ' ')[2]
        |CROSS JOIN nb CROSS JOIN nu
        |WHERE cxy >= 5
        |ORDER BY pmi_fp_e6 DESC, w1, w2
        |LIMIT 50""".stripMargin,
    "text_dedup_tokens_ordered" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(len(ws) AS INT) AS n_tokens,
        |  CAST(len(list_filter(ws, (x, i) -> list_position(ws, x) = i))
        |       AS INT) AS n_unique,
        |  array_to_string(
        |    list_filter(ws, (x, i) -> list_position(ws, x) = i), ' ')
        |    AS dedup_text
        |FROM w ORDER BY doc_id""".stripMargin,
    "text_feature_hashing" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) % 64
        |    AS bucket,
        |  count(*) AS cnt
        |FROM toks GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "text_token_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS word_cnt,
        |  n_chars,
        |  CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality_score" ->
      """SELECT doc_id,
        |  CAST(len(w) AS INT) AS word_cnt,
        |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS uniq_ratio,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(w) AS avg_word_len,
        |  (len(w) >= 50 AND CAST(len(list_distinct(w)) AS DOUBLE) / len(w) >= 0.3) AS is_quality
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      s"""SELECT doc_id,
         |  ${langScoreSql("en")} AS score_en,
         |  ${langScoreSql("de")} AS score_de,
         |  ${langScoreSql("es")} AS score_es,
         |  ${langScoreSql("fr")} AS score_fr,
         |  CASE
         |    WHEN ${langScoreSql("en")} >= ${langScoreSql("de")}
         |     AND ${langScoreSql("en")} >= ${langScoreSql("es")}
         |     AND ${langScoreSql("en")} >= ${langScoreSql("fr")} THEN 'en'
         |    WHEN ${langScoreSql("de")} >= ${langScoreSql("es")}
         |     AND ${langScoreSql("de")} >= ${langScoreSql("fr")} THEN 'de'
         |    WHEN ${langScoreSql("es")} >= ${langScoreSql("fr")} THEN 'es'
         |    ELSE 'fr' END AS lang_guess
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp,
        |  CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS fp60
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_rolling_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 2147483647) AS rh
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_cdc_chunks" ->
      s"""WITH $cdcChunkSql
         |SELECT doc_id, chunk_no, cstart, clen, chunk_md5
         |FROM ch ORDER BY doc_id, chunk_no""".stripMargin,
    "dedup_cdc_chunks" ->
      s"""WITH $cdcChunkSql,
         |dc AS (SELECT DISTINCT doc_id, chunk_md5 FROM ch)
         |SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
         |FROM dc a JOIN dc b
         |  ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY 1, 2""".stripMargin,
    "dedup_cdc_chunks_capped" ->
      s"""WITH $cdcChunkSql,
         |dc AS (SELECT DISTINCT doc_id, chunk_md5 FROM ch),
         |rare AS (SELECT chunk_md5 FROM dc
         |         GROUP BY 1 HAVING count(*) <= 64),
         |kept AS (SELECT dc.doc_id, dc.chunk_md5
         |         FROM dc JOIN rare USING (chunk_md5))
         |SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_shared
         |FROM kept a JOIN kept b
         |  ON a.chunk_md5 = b.chunk_md5 AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 2
         |ORDER BY 1, 2""".stripMargin,
    "text_stopword_ratio" ->
      """SELECT doc_id,
        |  CAST(len(w) AS INT) AS word_cnt,
        |  CAST(len(list_filter(w, t -> t = 'the' OR t = 'a')) AS INT) AS stop_cnt,
        |  CAST(len(list_filter(w, t -> t = 'the' OR t = 'a')) AS DOUBLE) / len(w)
        |    AS stop_ratio
        |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "dedup_exact" ->
      """SELECT doc_id, md5(lower(trim(text))) AS fp,
        |  min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canonical_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""WITH $shinglesSql,
         |sz AS (SELECT doc, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc AS d1, b.doc AS d2, count(*) AS i
         |          FROM sh a JOIN sh b ON a.h = b.h AND a.doc < b.doc GROUP BY 1, 2)
         |SELECT d1, d2, CAST(i AS DOUBLE) / (x.n + y.n - i) AS jac
         |FROM inter JOIN sz x ON d1 = x.doc JOIN sz y ON d2 = y.doc
         |WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5
         |ORDER BY 1, 2""".stripMargin,
    "dedup_ngram_jaccard_freq" ->
      s"""WITH $shinglesSql,
         |sz AS (SELECT doc, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc AS d1, b.doc AS d2, count(*) AS i
         |          FROM sh a JOIN sh b ON a.h = b.h AND a.doc < b.doc GROUP BY 1, 2)
         |SELECT d1, d2, CAST(i AS DOUBLE) / (x.n + y.n - i) AS jac
         |FROM inter JOIN sz x ON d1 = x.doc JOIN sz y ON d2 = y.doc
         |WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5
         |ORDER BY 1, 2""".stripMargin,
    "dedup_cluster_cc" ->
      s"""WITH RECURSIVE $shinglesSql,
         |sz AS (SELECT doc, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc AS d1, b.doc AS d2, count(*) AS i
         |          FROM sh a JOIN sh b ON a.h = b.h AND a.doc < b.doc GROUP BY 1, 2),
         |pairs AS (
         |  SELECT d1, d2
         |  FROM inter JOIN sz x ON d1 = x.doc JOIN sz y ON d2 = y.doc
         |  WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5),
         |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |reach(node, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node)
         |SELECT node AS doc, min(r) AS cluster
         |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_prefix_saturation" ->
      s"""WITH $shinglesSql,
         |sz AS (SELECT doc, count(*) AS n FROM sh GROUP BY 1),
         |pref AS (
         |  SELECT doc, h FROM (
         |    SELECT sh.doc, h, n,
         |      row_number() OVER (PARTITION BY sh.doc ORDER BY h) AS rn
         |    FROM sh JOIN sz USING (doc))
         |  WHERE rn <= n - ceil(0.5 * n - 1e-9) + 1),
         |b AS (SELECT h, count(*) AS c FROM pref GROUP BY 1),
         |d AS (SELECT count(*) AS n_docs FROM sz)
         |SELECT n_docs,
         |  CAST(sum(c) AS BIGINT) AS n_prefix_tokens,
         |  count(*) AS n_buckets,
         |  CAST(max(c) AS BIGINT) AS max_bucket,
         |  CAST(sum(c * (c - 1)) // 2 AS BIGINT) AS cand_pairs_bound,
         |  CAST(round(1000.0 * CAST(sum(c) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE), 0) AS BIGINT) AS avg_df_fp_e3,
         |  CAST(round(1000.0 * CAST(sum(c * (c - 1)) // 2 AS DOUBLE)
         |    / CAST(n_docs AS DOUBLE), 0) AS BIGINT) AS cand_per_doc_fp_e3
         |FROM b, d GROUP BY n_docs""".stripMargin,
    // NOTE on AS MATERIALIZED: DuckDB 1.0 INLINES every CTE
    // reference — each of the ~10 references to the shingle set would
    // re-run the whole upstream pipeline (and the recursive `reach`
    // member would re-run it once per iteration): measured >60 GB of
    // temp spill and an oracle timeout at sf1. Materializing the
    // shared/heavy CTEs pins single evaluation; the shared fragments
    // ($shinglesSql/$minhashSigSql/$bandSql) stay untouched so the
    // other oracles' SQL (and their sweep-resume hashes) don't move.
    "dedup_cluster_cc_auto" ->
      s"""WITH RECURSIVE $shinglesSql,
         |$minhashSigSql,
         |$bandSql,
         |shm AS MATERIALIZED (SELECT doc, h FROM sh),
         |bandedm AS MATERIALIZED (SELECT doc, b0, b1, b2, b3 FROM banded),
         |sz AS MATERIALIZED (SELECT doc, count(*) AS n FROM shm GROUP BY 1),
         |pref AS (
         |  SELECT doc, h FROM (
         |    SELECT shm.doc, h, n,
         |      row_number() OVER (PARTITION BY shm.doc ORDER BY h) AS rn
         |    FROM shm JOIN sz USING (doc))
         |  WHERE rn <= n - ceil(0.5 * n - 1e-9) + 1),
         |b AS (SELECT h, count(*) AS c FROM pref GROUP BY 1),
         |met AS MATERIALIZED (SELECT
         |  (SELECT CAST(sum(c * (c - 1)) // 2 AS BIGINT) FROM b)
         |    > 64 * (SELECT count(*) FROM sz) AS saturated),
         |sh_ex AS (SELECT doc, h FROM shm
         |          WHERE NOT (SELECT saturated FROM met)),
         |banded_l AS MATERIALIZED (SELECT doc, b0, b1, b2, b3 FROM bandedm
         |            WHERE (SELECT saturated FROM met)),
         |cand_exact AS (SELECT a.doc AS d1, b.doc AS d2
         |               FROM sh_ex a JOIN sh_ex b ON a.h = b.h AND a.doc < b.doc
         |               GROUP BY 1, 2),
         |cand_lsh AS (SELECT DISTINCT d1, d2 FROM (
         |  SELECT a.doc AS d1, b.doc AS d2 FROM banded_l a
         |    JOIN banded_l b ON a.b0 = b.b0 AND a.doc < b.doc
         |  UNION SELECT a.doc, b.doc FROM banded_l a
         |    JOIN banded_l b ON a.b1 = b.b1 AND a.doc < b.doc
         |  UNION SELECT a.doc, b.doc FROM banded_l a
         |    JOIN banded_l b ON a.b2 = b.b2 AND a.doc < b.doc
         |  UNION SELECT a.doc, b.doc FROM banded_l a
         |    JOIN banded_l b ON a.b3 = b.b3 AND a.doc < b.doc)),
         |cand AS MATERIALIZED (
         |  SELECT d1, d2 FROM cand_exact
         |  UNION
         |  SELECT d1, d2 FROM cand_lsh),
         |inter AS (SELECT d1, d2, count(*) AS i
         |          FROM cand JOIN shm a ON d1 = a.doc
         |                    JOIN shm b ON d2 = b.doc AND a.h = b.h
         |          GROUP BY 1, 2),
         |pairs AS (
         |  SELECT d1, d2
         |  FROM inter JOIN sz x ON d1 = x.doc JOIN sz y ON d2 = y.doc
         |  WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5),
         |edges AS MATERIALIZED (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |reach(node, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node)
         |SELECT node AS doc, min(r) AS cluster
         |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_component_size_hist" ->
      s"""WITH RECURSIVE $shinglesSql,
         |sz AS (SELECT doc, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc AS d1, b.doc AS d2, count(*) AS i
         |          FROM sh a JOIN sh b ON a.h = b.h AND a.doc < b.doc GROUP BY 1, 2),
         |pairs AS (
         |  SELECT d1, d2
         |  FROM inter JOIN sz x ON d1 = x.doc JOIN sz y ON d2 = y.doc
         |  WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5),
         |edges AS (SELECT d1 AS a, d2 AS b FROM pairs
         |          UNION SELECT d2, d1 FROM pairs),
         |reach(node, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node),
         |comp AS (SELECT node, min(r) AS component FROM reach GROUP BY 1),
         |csz AS (SELECT component, count(*) AS sz FROM comp GROUP BY 1)
         |SELECT sz, count(*) AS n_components,
         |  CAST(sz * count(*) AS BIGINT) AS n_docs
         |FROM csz GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_bpe_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text,
        |    ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS INT) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "decontaminate" ->
      s"""WITH $shinglesSql,
         |bench AS (SELECT DISTINCT h FROM sh WHERE doc % 50 = 0),
         |corp AS (SELECT doc, h FROM sh WHERE doc % 50 <> 0)
         |SELECT corp.doc AS doc_id, count(*) AS n_shared
         |FROM corp JOIN bench USING (h)
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "quota_per_source" ->
      """SELECT source, doc_id,
        |  CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
        |       AS INT) AS rk
        |FROM documents QUALIFY rk <= 10 ORDER BY 1, 2""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $shinglesSql,
         |$minhashSigSql,
         |$bandSql,
         |cand AS (SELECT DISTINCT a.doc AS d1, b.doc AS d2
         |         FROM banded a JOIN banded b
         |           ON a.doc < b.doc AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)),
         |sz AS (SELECT doc, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT d1, d2, count(*) AS i
         |          FROM cand JOIN sh a ON d1 = a.doc JOIN sh b ON d2 = b.doc AND a.h = b.h
         |          GROUP BY 1, 2)
         |SELECT d1, d2, CAST(i AS DOUBLE) / (x.n + y.n - i) AS jac
         |FROM inter JOIN sz x ON d1 = x.doc JOIN sz y ON d2 = y.doc
         |WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.5
         |ORDER BY 1, 2""".stripMargin,
    "text_ngram_topk" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
        |       FROM toks, UNNEST(range(1, greatest(len(w) - 1, 1))) AS u(i))
        |SELECT s, count(*) AS doc_freq FROM sh GROUP BY s
        |ORDER BY doc_freq DESC, s LIMIT 50""".stripMargin,
    "text_length_histogram" ->
      """SELECT CAST(floor(n_chars / 100) AS BIGINT) AS bucket,
        |  count(*) AS cnt, min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_simhash" ->
      s"""WITH $simhashFpSql
         |SELECT a.doc AS d1, b.doc AS d2,
         |  CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
         |FROM fp a JOIN fp b ON a.doc < b.doc
         |WHERE bit_count(xor(a.sim, b.sim)) <= 3
         |ORDER BY 1, 2""".stripMargin,
    "corpus_curate" ->
      // mirrors CorpusPipeline.curate with Config() defaults: minWords
      // 30, minUniqRatio 0.2, langs {en}, jaccardThreshold 0.8.
      s"""WITH base AS (
         |  SELECT doc_id, text,
         |    len(string_split(text, ' ')) AS words,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |      / len(string_split(text, ' ')) AS uniq,
         |    CASE
         |      WHEN ${langScoreSql("en")} >= ${langScoreSql("de")}
         |       AND ${langScoreSql("en")} >= ${langScoreSql("es")}
         |       AND ${langScoreSql("en")} >= ${langScoreSql("fr")} THEN 'en'
         |      WHEN ${langScoreSql("de")} >= ${langScoreSql("es")}
         |       AND ${langScoreSql("de")} >= ${langScoreSql("fr")} THEN 'de'
         |      WHEN ${langScoreSql("es")} >= ${langScoreSql("fr")} THEN 'es'
         |      ELSE 'fr' END AS lang_guess
         |  FROM documents),
         |g1 AS (SELECT *,
         |    CASE WHEN words < 30 THEN 'too_short'
         |         WHEN uniq < 0.2 THEN 'low_diversity'
         |         WHEN lang_guess <> 'en' THEN 'language' END AS dr1
         |  FROM base),
         |alive AS (SELECT * FROM g1 WHERE dr1 IS NULL),
         |canon AS (SELECT doc_id,
         |    min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canonical_id
         |  FROM alive),
         |g2 AS (SELECT g1.*, c.canonical_id,
         |    COALESCE(g1.dr1, CASE WHEN c.canonical_id < g1.doc_id
         |                          THEN 'exact_duplicate' END) AS dr2
         |  FROM g1 LEFT JOIN canon c USING (doc_id)),
         |surv AS (SELECT doc_id, text FROM g2 WHERE dr2 IS NULL),
         |${shinglesSqlFrom("surv")},
         |$minhashSigSql,
         |$bandSql,
         |cand AS (SELECT DISTINCT a.doc AS d1, b.doc AS d2
         |         FROM banded a JOIN banded b
         |           ON a.doc < b.doc AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)),
         |sz AS (SELECT doc, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT d1, d2, count(*) AS i
         |          FROM cand JOIN sh a ON d1 = a.doc JOIN sh b ON d2 = b.doc AND a.h = b.h
         |          GROUP BY 1, 2),
         |neardup AS (SELECT DISTINCT d2 AS doc_id
         |            FROM inter JOIN sz x ON d1 = x.doc JOIN sz y ON d2 = y.doc
         |            WHERE CAST(i AS DOUBLE) / (x.n + y.n - i) >= 0.8)
         |SELECT g2.doc_id, g2.lang_guess, g2.canonical_id,
         |  COALESCE(g2.dr2, CASE WHEN n.doc_id IS NOT NULL
         |                        THEN 'near_duplicate' END) AS drop_reason
         |FROM g2 LEFT JOIN neardup n USING (doc_id)
         |ORDER BY g2.doc_id""".stripMargin,
    "text_normalize" ->
      """WITH n AS (SELECT doc_id,
        |    string_split(lower(text), ' ') AS toks,
        |    list_filter(string_split(lower(text), ' '),
        |      t -> NOT (t = 'the' OR t = 'a' OR t = 'and')) AS kept
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(kept) AS INT) AS n_kept,
        |  md5(array_to_string(kept, ' ')) AS norm_md5
        |FROM n ORDER BY doc_id""".stripMargin,
    "text_zipf_slope" ->
      """WITH tf AS (
        |  SELECT t.tok, count(*) AS c
        |  FROM documents, UNNEST(string_split(text, ' ')) AS t(tok)
        |  GROUP BY 1),
        |r AS (
        |  SELECT CAST(round(10000.0 * ln(CAST(rk AS DOUBLE))) AS BIGINT)
        |           AS lr,
        |         CAST(round(10000.0 * ln(CAST(c AS DOUBLE))) AS BIGINT)
        |           AS lf
        |  FROM (SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rk
        |        FROM tf)
        |  WHERE rk <= 20),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(lr) AS BIGINT) AS sx, CAST(sum(lf) AS BIGINT) AS sy,
        |    CAST(sum(lr * lr) AS BIGINT) AS sxx,
        |    CAST(sum(lr * lf) AS BIGINT) AS sxy
        |  FROM r)
        |SELECT n,
        |  CAST(round(1000000.0 *
        |    CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT)
        |    AS zipf_slope_fp_e6
        |FROM a""".stripMargin,
    "tokenizer_fertility_by_lang" ->
      """WITH m AS (
        |  SELECT lang,
        |    CAST(len(regexp_extract_all(text,
        |      ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+')) AS BIGINT) AS bpe,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ws
        |  FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(bpe) AS BIGINT) AS bpe_tokens,
        |  CAST(sum(ws) AS BIGINT) AS ws_tokens,
        |  CAST(round(1000000.0 * CAST(sum(bpe) AS DOUBLE)
        |    / CAST(sum(ws) AS DOUBLE)) AS BIGINT) AS fertility_fp_e6
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_novelty_ngrams" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |dg AS (
        |  SELECT DISTINCT doc_id,
        |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        |  FROM w, UNNEST(range(1, len(ws) - 1)) AS u(i)),
        |df AS (SELECT g, count(*) AS df FROM dg GROUP BY 1),
        |p AS (
        |  SELECT doc_id, count(*) AS n_types,
        |    CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_novel
        |  FROM dg JOIN df ON dg.g = df.g GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(n_types, 0) AS BIGINT) AS n_types,
        |  CAST(coalesce(n_novel, 0) AS BIGINT) AS n_novel,
        |  CASE WHEN n_types IS NOT NULL
        |    THEN CAST(round(1000000.0 * CAST(n_novel AS DOUBLE)
        |      / CAST(n_types AS DOUBLE)) AS BIGINT) END AS novelty_fp_e6
        |FROM documents d LEFT JOIN p ON d.doc_id = p.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_readability_fk" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(len(list_filter(
        |      list_transform(
        |        regexp_split_to_array(' ' || text || ' ', ' a( a)* '),
        |        x -> trim(x)),
        |      x -> length(x) > 0)) AS BIGINT) AS n_sents,
        |    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
        |      AS BIGINT) AS n_syll
        |  FROM documents)
        |SELECT doc_id, n_words, n_sents, n_syll,
        |  CASE WHEN n_sents > 0 THEN
        |    CAST(round(1000.0 *
        |      (0.39 * CAST(n_words AS DOUBLE) / CAST(n_sents AS DOUBLE) +
        |       11.8 * CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE)
        |       - 15.59)) AS BIGINT)
        |  END AS fk_grade_fp_e3
        |FROM m ORDER BY doc_id""".stripMargin,
    "dedup_containment" ->
      s"""WITH $shinglesSql,
         |sz AS (SELECT doc, count(*) AS n FROM sh GROUP BY 1
         |       HAVING count(*) >= 5),
         |inter AS (
         |  SELECT a.doc AS a, b.doc AS b, count(*) AS i
         |  FROM sh a JOIN sh b ON a.h = b.h AND a.doc <> b.doc
         |  GROUP BY 1, 2),
         |p AS (
         |  SELECT inter.a, inter.b, i, x.n AS na
         |  FROM inter JOIN sz x ON inter.a = x.doc
         |             JOIN sz y ON inter.b = y.doc
         |  WHERE i * 10 >= x.n * 9)
         |SELECT a, b, CAST(i AS BIGINT) AS i, CAST(na AS BIGINT) AS na,
         |  CAST(round(1000000.0 * CAST(i AS DOUBLE) / CAST(na AS DOUBLE))
         |    AS BIGINT) AS containment_fp_e6
         |FROM p ORDER BY a, b""".stripMargin,
    "dedup_incremental" ->
      """WITH prior AS (
        |  SELECT DISTINCT md5(lower(trim(text))) AS fp
        |  FROM documents WHERE doc_id % 3 <> 0),
        |newer AS (
        |  SELECT doc_id, md5(lower(trim(text))) AS fp
        |  FROM documents WHERE doc_id % 3 = 0)
        |SELECT n.doc_id, n.fp,
        |  p.fp IS NOT NULL AS already_ingested
        |FROM newer n LEFT JOIN prior p ON n.fp = p.fp
        |ORDER BY n.doc_id""".stripMargin,
    "text_gopher_quality" ->
      s"""WITH w AS (
         |  SELECT doc_id, text, string_split(text, ' ') AS ws
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(ws) AS BIGINT) AS word_cnt,
         |    CAST(round(1000.0 *
         |      CAST(list_aggregate(list_transform(ws, x -> length(x)),
         |                          'sum') AS DOUBLE)
         |      / CAST(len(ws) AS DOUBLE)) AS BIGINT)
         |      AS mean_word_len_fp_e3,
         |    CAST(round(1000000.0 *
         |      CAST(len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]')))
         |           AS DOUBLE)
         |      / CAST(len(ws) AS DOUBLE)) AS BIGINT) AS alpha_frac_fp_e6,
         |    CAST(${markerCountSql("the")} + ${markerCountSql("and")}
         |         AS BIGINT) AS stop_hits
         |  FROM w)
         |SELECT doc_id, word_cnt, mean_word_len_fp_e3, alpha_frac_fp_e6,
         |  stop_hits,
         |  (word_cnt BETWEEN 50 AND 100000
         |   AND mean_word_len_fp_e3 BETWEEN 3000 AND 10000
         |   AND alpha_frac_fp_e6 >= 800000
         |   AND stop_hits >= 2) AS keep
         |FROM m ORDER BY doc_id""".stripMargin,
    "text_gopher_repetition" ->
      """WITH w AS (SELECT doc_id, n_chars, string_split(text, ' ') AS ws
        |           FROM documents),
        |g AS (
        |  SELECT doc_id, n_chars, 2 AS n, ws[i] || ' ' || ws[i+1] AS g
        |  FROM w, UNNEST(range(1, len(ws))) AS u(i)
        |  UNION ALL
        |  SELECT doc_id, n_chars, 5,
        |    ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]
        |          || ' ' || ws[i+4]
        |  FROM w, UNNEST(range(1, len(ws) - 3)) AS u(i)),
        |c AS (SELECT doc_id, n_chars, n, g, count(*) AS cnt
        |      FROM g GROUP BY 1, 2, 3, 4),
        |a AS (SELECT doc_id,
        |        max(CASE WHEN n = 2 THEN cnt * length(g) ELSE 0 END) AS t2,
        |        sum(CASE WHEN n = 5 AND cnt > 1 THEN cnt * length(g)
        |                 ELSE 0 END) AS d5
        |      FROM c GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(t2, 0) AS BIGINT) AS top2_chars,
        |  CAST(coalesce(d5, 0) AS BIGINT) AS dup5_chars,
        |  CAST(coalesce(t2, 0) AS DOUBLE) / d.n_chars AS top2_frac,
        |  CAST(coalesce(d5, 0) AS DOUBLE) / d.n_chars AS dup5_frac,
        |  (CAST(coalesce(t2, 0) AS DOUBLE) / d.n_chars <= 0.20 AND
        |   CAST(coalesce(d5, 0) AS DOUBLE) / d.n_chars <= 0.15) AS keep
        |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "text_pii_redact" ->
      """WITH aug AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0
        |         THEN ' contact u' || doc_id || '@mail' || (doc_id % 7)
        |              || '.example.com' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0
        |         THEN ' from ' || (doc_id % 223 + 1) || '.' || (doc_id % 251)
        |              || '.' || (doc_id * 7 % 256) || '.' || (doc_id % 100)
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0
        |         THEN ' ssn ' || (doc_id % 900 + 100) || '-'
        |              || (doc_id % 90 + 10) || '-' || (doc_id % 9000 + 1000)
        |         ELSE '' END AS a
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(a,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(a,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(a,
        |    '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ssns,
        |  md5(regexp_replace(regexp_replace(regexp_replace(a,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g')) AS redacted_md5
        |FROM aug ORDER BY doc_id""".stripMargin,
    "text_tfidf_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT doc_id, term, tf,
        |        round(tf * ln(CAST(n AS DOUBLE) / df), 8) AS score
        |      FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, score,
        |  CAST(row_number() OVER (PARTITION BY doc_id
        |         ORDER BY score DESC, term) AS INT) AS rk
        |FROM s QUALIFY rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    "text_charlm_surprisal" ->
      """WITH tri AS (
        |  SELECT doc_id, substr(text, CAST(i AS BIGINT), 3) AS tri
        |  FROM documents, UNNEST(range(1, length(text) - 1)) AS u(i)),
        |c3 AS (SELECT tri, count(*) AS c3 FROM tri GROUP BY 1),
        |c2 AS (SELECT substr(tri, 1, 2) AS p2, sum(c3) AS c2
        |       FROM c3 GROUP BY 1),
        |lm AS (SELECT tri,
        |         CAST(round(-1000000.0 * ln(CAST(c3 AS DOUBLE) / c2), 0)
        |              AS BIGINT) AS slog
        |       FROM c3 JOIN c2 ON substr(tri, 1, 2) = p2),
        |p AS (SELECT t.doc_id, count(*) AS n_tri, sum(slog) AS surprisal_fp
        |      FROM tri t JOIN lm USING (tri) GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(n_tri, 0) AS n_tri,
        |  CAST(COALESCE(surprisal_fp, 0) AS BIGINT) AS surprisal_fp
        |FROM documents d LEFT JOIN p USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "text_langid_ngram" ->
      """WITH tri AS (
        |  SELECT doc_id, lang, substr(text, CAST(i AS BIGINT), 3) AS tri
        |  FROM documents, UNNEST(range(1, length(text) - 1)) AS u(i)),
        |cnt AS (SELECT lang, tri, count(*) AS c FROM tri GROUP BY 1, 2),
        |prof AS (SELECT lang AS plang, tri FROM (
        |           SELECT *, row_number() OVER (PARTITION BY lang
        |                       ORDER BY c DESC, tri) AS rk FROM cnt)
        |         WHERE rk <= 50),
        |dt AS (SELECT DISTINCT doc_id, tri FROM tri),
        |sc AS (SELECT doc_id,
        |         sum(CASE WHEN plang = 'en' THEN 1 ELSE 0 END) AS s_en,
        |         sum(CASE WHEN plang = 'de' THEN 1 ELSE 0 END) AS s_de,
        |         sum(CASE WHEN plang = 'es' THEN 1 ELSE 0 END) AS s_es,
        |         sum(CASE WHEN plang = 'fr' THEN 1 ELSE 0 END) AS s_fr
        |       FROM dt JOIN prof USING (tri) GROUP BY 1)
        |SELECT d.doc_id, d.lang,
        |  CAST(COALESCE(s_en, 0) AS BIGINT) AS s_en,
        |  CAST(COALESCE(s_de, 0) AS BIGINT) AS s_de,
        |  CAST(COALESCE(s_es, 0) AS BIGINT) AS s_es,
        |  CAST(COALESCE(s_fr, 0) AS BIGINT) AS s_fr,
        |  CASE
        |    WHEN COALESCE(s_en, 0) >= COALESCE(s_de, 0)
        |     AND COALESCE(s_en, 0) >= COALESCE(s_es, 0)
        |     AND COALESCE(s_en, 0) >= COALESCE(s_fr, 0) THEN 'en'
        |    WHEN COALESCE(s_de, 0) >= COALESCE(s_es, 0)
        |     AND COALESCE(s_de, 0) >= COALESCE(s_fr, 0) THEN 'de'
        |    WHEN COALESCE(s_es, 0) >= COALESCE(s_fr, 0) THEN 'es'
        |    ELSE 'fr' END AS guess
        |FROM documents d LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "dedup_repeated_spans" -> {
      // Direct windowed-sum mirror of graft_rolling_hashes: h(i) =
      // Σ_{j=0..39} (code(s[i−j])+1)·31^j mod (2^40 − 87) for i in
      // [40, n]. Same integers as the O(n) rolling form.
      val (w, b, m) = (40, 31, 1099511627689L)
      val pows = Iterator.iterate(1L)(_ * b % m).take(w).toSeq
      s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
         |g AS (SELECT doc_id, n,
         |        list_transform(range(1, n + 1),
         |          i -> unicode(text[CAST(i AS INT)]) + 1) AS gc
         |      FROM d),
         |p AS (SELECT doc_id,
         |        unnest(list_transform(range($w, n + 1), i ->
         |          list_sum(list_transform(range(0, $w), j ->
         |            gc[CAST(i - j AS INT)]
         |              * ([${pows.mkString(", ")}])[CAST(j + 1 AS INT)]
         |              % $m)) % $m)) AS h
         |      FROM g),
         |nd AS (SELECT h, count(DISTINCT doc_id) AS nd FROM p GROUP BY 1)
         |SELECT doc_id, count(*) AS n_spans,
         |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_shared,
         |  CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*) AS dup_frac
         |FROM p JOIN nd USING (h)
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "mixture_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |m AS (SELECT min(n) AS mn FROM c),
        |r AS (SELECT lang,
        |        sqrt(CAST(mn AS DOUBLE) / CAST(n AS DOUBLE)) * 1048576.0 AS thr
        |      FROM c, m)
        |SELECT d.lang, count(*) AS kept_cnt
        |FROM documents d JOIN r USING (lang)
        |WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 5))
        |           AS BIGINT) < thr
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "mixture_rebalance" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |m AS (SELECT min(n) AS mn FROM c),
        |r AS (SELECT lang,
        |        CAST(mn AS DOUBLE) / CAST(n AS DOUBLE) * 1048576.0 AS thr
        |      FROM c, m)
        |SELECT d.lang, count(*) AS kept_cnt,
        |  CAST(sum(d.n_chars) AS BIGINT) AS kept_chars
        |FROM documents d JOIN r USING (lang)
        |WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 5))
        |           AS BIGINT) < thr
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
