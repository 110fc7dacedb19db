package graft

/** Gates can be green and vacuous at once: a 0-row output hash-matches
  * a 0-row oracle (graph_common_neighbors_capped through r16), and a
  * SATURATED aggregate verifies constants (events_funnel through r17:
  * every user completed every stage at both gate SFs, so the 4-count
  * row was insensitive to its own stage definitions and a stage-type
  * mutation passed the oracle gate — tools/adjudications/
  * r17_mutations.json). These asserts pin the DISCRIMINATING state of
  * the known-degenerate-prone rows at sf0.01, so corpus regeneration
  * or a definition edit that re-saturates one fails `sbt test`
  * instead of quietly re-hollowing the gate.
  */
class GateSensitivitySpec extends SparkSpec {

  test("events_funnel erodes at the gate SF (saturation = vacuous gate)") {
    val r = SparkEntry.queries("events_funnel")(spark, sf("sf0.01")).head()
    val (users, s1, s2, s3) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(users > 0 && s1 > 0 && s2 > 0 && s3 > 0,
      s"funnel stages empty: $users/$s1/$s2/$s3")
    // the 48 h windows must BIND: each windowed stage strictly below
    // its predecessor (r17 measured 150/150/105/68 at sf0.01)
    assert(s2 < s1,
      s"stage 2 saturated ($s2 of $s1 signups): the 48 h click window " +
        "no longer binds — the gate is back to verifying constants")
    assert(s3 < s2,
      s"stage 3 saturated ($s3 of $s2): the purchase window no longer binds")
  }

  test("dedup_minhash_lsh: the planted mid-band pair keeps the verify " +
       "threshold live (r17 probe 20: every organic pair has " +
       "Jaccard >= 0.90, so thresholds in (0.5, 0.9) never bound)") {
    // GenSf plants two docs sharing a 24-word prefix over plant-only
    // vocabulary: exact Jaccard 22/34 = 0.647. This asserts (a) the
    // LSH banding actually emits the pair (band collision at jac 0.65
    // is ~54% a priori — deterministic for the committed text, but a
    // GenSf vocabulary edit can silently lose it) and (b) its jac sits
    // strictly inside (0.5, 0.8), so a 0.5->0.8 threshold mutation now
    // KILLS the sf1 gate instead of passing it.
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(
      sfRepo("testdata-sf1") + "/documents.parquet")
    // Derive the planted pair's ids from the corpus by the plant-only
    // vocabulary (GenSf: plantA/plantB are the only docs starting
    // "planta00") rather than a literal id — a regenerated corpus at a
    // different mult would make a hardcoded id match nothing and this
    // test would then mis-report "pair not emitted by the LSH banding"
    // instead of pointing at the id mismatch (r18 ADVICE).
    val plantIds = docs
      .where(col("text").startsWith("planta00"))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(plantIds.length == 2,
      s"expected exactly 2 planted docs with the planta00 prefix, got " +
        s"${plantIds.mkString("[", ",", "]")} — re-check GenSf's plant block")
    val planted = operators.Dedup
      .minhashLshPairs(docs, "doc_id", "text")
      .where(col("d1") === plantIds(0) && col("d2") === plantIds(1))
      .collect()
    assert(planted.length == 1,
      s"planted pair not emitted by the LSH banding (got " +
        s"${planted.length} rows) — re-check GenSf's plant block")
    val jac = planted.head.getAs[Double]("jac")
    assert(jac > 0.5 && jac < 0.8,
      s"planted pair jac=$jac left the (0.5, 0.8) band the threshold " +
        "mutation gate relies on")
  }

  test("conversion_by_channel erodes at the gate SF (unwindowed " +
       "'ever purchased' saturated at 100% on every channel, r18 audit)") {
    val rows = SparkEntry.queries("conversion_by_channel")(
      spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (channel, users, conv) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      assert(conv > 0,
        s"channel $channel: zero conversions — the window collapsed")
      // the purchase channel converts 100% BY DEFINITION (its first
      // touch IS a purchase, trivially inside its own window); every
      // other channel must show real erosion
      if (channel != "purchase")
        assert(conv < users,
          s"channel $channel: $conv of $users converted — the 48 h " +
            "conversion window no longer binds (100% = the gate is " +
            "back to verifying a constant)")
    }
  }

  test("anomaly_zscore_exact flags real outliers at the gate SF (2-sigma " +
       "was structurally zero on bounded uniform data, r18 audit)") {
    val rows = SparkEntry.queries("anomaly_zscore_exact")(
      spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, out) = (r.getLong(1), r.getLong(2))
      assert(out > 0 && out < n,
        s"flag ${r.getString(0)}: $out outliers of $n — the 1.5-sigma " +
          "census is degenerate again (all or none)")
    }
  }

  test("coverage_docs_embeddings: both anti-join arms live at sf1 " +
       "(planted orphan embedding + docs beyond the vec range)") {
    val r = SparkEntry.queries("coverage_docs_embeddings")(
      spark, sfRepo("testdata-sf1")).head()
    assert(r.getLong(1) > 0,
      "n_docs_without_embedding = 0: the docs-side anti-join verifies " +
        "nothing (doc ids are covered by vec ids again)")
    assert(r.getLong(2) > 0,
      "n_embeddings_without_doc = 0: the planted orphan embedding is " +
        "gone from GenSf — that arm is back to verifying a constant")
  }

  test("profile_null_report: the null arm is live at sf1 (planted " +
       "null-payload event)") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("profile_null_report")(
      spark, sfRepo("testdata-sf1"))
      .where(col("column_name").isin("value", "props")).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1L,
        s"${r.getString(0)}: n_null = ${r.getLong(1)} — the planted " +
          "null-payload event is gone; the null-count arm verifies 0")
    }
  }

  test("interpolate_linear_days: the interpolation arm fires at the " +
       "gate SF (the corpus-wide series had a purchase every day at " +
       "every SF, r18 sweep)") {
    import org.apache.spark.sql.functions.col
    val df = SparkEntry.queries("interpolate_linear_days")(
      spark, sf("sf0.01"))
    val known = df.where(col("known")).count()
    val interp = df.where(!col("known")).count()
    assert(known > 0 && interp > 0,
      s"known=$known interpolated=$interp — one arm of the gap-fill " +
        "is dead again (user-0's per-user density is scale-invariant; " +
        "if this fails the events generator changed)")
  }

  test("liveness plants: langid foreign markers, sentence split, " +
       "non-alpha words, deterministic dup5 (r18 sweep arms)") {
    import org.apache.spark.sql.functions.col
    val sfDir = sfRepo("testdata-sf1")
    val langid = SparkEntry.queries("text_langid")(spark, sfDir)
      .where(col("score_de") > 0 && col("score_es") > 0 &&
             col("score_fr") > 0)
    assert(langid.count() >= 1,
      "no doc scores >0 on de AND es AND fr markers — plantC is gone " +
        "and those scoring arms are back to verifying constant 0")
    val sents = SparkEntry.queries("text_sentence_stats")(spark, sfDir)
      .where(col("n_sent") > 1)
    assert(sents.count() >= 1,
      "no multi-sentence doc — the sentence-split arm is dead again")
    val alpha = SparkEntry.queries("text_gopher_quality")(spark, sfDir)
      .where(col("alpha_frac_fp_e6") < 1000000L)
    assert(alpha.count() >= 1,
      "no doc with a non-alphabetic word — the >=80%-alpha rule is " +
        "saturated at 100% again")
    val dup5 = SparkEntry.queries("text_gopher_repetition")(spark, sfDir)
      .where(col("dup5_chars") > 0)
    assert(dup5.count() >= 1,
      "no doc with a duplicated 5-gram — plantD is gone and the dup5 " +
        "rule never fires")
  }

  test("sketch_count_min: collisions actually occur at the gate SF " +
       "(5 event types in 256 cells never collided - r18 batch-4 probe)") {
    import org.apache.spark.sql.functions.col
    val over = SparkEntry.queries("sketch_count_min")(spark, sf("sf0.01"))
      .where(col("cms_estimate") > col("exact_cnt")).count()
    assert(over >= 1,
      "no key overestimates - the CMS key space stopped colliding and " +
        "the sketch gate is back to verifying exact counts trivially")
  }

  test("graph_common_neighbors_capped emits real rows at the gate SF " +
       "(the r16 vacuous-cap class)") {
    val n = SparkEntry.queries("graph_common_neighbors_capped")(
      spark, sf("sf0.01")).count()
    assert(n >= 10,
      s"capped common-neighbors emitted $n rows at sf0.01 — the degree " +
        "cap is selecting (almost) no middles again; the row verifies " +
        "nothing (re-measure the degree distribution, r16 audit)")
  }

  test("heavy_hitters_words: the n/30 threshold SPLITS the vocabulary " +
       "at BOTH gate SFs and the sf1 vocabulary exceeds the EFFECTIVE " +
       "MG trim threshold 2*slack*k = 60, so eviction really fires " +
       "(r19 ADVICE: the old pin checked vocab > k=30, but the sketch " +
       "is built with capacity slack*k and trims only past 2*capacity " +
       "— with the default slack=4 that was 240 and vocab 31/88 never " +
       "evicted; the query now passes slack=1)") {
    import org.apache.spark.sql.functions.{col, explode, split}
    // EFFECTIVE capacity of the sketch as the catalog row builds it:
    // slack=1, k=30 -> capacity 30, trim threshold 60. If the call
    // site's slack/k change, change these in lockstep (a mismatch
    // here means the pin no longer measures the shipped sketch).
    val capacity = 1 * 30
    def vocabAt(dir: String): Long =
      spark.read.parquet(dir + "/documents.parquet")
        .select(explode(split(col("text"), " ")).as("w"))
        .select("w").distinct().count()
    // trim-path liveness: the sketch trims only when its buffer
    // exceeds 2*capacity entries, so the gate corpus must carry more
    // types than that or the subtract-and-drop machinery never runs
    val vocab1 = vocabAt(sfRepo("testdata-sf1"))
    assert(vocab1 > 2L * capacity,
      s"sf1 vocab $vocab1 <= ${2 * capacity} (= 2*slack*k): the MG " +
        "sketch holds every type and never evicts at EITHER gate SF " +
        "— the candidate-verify pass is decorative again")
    // threshold liveness at both gates: both arms populated (some
    // words above n/30, some below) — a saturated side makes k
    // mutations one-sided (r19 ADVICE item 4: sf1 n/freq spreads
    // 29.8-30.3, within ~1% of the cut, so a corpus regeneration
    // could silently flip sf1 membership without this pin)
    for ((dir, vocab) <- Seq(sf("sf0.01") -> vocabAt(sf("sf0.01")),
                             sfRepo("testdata-sf1") -> vocab1)) {
      val out = SparkEntry.queries("heavy_hitters_words")(spark, dir)
        .count()
      assert(out > 0 && out < vocab,
        s"threshold n/30 stopped splitting the corpus at $dir ($out " +
          s"of $vocab types pass): k is untestable again — re-measure " +
          "the frequency curve (n/freq spreads 28.2-32.3 at sf0.01, " +
          "29.8-30.3 at sf1)")
    }
  }

  test("recode_map: the remap arm actually fires at the gate SF (r19 " +
       "campaign 5c: the original CHINA/FRANCE/GERMANY keys matched " +
       "nothing in the synthetic nation table, so the row verified " +
       "only the passthrough identity and a mapping mutation survived)") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("recode_map")(spark, sf("sf0.01"))
    val mapped = out.where(col("n_code").isin("N0", "N7", "N19")).count()
    assert(mapped === 3L,
      s"expected exactly 3 remapped nations, got $mapped — the mapping " +
        "keys no longer exist in the nation table and the remap arm is " +
        "dead again")
    val passthrough = out.where(col("n_code").startsWith("NATION_")).count()
    assert(passthrough > 0L, "no passthrough rows — the unmatched arm died")
  }

  test("agg_mode: the smallest-value tiebreak is spec-owned via a " +
       "designed tie (r19 campaign 5c: the mode is UNIQUE per flag at " +
       "both gate SFs, so a tiebreak mutation is gate-invisible on the " +
       "organic data — this drives the row's own code over a real tie)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = graft.Scratch.tempDir("agg_mode_tie").toString
    // flag A: quantity 5 x3, 9 x3 (tied max), 7 x1 -> smallest (5) wins
    Seq((5L, "A"), (5L, "A"), (5L, "A"), (9L, "A"), (9L, "A"), (9L, "A"),
        (7L, "A"))
      .toDF("l_quantity", "l_returnflag")
      .write.mode("overwrite").parquet(dir + "/lineitem.parquet")
    val r = SparkEntry.queries("agg_mode")(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("mode_quantity") === 5L,
      s"tie broken to ${r.head.getAs[Long]("mode_quantity")}, expected " +
        "the SMALLEST tied value 5 — the documented deterministic " +
        "tiebreak regressed")
    assert(r.head.getAs[Long]("mode_count") === 3L)
  }

  test("corpus_vocab_stats: the hapax arm is live at the sf1 gate " +
       "(r20 campaign 6c: sf0.01's 31-type vocabulary has minimum " +
       "token frequency >= 4, so n_hapax verified the constant 0 " +
       "there and a hapax-definition mutation was sf0.01-neutral; " +
       "sf1's near-dup tail carries 16 frequency-1 types that killed " +
       "it — this pins them)") {
    import org.apache.spark.sql.functions.col
    val hapax = SparkEntry.queries("corpus_vocab_stats")(
      spark, sfRepo("testdata-sf1")).head().getAs[Long]("n_hapax")
    assert(hapax >= 1,
      "no frequency-1 token at sf1: the hapax arm verifies the " +
        "constant 0 at BOTH gates and its definition is untestable")
  }

  test("quantile_normalize_sources: the ceiling-division index is " +
       "live at the sf1 gate (r20 campaign 6c: sf0.01 has exactly 25 " +
       "docs per source and 25 | 500*rn, so ceil == floor " +
       "structurally and the (a+b-1)/b trick was sf0.01-invisible; " +
       "sf1's uneven source counts killed a floor mutation)") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val docs = Tables.t(spark, sfRepo("testdata-sf1"), "documents")
    val n = docs.count()
    val nonDividing = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("ns"))
      .where(lit(n) % col("ns") =!= 0).count()
    assert(nonDividing >= 1,
      s"every sf1 source count divides N=$n: ceil-vs-floor indexing " +
        "is structurally identical at both gates and the exact-rank " +
        "arithmetic is untestable")
  }

  test("graph_common_neighbors: the common >= 2 prefilter is a SAFE " +
       "perf prune with visible slack (r20 campaign 6c: a >= 3 " +
       "mutation was oracle-neutral because the top-50-by-jaccard " +
       "selection never reaches that low — min emitted common is 18 " +
       "at sf0.01; the OUTCOME is owned by the top-k, the threshold " +
       "only prunes the wedge aggregate before the degree joins)") {
    import org.apache.spark.sql.functions.{col, min}
    val out = SparkEntry.queries("graph_common_neighbors")(
      spark, sf("sf0.01"))
    val minCommon = out.agg(min(col("common"))).head().getLong(0)
    assert(minCommon > 2,
      s"top-50 min common fell to $minCommon (<= the prune threshold " +
        "2): the prefilter is no longer outcome-neutral — either the " +
        "corpus flattened or the threshold must drop")
  }

  test("exact-dedup fingerprint normalization (lower+trim) is SPEC-" +
       "owned: the corpus has no case- or whitespace-variant " +
       "duplicates at ANY SF (r20 campaign 6c data-check), so the " +
       "normalization arms of md5(lower(trim(text))) are invisible to " +
       "every oracle gate (dedup_exact, dedup_cluster_size_hist, " +
       "corpus_curate, dedup_incremental) — this literal-input kill " +
       "is their owner") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Key Agg Row"), (2L, "key agg row"), (3L, "  key agg row "),
      (4L, "different text")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.exact(docs, "doc_id", "text")
      .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    assert(out(1L) === 1L && out(2L) === 1L && out(3L) === 1L,
      s"case/whitespace variants did not collapse to one canonical id " +
        s"($out) — the lower+trim normalization is broken")
    assert(out(4L) === 4L, "unrelated text joined the cluster")
  }

  test("text_sentence_stats: splitter, passthrough, and empty-filter " +
       "arms are all live at the gate SF (r20 campaign 6c: the corpus " +
       "has ZERO sentence punctuation at any SF, so the original " +
       "'[.!?] +' splitter never split and n_sent verified the " +
       "constant 1; the delimiter is now the corpus-native token 'a')") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("text_sentence_stats")(spark, sf("sf0.01"))
    val multi = out.where(col("n_sent") > 1).count()
    val single = out.where(col("n_sent") === 1).count()
    assert(multi >= 1 && single >= 1,
      s"n_sent split: $multi multi-segment / $single single-segment " +
        "docs at sf0.01 — a one-sided split makes delimiter mutations " +
        "invisible (the pre-r20 state: every doc was single-segment)")
    // empty-filter liveness: docs with a leading/trailing delimiter
    // produce an empty trimmed segment the filter must drop
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val edge = docs.where(col("text").startsWith("a ") ||
      col("text").endsWith(" a")).count()
    assert(edge >= 1,
      "no doc starts/ends with the delimiter token at sf0.01 — the " +
        "empty-segment filter arm is unreachable and filter mutations " +
        "are gate-invisible")
  }

  test("bitwise_agg: the AND/OR arms are live at the gate SF (r20 " +
       "campaign 6b: at order-priority grain bit_and saturated to 0 " +
       "and bit_or to 16383 in every group at every SF, so both arms " +
       "verified constants and an operand mutation survived; customer " +
       "grain keeps all three arms data-sensitive)") {
    import org.apache.spark.sql.functions.{col, max, min}
    val out = SparkEntry.queries("bitwise_agg")(spark, sf("sf0.01"))
    val nonzeroAnd = out.where(col("key_and") =!= 0).count()
    assert(nonzeroAnd >= 1,
      "bit_and is 0 in every group again — the AND arm verifies a " +
        "constant and operand mutations are gate-invisible")
    val orSpread = out.agg(min(col("key_or")), max(col("key_or"))).head()
    assert(orSpread.getLong(0) != orSpread.getLong(1),
      "bit_or is the same saturated value in every group — the OR arm " +
        "verifies a constant again")
  }

  test("join_full_outer: BOTH unmatched arms are live at the gate SF " +
       "(r20: before the key-range rescope every nation had both " +
       "customers and suppliers at every SF, so full_outer was " +
       "indistinguishable from inner and a join-type mutation " +
       "survived — the r19 dead-arm class)") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("join_full_outer")(spark, sf("sf0.01"))
    val aOnly = out.where(col("supplier_cnt").isNull).count()
    val bOnly = out.where(col("customer_cnt").isNull).count()
    assert(aOnly >= 1 && bOnly >= 1,
      s"full-outer arms: $aOnly customer-only / $bOnly supplier-only " +
        "keys at sf0.01 — an empty arm makes the join type untestable " +
        "(full_outer degenerates to left/right/inner); re-check the " +
        "key-range filters (a: nk < 20, b: nk >= 5)")
  }

  test("join_left_enrich: the unmatched-left arm is live at the sf1 " +
       "gate (r19 campaign 5h: a left->inner mutation was " +
       "sf0.01-NEUTRAL - every customer there has orders - and only " +
       "sf1's three orderless customers killed it; this pins them)") {
    import org.apache.spark.sql.functions.col
    val c = Tables.t(spark, sfRepo("testdata-sf1"), "customer")
      .select(col("c_custkey"))
    val o = Tables.t(spark, sfRepo("testdata-sf1"), "orders")
      .select(col("o_custkey")).distinct()
    val orderless = c.join(o, col("c_custkey") === col("o_custkey"),
      "left_anti").count()
    assert(orderless >= 1,
      "no customer without orders at sf1: join_left_enrich's " +
        "null-fill arm (and every left-join unmatched path over this " +
        "pair) verifies nothing - regenerate or plant one")
  }

  test("gap_fill_days / gap_fill_months: the zero-fill arm fires at " +
       "the gate SF (r19 campaign 5e: the corpus-wide day series has " +
       "a purchase EVERY day and every month carries F-orders, so the " +
       "fill value was dead at both tiers until the rows were " +
       "rescoped to user 0 / customer 1)") {
    import org.apache.spark.sql.functions.col
    val silentDays = SparkEntry.queries("gap_fill_days")(
      spark, sf("sf0.01")).where(col("cnt") === 0L).count()
    assert(silentDays >= 1,
      "no zero-filled day: user 0's purchase series became gap-free " +
        "and the fill arm is dead again")
    val silentMonths = SparkEntry.queries("gap_fill_months")(
      spark, sf("sf0.01")).where(col("cnt") === 0L).count()
    assert(silentMonths >= 1,
      "no zero-filled month: customer 1's F-order series became " +
        "gap-free and the fill arm is dead again")
  }

  test("corpus_curate: the exact-duplicate arm is live at the sf1 gate " +
       "(r19 campaign 5d: the canonical-direction mutation was " +
       "sf0.01-NEUTRAL - zero exact-duplicate texts in the driver " +
       "corpus - and only sf1's GenSf dup rows killed it)") {
    import org.apache.spark.sql.functions.{col, count}
    val docs = spark.read.parquet(
      sfRepo("testdata-sf1") + "/documents.parquet")
    val dupRows = docs.groupBy(col("text")).agg(count(col("text")).as("c"))
      .where(col("c") > 1)
      .agg(org.apache.spark.sql.functions.sum(col("c") - 1)).head().getLong(0)
    assert(dupRows >= 1,
      "no exact-duplicate text at sf1: corpus_curate's exact_duplicate " +
        "arm (and dedup_exact's whole gate) verify nothing - GenSf's " +
        "dups union is gone")
  }

  test("stats_survival_nelson_aalen: the censoring arm is live at the " +
       "sf1 gate (r19 campaign 5b: a censored-as-death mutation was " +
       "sf0.01-NEUTRAL - zero censored users there - and only sf1's " +
       "single censored user killed it; this pins that user)") {
    import org.apache.spark.sql.functions.{col, countDistinct, sum}
    // Derived from the query's OWN output (r19 ADVICE: the previous
    // pin re-implemented the signup/death window logic inline, so a
    // censoring-definition change would silently diverge from what
    // the query computes): every user entering the risk table has a
    // signup event, and each death is counted exactly once in some
    // row's `d` — so censored = (#signup users) - sum(d). Only the
    // trivially-stable "has a signup event" count is computed here;
    // the death/censoring semantics live solely in the query.
    val signupUsers = Tables.events(spark, sfRepo("testdata-sf1"))
      .where(col("event_type") === "signup")
      .agg(countDistinct(col("user_id"))).head().getLong(0)
    val deaths = SparkEntry.queries("stats_survival_nelson_aalen")(
      spark, sfRepo("testdata-sf1"))
      .agg(sum(col("d"))).head().getLong(0)
    val censored = signupUsers - deaths
    assert(censored >= 1,
      "no right-censored user at sf1: the Nelson-Aalen censoring arm " +
        "verifies nothing and censored-vs-death mutations pass both " +
        "gates (r19 probe) - regenerate or plant a signup-no-purchase " +
        "user")
  }

  test("text_zipf_slope: the head cap actually binds at the gate SF " +
       "(r19 gate-tier sweep: rk <= 1000 never bound on a 31-type " +
       "vocabulary at any SF)") {
    import org.apache.spark.sql.functions.{col, explode, split}
    val docs = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val vocab = docs.select(explode(split(col("text"), " ")).as("w"))
      .select("w").distinct().count()
    assert(vocab > 20,
      s"vocab $vocab <= 20: the top-20 head cap no longer drops any " +
        "type, so cap mutations are gate-invisible again")
    // the capped OLS must still see exactly 20 points
    val n = SparkEntry.queries("text_zipf_slope")(spark, sf("sf0.01"))
      .head().getLong(0)
    assert(n === 20L, s"OLS ran over $n points, expected the bound 20")
  }
}
