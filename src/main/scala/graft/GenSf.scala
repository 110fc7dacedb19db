package graft

import org.apache.spark.sql.{Column, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1 testdata generator for the SCALING probe only.
  *
  * The driver ships sf0.001/0.01/0.1; BENCH_SFSCALE's exponents need a
  * third decade to extrapolate toward the 100 TB claim, so this main
  * upsamples the sf0.1 shapes 10× into an sf1 directory (~6.1M
  * lineitem). It mirrors the DISTRIBUTIONS that drive plan cost —
  * Poisson-ish lines-per-order (the co-purchase edge build is
  * per-order quadratic), the 30-word document vocabulary + ~5%
  * near-duplicate tail (LSH bucket sizes), unit-norm 64-dim
  * embeddings, uniform dimension keys — not the driver's exact RNG, so
  * it is for timing curves only, never for correctness oracles
  * (Verify/check.py stay on the driver's own parquet).
  *
  * Everything derives from xxhash64(id, seed) — no RNG state, so the
  * output is byte-stable across runs and partitionings.
  */
object GenSf {

  /** Uniform double in [0, 1) from a keyed hash — shift to a positive
    * 53-bit mantissa so the division is exact and never 1.0.
    */
  private def u01(key: Column, seed: Int): Column =
    (shiftrightunsigned(xxhash64(key, lit(seed)), 11).cast("double")
      / lit((1L << 53).toDouble))

  private def uniInt(key: Column, seed: Int, n: Int): Column =
    pmod(xxhash64(key, lit(seed)), lit(n.toLong)).cast("int")

  private def uniLong(key: Column, seed: Int, n: Long): Column =
    pmod(xxhash64(key, lit(seed)), lit(n))

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    // multiplier over sf0.1 (10 -> sf1, 30 -> sf3, ...); arg 3 is an
    // optional comma list restricting which tables are written (the
    // beyond-sf1 probes only need the two tables their queries read)
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val onlyTables: Option[Set[String]] = args.lift(2).map(_.split(",").toSet)
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, outDir, mult, onlyTables)
    spark.stop()
  }

  /** The generation body, callable on a LIVE session (the test suite
    * lazily builds a missing testdata-sf1 through this — see
    * SparkSpec.sfRepo; main wraps it with its own session + stop).
    * Deterministic: every value derives from xxhash64(id, seed).
    */
  def generate(spark: SparkSession, outDir: String, mult: Int,
               onlyTables: Option[Set[String]] = None): Unit = {
    val nCust = 15000L * mult
    val nSupp = 1000L * mult
    val nPart = 20000L * mult
    val nOrders = 150000L * mult
    val nEvents = 100000L * mult
    val nDocs = 5000L * mult
    val nVecs = 2000L * mult
    val nUsers = 1500L * mult
    import spark.implicits._

    def write(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      if (onlyTables.forall(_.contains(name))) {
        df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
        println(s"[gensf] wrote $name")
      } else println(s"[gensf] skip $name (not in table filter)")

    // region / nation: dimension tables are scale-invariant
    write(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
        (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"), "region")
    write(spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey")), "nation")

    val segments = array(Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
      "HOUSEHOLD", "MACHINERY").map(lit): _*)
    write(spark.range(nCust).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), lpad(col("id"), 9, "0")).as("c_name"),
      uniInt(col("id"), 11, 25).as("c_nationkey"),
      round(u01(col("id"), 12) * 11000 - 1000, 2).as("c_acctbal"),
      element_at(segments, uniInt(col("id"), 13, 5) + 1)
        .as("c_mktsegment")), "customer")

    write(spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      concat(lit("Supplier#"), lpad(col("id"), 9, "0")).as("s_name"),
      uniInt(col("id"), 21, 25).as("s_nationkey"),
      round(u01(col("id"), 22) * 11000 - 1000, 2).as("s_acctbal")),
      "supplier")

    val adjectives = array(Seq("large", "hot", "blue", "small", "green",
      "red", "cold", "dark", "light", "heavy").map(lit): _*)
    val nouns = array(Seq("ring", "bolt", "cap", "gear", "pin", "rod",
      "plate", "wheel", "spring", "valve").map(lit): _*)
    val ptypes = array(Seq("LARGE", "ECONOMY", "SMALL", "STANDARD",
      "PROMO").map(lit): _*)
    write(spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat(element_at(adjectives, uniInt(col("id"), 31, 10) + 1),
        lit(" "),
        element_at(nouns, uniInt(col("id"), 32, 10) + 1)).as("p_name"),
      concat(lit("Brand#"), uniInt(col("id"), 33, 20) + 1).as("p_brand"),
      element_at(ptypes, uniInt(col("id"), 34, 5) + 1).as("p_type"),
      (uniInt(col("id"), 35, 50) + 1).as("p_size"),
      round(lit(900.0) + u01(col("id"), 36) * 100, 2)
        .as("p_retailprice")), "part")

    val statuses = array(Seq("F", "O", "P").map(lit): _*)
    val priorities = array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW").map(lit): _*)
    // 1995-01-01T00:00:00Z in epoch seconds (session TZ is UTC)
    val epoch95 = 788918400L
    val orders = spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      uniLong(col("id"), 41, nCust).as("o_custkey"),
      element_at(statuses, uniInt(col("id"), 42, 3) + 1)
        .as("o_orderstatus"),
      round(lit(1000.0) + u01(col("id"), 43) * 499000, 2)
        .as("o_totalprice"),
      timestamp_seconds(lit(epoch95) +
        uniInt(col("id"), 44, 2404).cast("long") * 86400L)
        .as("o_orderdate"),
      element_at(priorities, uniInt(col("id"), 45, 5) + 1)
        .as("o_orderpriority"))
    write(orders, "orders")

    // lines per order ~ 1 + Poisson(3.075) (matches the sf0.1
    // histogram: mean 4.08, max 17) via inverse-CDF on one uniform
    val lambda = 3.075
    val cdf = {
      var p = math.exp(-lambda); var c = p
      val cum = scala.collection.mutable.ArrayBuffer(c)
      for (k <- 1 to 16) { p = p * lambda / k; c += p; cum += c }
      cum.toSeq
    }
    val cdfArr = array(cdf.map(lit): _*)
    val nLinesCol = {
      val u = u01(col("o_orderkey"), 51)
      // first index with cdf >= u (aggregate over the 17-element CDF)
      lit(1) + aggregate(cdfArr, lit(0),
        (acc, cEl) => acc + when(cEl < u, 1).otherwise(0))
    }
    val li = orders
      .select(col("o_orderkey"), col("o_orderdate"),
        nLinesCol.as("n_lines"))
      .select(col("o_orderkey"), col("o_orderdate"),
        explode(sequence(lit(1), col("n_lines"))).as("i"))
    val liKey = col("o_orderkey") * 131 + col("i")
    write(li.select(
      col("o_orderkey").as("l_orderkey"),
      uniLong(liKey, 61, nPart).as("l_partkey"),
      uniLong(liKey, 62, nSupp).as("l_suppkey"),
      (pmod(col("i") - 1, lit(7)) + 1).cast("int").as("l_linenumber"),
      (uniInt(liKey, 63, 50) + 1).cast("double").as("l_quantity"),
      round(lit(900.0) + u01(liKey, 64) * 104100, 2)
        .as("l_extendedprice"),
      round(uniInt(liKey, 65, 11).cast("double") / 100, 2)
        .as("l_discount"),
      round(uniInt(liKey, 66, 9).cast("double") / 100, 2).as("l_tax"),
      element_at(array(lit("R"), lit("A"), lit("N")),
        uniInt(liKey, 67, 3) + 1).as("l_returnflag"),
      element_at(array(lit("O"), lit("F")), uniInt(liKey, 68, 2) + 1)
        .as("l_linestatus"),
      timestamp_seconds(unix_timestamp(col("o_orderdate")) +
        (uniInt(liKey, 69, 95) + 1).cast("long") * 86400L)
        .as("l_shipdate")), "lineitem")

    val etypes = array(Seq("click", "error", "purchase", "signup",
      "view").map(lit): _*)
    val epoch24 = 1704067200L // 2024-01-01T00:00:00Z
    // planted NULL-payload event (one per corpus, any mult): the
    // organic stream is null-free in every column, so the null arms
    // of the profiling/JSON rows (profile_null_report's n_null,
    // from_json on a missing payload) verified the constant 0 at
    // every SF and were mutation-insensitive (r18 saturation audit).
    // ts/user_id/event_type stay NON-null — watermarks and keyed
    // state need them; value/props are the honestly-nullable pair.
    val plantedEvent = spark.range(nEvents, nEvents + 1).select(
      col("id").as("event_id"),
      timestamp_seconds(lit(epoch24) + 15L * 86400L).as("ts"),
      lit(0L).as("user_id"),
      lit("view").as("event_type"),
      lit(null).cast("double").as("value"),
      lit(null).cast("string").as("props"))
    write(spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_seconds(lit(epoch24) +
        (u01(col("id"), 71) * 30 * 86400).cast("long")).as("ts"),
      uniLong(col("id"), 72, nUsers).as("user_id"),
      element_at(etypes, uniInt(col("id"), 73, 5) + 1).as("event_type"),
      round(-lit(50.0) * log(lit(1.0) - u01(col("id"), 74)), 2)
        .as("value"),
      concat(lit("{\"k\": "), uniInt(col("id"), 75, 100), lit("}"))
        .as("props"))
      .unionByName(plantedEvent), "events")

    // documents: ~95% originals over the 30-word vocabulary, ~5%
    // near-duplicates (an original's text + " dup") — the tail that
    // gives the dedup/LSH queries real candidate pairs to verify
    val vocab = array(Seq("spark", "window", "merge", "table", "column",
      "vector", "stream", "value", "data", "small", "join", "filter",
      "big", "group", "hash", "customer", "sort", "order", "slow",
      "line", "part", "fast", "the", "row", "agg", "key", "query", "a",
      "scan", "batch").map(lit): _*)
    val langCut = col("lr") // 0..99
    val nBase = (nDocs * 95) / 100
    val base = spark.range(nBase).select(
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(1), uniInt(col("id"), 81, 89) + 8),
        i => element_at(vocab,
          uniInt(col("id") * 131 + i, 82, 30) + 1)), " ").as("text"),
      uniInt(col("id"), 83, 100).as("lr"),
      concat(lit("src"), uniInt(col("id"), 84, 20)).as("source"))
    val withLang = base.select(col("doc_id"), col("text"),
      when(langCut < 41, "en").when(langCut < 56, "es")
        .when(langCut < 71, "fr").when(langCut < 86, "zh")
        .otherwise("de").as("lang"),
      col("source"))
    val dups = spark.range(nBase, nDocs)
      .select(col("id").as("doc_id"),
        uniLong(col("id"), 85, nBase).as("src_id"))
      .join(withLang.select(col("doc_id").as("src_id"),
        col("text").as("src_text"), col("lang"), col("source")),
        "src_id")
      .select(col("doc_id"),
        concat(col("src_text"), lit(" dup")).as("text"),
        col("lang"), col("source"))
    // planted MID-BAND near-dup pair (one per corpus, any mult): the
    // organic near-dup tail is template clones with Jaccard >= 0.90,
    // so LSH verify thresholds anywhere in (0.5, 0.9) never bound on
    // this corpus and an r17 mutation probe (0.5 -> 0.8) PASSED the
    // oracle gate. These two docs share a 24-word prefix over
    // plant-only vocabulary: 22 shared trigram shingles of 30 resp.
    // 26 -> exact Jaccard 22/34 = 0.647, inside (0.5, 0.8), so the
    // 0.5 threshold and the banding both bind (band collision checked
    // empirically and pinned by GateSensitivitySpec — minhash
    // emission at jac 0.647 is deterministic for fixed text but not
    // guaranteed a priori).
    val plantA = (0 until 32).map(i => f"planta$i%02d").mkString(" ")
    val plantB = ((0 until 24).map(i => f"planta$i%02d") ++
      (0 until 4).map(i => f"plantb$i%02d")).mkString(" ")
    // two more liveness plants (r18 catalog-wide degeneracy sweep):
    // plantC carries foreign language markers (the de/es/fr marker
    // scores were constant 0 on the English-only vocabulary at every
    // SF), sentence punctuation (every organic doc is one sentence,
    // so the sentence-split arms of readability/sentence-stats never
    // fired), and digit-only words (gopher-quality's >=80%-alphabetic
    // rule was saturated at 100%). plantD repeats a 5-gram so the
    // gopher dup5 rule fires DETERMINISTICALLY (sf1 had only 3
    // chance repeats, which a corpus regeneration could lose).
    val plantC = "der und die nicht el la los una le les est une " +
      "123 456. der und die nicht el la los una le les est une 789."
    val plantD = ("plantc00 plantc01 plantc02 plantc03 plantc04 " +
      "plantc00 plantc01 plantc02 plantc03 plantc04 plantc05")
    val planted = Seq(
      (nDocs, plantA, "en", "src0"),
      (nDocs + 1, plantB, "en", "src0"),
      (nDocs + 2, plantC, "de", "src1"),
      (nDocs + 3, plantD, "en", "src1"))
      .toDF("doc_id", "text", "lang", "source")
    write(withLang.unionByName(dups).unionByName(planted)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        length(col("text")).cast("long").as("n_chars"))
      .orderBy("doc_id"), "documents")

    // embeddings: unit-norm 64-dim float vectors via Box-Muller on two
    // keyed hashes, label uniform over 10
    val dims = sequence(lit(0), lit(63))
    val gauss = transform(dims, dIdx => {
      val k = col("id") * 131 + dIdx
      sqrt(lit(-2.0) * log(lit(1.0) - u01(k, 91))) *
        cos(lit(2.0 * math.Pi) * u01(k, 92))
    })
    // one ORPHAN embedding (vec_id = 2·nDocs, outside the doc-id
    // range at every mult): embeddings' ids are otherwise a strict
    // subset of doc ids, so coverage_docs_embeddings'
    // n_embeddings_without_doc arm verified the constant 0 at every
    // SF and an anti-join-direction mutation would pass (r18
    // saturation audit). A normal unit-norm vector otherwise — ANN
    // rows treat it as one more point.
    write(spark.range(nVecs)
      .select(col("id").as("vec_id"), gauss.as("g"),
        uniInt(col("id"), 93, 10).as("label"))
      .unionByName(spark.range(2 * nDocs, 2 * nDocs + 1)
        .select(col("id").as("vec_id"), gauss.as("g"),
          uniInt(col("id"), 93, 10).as("label")))
      .select(col("vec_id"),
        transform(col("g"), x => (x / sqrt(aggregate(col("g"), lit(0.0),
          (acc, y) => acc + y * y))).cast("float")).as("embedding"),
        col("label")), "embeddings")
  }
}
