package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFns
import graft.functions.expressions._

/** Every native codegen expression must agree exactly with its
  * composable (built-in-function) formulation — the property that
  * keeps the DuckDB oracles valid after each optimization swap.
  */
class NativeExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    graft.Tables.t(spark, sf("sf0.001"), "documents").limit(100).cache()

  test("graft_shingles == array_sort(array_distinct(HOF shingles))") {
    WordShingles.register(spark)
    val mismatches = docs.select(
        expr("graft_shingles(text, 3)").as("native"),
        array_sort(array_distinct(TextFns.shingles(col("text"), 3))).as("hof"))
      .where(col("native") =!= col("hof")).count()
    assert(mismatches === 0)
  }

  test("graft_shingle_hashes == sorted distinct hash60 of HOF shingles") {
    ShingleHashes.register(spark)
    val hof = array_sort(array_distinct(transform(
      TextFns.shingles(col("text"), 3), s => TextFns.hash60(s))))
    val mismatches = docs.select(
        expr("graft_shingle_hashes(text, 3)").as("native"), hof.as("hof"))
      .where(col("native") =!= col("hof")).count()
    assert(mismatches === 0)
  }

  test("graft_sorted_long_intersect_size == size(array_intersect)") {
    SortedLongIntersectSize.register(spark)
    ShingleHashes.register(spark)
    val pairs = docs.limit(20).select(expr("graft_shingle_hashes(text, 3)").as("a"))
      .crossJoin(docs.limit(20).select(expr("graft_shingle_hashes(text, 3)").as("b")))
    val mismatches = pairs.select(
        expr("graft_sorted_long_intersect_size(a, b)").as("native"),
        size(array_intersect(col("a"), col("b"))).as("hof"))
      .where(col("native") =!= col("hof")).count()
    assert(mismatches === 0)
  }

  test("graft_minhash skips null array elements (matches doc contract)") {
    MinHashSignature.register(spark)
    val withNull = Seq(Tuple1(Seq[java.lang.Long](7L, null, 42L)))
      .toDF("hashes")
    val withoutNull = Seq(Tuple1(Seq[java.lang.Long](7L, 42L)))
      .toDF("hashes")
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.select(expr("graft_minhash(hashes, 4)")).as[Seq[String]].head()
    assert(sig(withNull) === sig(withoutNull))
  }

  test("graft_simhash60 == the vote-loop reference on the token multiset") {
    Simhash60.register(spark)
    val fromExpr = docs.select(col("doc_id"), expr("graft_simhash60(text)").as("sim"))
      .as[(Long, Long)].collect().toMap
    val reference = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().map { case (id, text) =>
        val votes = new Array[Int](60)
        val md = java.security.MessageDigest.getInstance("MD5")
        text.split(" ", -1).foreach { tok =>
          val h = ShingleHashes.hash60(md, tok)
          (0 until 60).foreach { b =>
            if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          }
        }
        id -> (0 until 60).foldLeft(0L)((acc, b) =>
          if (votes(b) > 0) acc | (1L << b) else acc)
      }.toMap
    assert(fromExpr === reference)
  }

  test("graft_token_count == size(regexp_extract_all(bpe pattern)) on " +
       "the corpus and on adversarial strings") {
    TokenCount.register(spark)
    val regex = "size(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+', 0))"
    val mismatch = docs.select(
        expr("graft_token_count(text)").as("native"),
        expr(regex).as("composed"))
      .where(col("native") =!= col("composed")).count()
    assert(mismatch === 0L)

    val tricky = Seq("", " ", "  ", "a", "ab1c", "a!b", "Ab", "a  b",
      "über café", "123abc!!x  9", " leading", "trailing ", "!@#",
      "a1b2c3", "ñ", "mixedCASE42").toDF("text")
    val bad = tricky.select(col("text"),
        expr("graft_token_count(text)").as("native"),
        expr(regex).as("composed"))
      .where(col("native") =!= col("composed"))
      .collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("graft_char_entropy == explode->groupBy fixed-point formulation") {
    CharEntropy.register(spark)
    // composable mirror: one row per character, fixed-point per type
    val chars = docs.select(col("doc_id"),
      explode(split(col("text"), "")).as("ch"))
    val cnt = chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("doc_id").agg(sum(col("c")).as("n"))
    val composed = cnt.join(tot, "doc_id")
      .withColumn("t",
        round(lit(1000000.0) * (col("c").cast("double") / col("n").cast("double"))
          * log(col("n").cast("double") / col("c").cast("double")), 0)
          .cast("long"))
      .groupBy("doc_id").agg(sum(col("t")).as("composed"))
    val mismatches = docs
      .select(col("doc_id"), expr("graft_char_entropy(text)").as("native"))
      .join(composed, "doc_id")
      .where(col("native") =!= col("composed")).count()
    assert(mismatches === 0)
  }

  test("graft_char_entropy edge cases: empty, uniform, null") {
    CharEntropy.register(spark)
    val rows = Seq(("", 0L), ("aaaa", 0L))
      .toDF("s", "expect")
      .select(expr("graft_char_entropy(s)").as("got"), col("expect"))
      .where(col("got") =!= col("expect")).count()
    assert(rows === 0)
    val nulls = Seq(Option.empty[String]).toDF("s")
      .select(expr("graft_char_entropy(s)").as("got"))
      .where(col("got").isNotNull).count()
    assert(nulls === 0)
  }

  test("graft_damerau_levenshtein: closed forms, the unrestricted-vs-" +
       "OSA separator, symmetry, and codegen membership") {
    DamerauLevenshtein.register(spark)
    val cases = Seq(
      ("", "", 0), ("", "abc", 3), ("abc", "", 3),
      ("kitten", "sitting", 3),      // plain levenshtein agrees
      ("ab", "ba", 1),               // one transposition
      ("abcdef", "abcfed", 2),       // transposition + substitution path
      ("ca", "abc", 2),              // OSA would say 3 — the variant pin
      ("same", "same", 0))
    val bad = cases.toDF("a", "b", "want")
      .select(expr("graft_damerau_levenshtein(a, b)").as("got"), col("want"))
      .where(col("got") =!= col("want")).count()
    assert(bad === 0)
    // symmetry on real part names
    val parts = graft.Tables.t(spark, sf("sf0.001"), "part").limit(50)
    val asym = parts.as("x").crossJoin(parts.as("y"))
      .where(expr("graft_damerau_levenshtein(x.p_name, y.p_name)") =!=
             expr("graft_damerau_levenshtein(y.p_name, x.p_name)"))
      .count()
    assert(asym === 0)
    // distance never exceeds plain levenshtein (transpositions only help)
    val worse = parts.as("x").crossJoin(parts.as("y"))
      .where(expr("graft_damerau_levenshtein(x.p_name, y.p_name)") >
             levenshtein(col("x.p_name"), col("y.p_name"))).count()
    assert(worse === 0)
    import org.apache.spark.sql.functions.{col => c}
    val df = Seq(("hello", "hlelo")).toDF("a", "b")
      .select(expr("graft_damerau_levenshtein(a, b)").as("d"))
    df.collect()
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("WholeStageCodegen") ||
      !exec.contains("graft_damerau_levenshtein"), exec)
  }

  test("graft_damerau_levenshtein: inputs beyond the 8 KiB cap fail " +
       "fast instead of allocating a quadratic matrix") {
    import graft.functions.expressions.DamerauLevenshtein
    // at the cap: fine (identical strings, distance 0)
    val atCap = "x" * DamerauLevenshtein.MaxLen
    assert(DamerauLevenshtein.distance(atCap, atCap) === 0)
    // one past the cap: explicit failure, not an OOM
    val over = "x" * (DamerauLevenshtein.MaxLen + 1)
    val e = intercept[IllegalArgumentException] {
      DamerauLevenshtein.distance(over, "y")
    }
    assert(e.getMessage.contains("exceeds"))
  }

  test("CharlmScore.boundedCollect limits the driver materialization " +
       "itself and fails loudly past the cap") {
    // r16 ADVICE: the old gate ran inside register(), AFTER the full
    // collect. boundedCollect must (a) pass small models through
    // unchanged and (b) refuse an over-cap frame — and because it
    // limits the collect at cap+1 rows, feeding it an effectively
    // unbounded frame (spark.range) stays a cheap test instead of a
    // driver-OOM reproduction.
    import graft.functions.expressions.CharlmScore
    val small = Seq(("abc", 1L), ("bcd", 2L)).toDF("tri", "slog")
    assert(CharlmScore.boundedCollect(small).length === 2)
    val over = spark.range(CharlmScore.MaxModelEntries + 1L)
      .selectExpr("cast(id as string) as tri", "id as slog")
    val e = intercept[IllegalArgumentException] {
      CharlmScore.boundedCollect(over)
    }
    assert(e.getMessage.contains("exceeds"))
    assert(e.getMessage.contains("never materialized"),
      "the failure message must state the collect was bounded")
  }

  // ---- the r16 text-scoring expressions vs the exact plans they
  // replaced, on real docs PLUS edge strings the (ASCII-only) oracle
  // corpus never exercises: non-BMP code points (surrogate pairs —
  // catches UTF-16-unit slicing where code-point slicing is the
  // contract), multi-space splits (empty tokens), trailing
  // separators (Spark split keeps trailing empties; Java's bare
  // String.split drops them), and sub-gram-length strings.

  private lazy val edgeDocs = {
    val fixed = Seq(
      "", " ", "one", "a  b", "a b ", " a", "ab", "a b",
      "x y x y x y x y x y",
      "😀😀😀 a 😀😀" +
        "😀 a 😀😀😀 b",
      "héllo wörld héllo wörld héllo wörld",
      "t t t t t t t t t t t t",
      "the cat sat on the mat the cat sat on the mat")
    // seeded-random soup over an alphabet mixing spaces (token
    // boundaries), a surrogate-pair code point, combining accents,
    // and ASCII — sweeps input space the hand-picked cases miss;
    // deterministic seed keeps failures reproducible
    val rnd = new scala.util.Random(42)
    val alphabet = Array(" ", " ", "a", "b", "ab", "é", "́",
      new String(Character.toChars(0x1F600)), "x", ".")
    val fuzz = Seq.fill(40) {
      (0 until (1 + rnd.nextInt(60)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val edge = (fixed ++ fuzz)
      .zipWithIndex.map { case (t, i) => (1000000L + i, t) }
      .toDF("doc_id", "text")
    docs.select(col("doc_id"), col("text")).unionByName(edge).cache()
  }

  private lazy val triRef = expr(
    """CASE WHEN length(text) >= 3
      |THEN transform(sequence(1, length(text) - 2),
      |               i -> substring(text, i, 3))
      |ELSE array() END""".stripMargin)

  test("graft_gopher_rep == the explode/groupBy formulation it " +
       "replaced (incl. non-BMP, empty tokens, trailing separators)") {
    GopherRepetition.register(spark)
    val w = TextFns.tokens(col("text"))
    def grams(n: Int) =
      when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", slice(w, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    val tagged = concat(
      transform(grams(2), g => struct(lit(2).as("n"), g.as("g"))),
      transform(grams(5), g => struct(lit(5).as("n"), g.as("g"))))
    val ref = edgeDocs.select(col("doc_id"), explode(tagged).as("t"))
      .groupBy(col("doc_id"), col("t.n").as("n"), col("t.g").as("g"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("n") === 2, col("cnt") * length(col("g")))
          .otherwise(0L)).as("t2"),
        sum(when(col("n") === 5 && col("cnt") > 1,
            col("cnt") * length(col("g"))).otherwise(0L)).as("d5"))
    val bad = edgeDocs
      .select(col("doc_id"), expr("graft_gopher_rep(text)").as("r"))
      .join(ref, Seq("doc_id"), "left")
      .where(col("r.t2") =!= coalesce(col("t2"), lit(0L)) ||
             col("r.d5") =!= coalesce(col("d5"), lit(0L)))
    assert(bad.count() === 0)
  }

  test("graft_char_trigram_counts: exploded sums == transform/substring " +
       "occurrence counts, per (doc, trigram)") {
    CharTrigramCounts.register(spark)
    val ref = edgeDocs.select(col("doc_id"), explode(triRef).as("tri"))
      .groupBy("doc_id", "tri").agg(count(lit(1)).as("c"))
    val got = edgeDocs.select(col("doc_id"),
        explode(expr("graft_char_trigram_counts(text)")).as("t"))
      .select(col("doc_id"), col("t.tri").as("tri"), col("t.c").as("c2"))
    val bad = ref.join(got, Seq("doc_id", "tri"), "full")
      .where(col("c").isNull || col("c2").isNull || col("c") =!= col("c2"))
    assert(bad.count() === 0)
  }

  test("graft_charlm_score == the explode + model-join + per-doc " +
       "reduce it replaced, on the same trained model") {
    val dtris = edgeDocs.select(col("doc_id"), explode(triRef).as("tri"))
    val c3 = dtris.groupBy("tri").agg(count(lit(1)).as("c3"))
    val c2 = c3.groupBy(substring(col("tri"), 1, 2).as("p2"))
      .agg(sum(col("c3")).as("c2"))
    val lm = c3.withColumn("p2", substring(col("tri"), 1, 2)).join(c2, "p2")
      .select(col("tri"),
        round(-lit(1000000.0) *
          log(col("c3").cast("double") / col("c2")), 0)
          .cast("long").as("slog"))
    val model = lm.collect()
    CharlmScore.register(spark,
      model.map(_.getString(0)), model.map(_.getLong(1)))
    val ref = dtris.join(lm, "tri").groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"), sum(col("slog")).as("fp"))
    val bad = edgeDocs
      .select(col("doc_id"), expr("graft_charlm_score(text)").as("r"))
      .join(ref, Seq("doc_id"), "left")
      .where(col("r.n_tri") =!= coalesce(col("n_tri"), lit(0L)) ||
             col("r.surprisal_fp") =!= coalesce(col("fp"), lit(0L)))
    assert(bad.count() === 0)
  }

  test("graft_token_counts: exploded counts == explode(tokens) -> " +
       "groupBy(doc, term).count, per (doc, term)") {
    TokenTypeCounts.register(spark)
    val ref = edgeDocs
      .select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
    val got = edgeDocs.select(col("doc_id"),
        explode(expr("graft_token_counts(text)")).as("t"))
      .select(col("doc_id"), col("t.term").as("term"), col("t.c").as("c2"))
    val bad = ref.join(got, Seq("doc_id", "term"), "full")
      .where(col("c").isNull || col("c2").isNull || col("c") =!= col("c2"))
    assert(bad.count() === 0)
  }

  test("model-capture registry pattern: a built frame keeps ITS model " +
       "after the function is re-registered (eager-analysis contract)") {
    // charlm/langid register their collected models by CAPTURING them
    // in the function builder. That is safe only because DataFrame
    // creation analyzes eagerly — the frame resolves to the expression
    // instance holding the model CURRENT AT BUILD TIME. If resolution
    // ever deferred to action time, a multi-SF sweep (BenchScale runs
    // every decade in ONE JVM, re-registering per build) would
    // silently score frame N with frame N+1's model. Pin the contract.
    val one = Seq((1L, "abcd")).toDF("doc_id", "text")
    CharlmScore.register(spark, Array("abc", "bcd"), Array(7L, 11L))
    val dfA = one.select(expr("graft_charlm_score(text)").as("r"))
    // re-register with a DIFFERENT model before dfA executes
    CharlmScore.register(spark, Array("abc", "bcd"), Array(1000L, 2000L))
    val dfB = one.select(expr("graft_charlm_score(text)").as("r"))
    val a = dfA.select(col("r.surprisal_fp")).head().getLong(0)
    val b = dfB.select(col("r.surprisal_fp")).head().getLong(0)
    assert(a === 18L, s"frame built under model A must keep model A: $a")
    assert(b === 3000L, s"frame built under model B must see model B: $b")
  }

  test("graft_langid_score == the distinct + profile-join + conditional " +
       "sums it replaced, on the same trained profiles") {
    val docsL = edgeDocs.withColumn("lang",
      when(col("doc_id") % 2 === 0, "en").otherwise("de"))
    val dtris = docsL.select(col("doc_id"), col("lang"),
      explode(triRef).as("tri"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("c").desc, col("tri"))
    val profiles = dtris.groupBy("lang", "tri")
      .agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 50)
      .select(col("lang").as("plang"), col("tri"))
    val prof = profiles.collect()
    LangidScore.register(spark, Array("en", "de").map(l =>
      prof.filter(_.getString(0) == l).map(_.getString(1))))
    val ref = dtris.select(col("doc_id"), col("tri")).distinct()
      .join(profiles, "tri")
      .groupBy("doc_id")
      .agg(sum(when(col("plang") === "en", 1L).otherwise(0L)).as("s_en"),
           sum(when(col("plang") === "de", 1L).otherwise(0L)).as("s_de"))
    val bad = docsL
      .select(col("doc_id"), expr("graft_langid_score(text)").as("r"))
      .join(ref, Seq("doc_id"), "left")
      .where(col("r.s0") =!= coalesce(col("s_en"), lit(0L)) ||
             col("r.s1") =!= coalesce(col("s_de"), lit(0L)))
    assert(bad.count() === 0)
  }

  test("graft_token_dedup_ordered == filter-with-index HOF dedup " +
       "(incl. empty tokens, trailing separators, non-BMP)") {
    TokenDedupOrdered.register(spark)
    val ws = split(col("text"), " ")
    val kept = filter(ws, (x, i) => array_position(ws, x) === i + 1)
    val bad = edgeDocs.select(
        expr("graft_token_dedup_ordered(text)").as("r"),
        size(ws).as("n_tokens"), size(kept).as("n_unique"),
        array_join(kept, " ").as("dedup_text"))
      .where(col("r.n_tokens") =!= col("n_tokens") ||
             col("r.n_unique") =!= col("n_unique") ||
             col("r.dedup_text") =!= col("dedup_text"))
    assert(bad.count() === 0, bad.collect().take(3).mkString("; "))
  }

  test("graft_try_int == try_cast(s AS INT) (curated edges + seeded fuzz)") {
    // the exception-free parser must reproduce the ANSI/TRY grammar
    // EXACTLY: trimAll set (\t \n \r yes, NBSP no), single sign, ASCII
    // digits only (no '.', exponent, or unicode digits), overflow →
    // null at both int boundaries
    TryParseInt.register(spark)
    val curated = Seq(
      "A", "12", " 12 ", "+5", "-0", "2147483647", "2147483648",
      "-2147483648", "-2147483649", "12.0", "12.7", "1e2", "", " ",
      "\t12\n", "12\r", "0x1F", "١٢٣", ".5", "5.", "+",
      "-", "--5", "+-5", "12 34", "999999999999999999999", "12,3",
      "+ 5", " 12", "12 ", "00012", "＋5", "．5", "-00",
      "7", "8", " 9", "0", "-2147483650",
      "21474836470", "  +0012  ", "12a", "a12", "½", "¼2", null)
    // seeded soup over parse-relevant atoms: signs, digits, trim
    // candidates, decimal/exponent markers, multi-byte chars — sweeps
    // boundary combinations the hand list misses; deterministic seed
    val rnd = new scala.util.Random(1717)
    val atoms = Array("0", "1", "9", "+", "-", " ", "\t", ".", "e",
      "٣", "２", "a", " ", " ", "2147483647", "99999999999")
    val fuzz = Seq.fill(500) {
      (0 until rnd.nextInt(8))
        .map(_ => atoms(rnd.nextInt(atoms.length))).mkString
    }
    val df = (curated ++ fuzz).toDF("s")
      .select(col("s"), expr("graft_try_int(s)").as("native"),
        expr("try_cast(s AS INT)").as("ref"))
    val bad = df.where(!(col("native") <=> col("ref")))
    assert(bad.count() === 0, bad.collect().take(5).mkString("; "))
  }
}
