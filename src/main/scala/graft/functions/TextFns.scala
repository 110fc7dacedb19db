package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Text-analysis / dedup column functions for the training-data
  * pipeline extensions (BASELINE.json north star; not present in the
  * reference, which is numeric-only ETL).
  *
  * Portability contract: every hash used in an oracle-checked query is
  * md5-derived so DuckDB can reproduce it bit-for-bit. A 60-bit
  * integer hash is the first 15 hex chars of md5 parsed base-16 —
  * `CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)` on the DuckDB
  * side.
  */
object TextFns {

  /** Whitespace tokens. Documents testdata is single-space separated. */
  def tokens(text: Column): Column = split(text, " ")

  /** PII span patterns, kept inside the RE2 ∩ java.util.regex common
    * subset so DuckDB oracles can mirror matches exactly.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Mask e-mail/IPv4/SSN spans with typed placeholders — chained
    * native regexp_replace, codegen'd, map-side.
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), SsnRe, "<SSN>")

  /** 60-bit portable integer hash of a string (see object doc). */
  def hash60(c: Column): Column = conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles (default 3), empty array when too short.
    * Pure expression: stays in codegen, no UDF.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = tokens(text)
    val idx = when(size(w) >= n, sequence(lit(1), size(w) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    transform(idx, i => concat_ws(" ", (0 until n).map(k => element_at(w, i + k)): _*))
  }

  /** One MinHash signature component: min over shingles of a salted
    * md5. Used as `min(minhashComponent(j, shingleCol))` per group.
    * Lexicographic min over hex strings is engine-portable.
    */
  def saltedMd5(j: Int, s: Column): Column = md5(concat_ws("|", lit(j.toString), s))

  /** SimHash over the token multiset: 60-bit fingerprint where bit b
    * is set iff the (+1/-1) vote sum of token-hash bit b is positive.
    * Token hash = 60-bit md5 (matches DuckDB replication exactly).
    * A scalar UDF: per-row cost is O(tokens * 60) with zero shuffle,
    * which beats the explode-to-1.8M-rows pure-SQL formulation.
    */
  val simhash60: UserDefinedFunction = udf { tokens: Seq[String] =>
    val votes = new Array[Int](60)
    if (tokens != null) tokens.foreach { t =>
      val h = java.lang.Long.parseLong(md5Hex(t).substring(0, 15), 16)
      var b = 0
      while (b < 60) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var sim = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) sim |= (1L << b); b += 1 }
    sim
  }

  /** Language-ID heuristic: stopword-marker occurrence counts via the
    * replace-length trick (identical single-pass, non-overlapping
    * semantics in Spark and DuckDB). `markers` maps language -> probe
    * words; classification is argmax with ties broken by map order.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and"),
    "de" -> Seq("der", "und"),
    "es" -> Seq("el", "y"),
    "fr" -> Seq("le", "et"))

  /** #occurrences of ` word ` in the space-padded text. */
  def markerCount(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val marker = s" $word "
    ((length(padded) - length(replace(padded, lit(marker), lit(" "))))
      / (marker.length - 1)).cast("int")
  }

  def langScore(text: Column, lang: String): Column =
    langMarkers.toMap.apply(lang).map(w => markerCount(text, w))
      .reduce(_ + _)

  /** Marker scores for every language, keyed by code — callers look up
    * by name, so adding/reordering a language in [[langMarkers]] can't
    * silently shift which score lands where (the failure mode of
    * positional `val Seq(en, de, …) = …` destructuring).
    */
  def langScores(text: Column): Map[String, Column] =
    langMarkers.map { case (l, _) => l -> langScore(text, l) }.toMap

  /** Argmax language over [[langMarkers]], ties broken by list order
    * (earlier language wins) — language i is the guess iff its score
    * is >= every LATER language's score. Generic in the marker list:
    * the CASE chain is built from it, not hand-unrolled per language.
    */
  def langGuess(text: Column): Column = {
    val scored = langMarkers.map { case (l, _) => (l, langScore(text, l)) }
    val branches = scored.zipWithIndex.init.map { case ((l, s), i) =>
      (l, scored.drop(i + 1).map { case (_, t) => s >= t }.reduce(_ && _))
    }
    branches.foldRight(lit(scored.last._1): Column) {
      case ((l, cond), els) => when(cond, l).otherwise(els)
    }
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new StringBuilder(32)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
}
