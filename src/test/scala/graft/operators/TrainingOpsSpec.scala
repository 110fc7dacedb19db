package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants for the round-5 training-pipeline additions. Each is
  * oracle-checked by the driver at sf0.01; these pin the semantic
  * relationships the oracle compare cannot express (subset relations,
  * redaction completeness) at sf0.001.
  */
class TrainingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sf("sf0.001"))

  test("semDedupPairs is a subset of the exhaustive near-dup pairs " +
       "with identical cosines") {
    val corpus = Similarity.prep(
      graft.Tables.t(spark, sf("sf0.001"), "embeddings"),
      "vec_id", "embedding", Some("label"))
    val brute = Similarity.nearDupPairs(corpus, 0.45)
      .select("id1", "id2", "cos")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val clustered = Similarity.semDedupPairs(corpus, cells = 8,
        threshold = 0.45)
      .select("id1", "id2", "cos")
      .as[(Long, Long, Double)].collect()
    assert(clustered.nonEmpty)
    clustered.foreach { case (a, b, c) =>
      assert(brute.contains((a, b)),
        s"($a,$b) in semdedup but not in brute force")
      assert(brute((a, b)) === c)
    }
  }

  test("semDedupPairsHier is a subset of the exhaustive near-dup pairs " +
       "with identical cosines") {
    val corpus = Similarity.prep(
      graft.Tables.t(spark, sf("sf0.001"), "embeddings"),
      "vec_id", "embedding", Some("label"))
    val brute = Similarity.nearDupPairs(corpus, 0.45)
      .select("id1", "id2", "cos")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    val hier = Similarity.semDedupPairsHier(corpus, targetCell = 250,
        threshold = 0.45)
      .select("id1", "id2", "cos")
      .as[(Long, Long, Double)].collect()
    assert(hier.nonEmpty)
    hier.foreach { case (a, b, c) =>
      assert(brute.contains((a, b)),
        s"($a,$b) in hier semdedup but not in brute force")
      assert(brute((a, b)) === c)
    }
  }

  test("gopher repetition fractions are sane and keep is their " +
       "threshold conjunction") {
    val rows = q("text_gopher_repetition")
      .select("top2_frac", "dup5_frac", "keep")
      .as[(Double, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t2, d5, keep) =>
      assert(t2 > 0.0) // every doc with >= 2 words has some bigram
      assert(d5 >= 0.0)
      assert(keep === (t2 <= 0.20 && d5 <= 0.15))
    }
  }

  test("pii redaction removes every e-mail/IP/SSN span it counted") {
    // run the same fixture injection + redaction but keep the text:
    // after the three passes, none of the patterns may match.
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
    val id = col("doc_id")
    val aug = concat(col("text"),
      when(id % 3 === 0, concat(lit(" contact u"), id.cast("string"),
        lit("@mail"), (id % 7).cast("string"), lit(".example.com")))
        .otherwise(lit("")),
      when(id % 4 === 0, concat(lit(" from "),
        (id % 223 + 1).cast("string"), lit("."),
        (id % 251).cast("string"), lit("."),
        ((id * 7) % 256).cast("string"), lit("."),
        (id % 100).cast("string"))).otherwise(lit("")),
      when(id % 5 === 0, concat(lit(" ssn "),
        (id % 900 + 100).cast("string"), lit("-"),
        (id % 90 + 10).cast("string"), lit("-"),
        (id % 9000 + 1000).cast("string"))).otherwise(lit("")))
    val red = graft.Tables.t(spark, sf("sf0.001"), "documents")
      .withColumn("aug", aug)
      .withColumn("redacted",
        regexp_replace(regexp_replace(regexp_replace(col("aug"),
          emailRe, "<EMAIL>"), ipRe, "<IP>"), ssnRe, "<SSN>"))
    val leftover = red.where(
      col("redacted").rlike(emailRe) || col("redacted").rlike(ipRe) ||
        col("redacted").rlike(ssnRe)).count()
    assert(leftover === 0)
    // and the counts line up with the placeholders that appeared
    val counted = q("text_pii_redact")
      .agg(sum("n_emails"), sum("n_ips"), sum("n_ssns"))
      .as[(Long, Long, Long)].head()
    val placed = red.agg(
      sum(size(split(col("redacted"), "<EMAIL>")) - 1),
      sum(size(split(col("redacted"), "<IP>")) - 1),
      sum(size(split(col("redacted"), "<SSN>")) - 1))
      .as[(Long, Long, Long)].head()
    assert(counted === placed)
  }

  test("tfidf top-k emits at most 3 ranked terms per doc, scores " +
       "non-increasing in rank") {
    val rows = q("text_tfidf_topk")
      .select("doc_id", "score", "rk")
      .as[(Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._3).toSeq === (1 to rs.length))
      assert(byRank.toSeq.sliding(2).forall {
        case Seq(a, b) => a._2 >= b._2
        case _ => true
      })
    }
  }

  test("charlm surprisal is a non-negative integer sum over n_tri " +
       "trigrams, zero only for all-deterministic contexts") {
    val rows = q("text_charlm_surprisal")
      .select("n_tri", "surprisal_fp")
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, s) =>
      assert(s >= 0L)
      assert(n > 0L) // every test doc has >= 3 chars
    }
    // the corpus is word-soup over a shared vocabulary: contexts are
    // not all deterministic, so SOME doc must accumulate surprisal
    assert(rows.map(_._2).sum > 0L)
  }
}
