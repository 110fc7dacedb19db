package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Similarity.prep(
    graft.Tables.t(spark, sf("sf0.001"), "embeddings"),
    "vec_id", "embedding", None).localCheckpoint()
  private lazy val queries = corpus.where(col("id") < 10)

  test("encode emits one code per subspace, all within the codebook") {
    val cb = Pq.train(corpus, m = 8, k = 16)
    assert(cb.count() === 8 * 16)
    val enc = Pq.encode(corpus, cb, m = 8)
    assert(enc.count() === corpus.count())
    val bad = enc.where(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(bad === 0)
  }

  test("ADC + exact re-rank reaches high recall@10 against brute force " +
       "and its reported scores are exact") {
    val k = 10
    val exact = Similarity.cosineTopK(queries, corpus, k)
      .select(col("query_id"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect()
    val pq = Pq.topK(queries, corpus, k, m = 8, codes = 16, rerank = 60)
      .select(col("query_id"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect()

    val exactSets = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val pqSets = pq.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = exactSets.map { case (q, want) =>
      pqSets.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }.toSeq
    val recall = recalls.sum / recalls.size
    assert(recall >= 0.6, s"mean recall@10 $recall below 0.6")

    // every (query, vec) PQ returns carries the EXACT cosine — the
    // approximation affects which candidates are found, not the scores
    val exactScores = exact.map(r => (r._1, r._2) -> r._3).toMap
    // recompute exact cosine for pq hits outside the brute-force top-k
    val allExact = Similarity.cosineTopK(queries, corpus, 1000)
      .select(col("query_id"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    pq.foreach { case (q, v, c) =>
      assert(allExact((q, v)) === c, s"score mismatch for ($q,$v)")
    }
  }

  test("PQ top-k is deterministic across runs") {
    val a = Pq.topK(queries, corpus, 5).select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val b = Pq.topK(queries, corpus, 5).select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(a === b)
  }

  test("IVFADC confines candidates to probed cells and reports exact " +
       "scores identical to the flat ADC scan's for shared hits") {
    val res = Pq.ivfTopK(queries, corpus, 10, cells = 8, nprobe = 2,
        rerank = 60)
      .select(col("query_id"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect()
    assert(res.nonEmpty)

    // rebuild the coarse quantizer exactly as ivfTopK does and check
    // every returned hit lives in one of its query's 2 probed cells —
    // the pruning contract that makes the 100 TB scan partition-local
    val corp = corpus.select(col("id"), col("v"), col("n2"))
    val seeds = corp.where(col("id") < 8)
      .select(col("id").cast("int").as("cell"),
        col("v").as("cv"), col("n2").as("cn2"))
    val cents = Ivf.refine(Ivf.assign(corp, seeds)).localCheckpoint()
    val cellOf = Ivf.assign(corp, cents).select(col("id"), col("cell"))
      .as[(Long, Int)].collect().toMap
    val probed = Ivf.probe(  // prepped frames carry a `cell` column —
        queries.select(col("id"), col("v"), col("n2")), cents, 2)
      .select(col("query_id"), col("cell"))
      .as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    res.foreach { case (q, v, _) =>
      assert(probed(q).contains(cellOf(v)),
        s"hit ($q,$v) in unprobed cell ${cellOf(v)}, probed ${probed(q)}")
    }

    // reported scores are EXACT cosines (pruning affects recall only)
    val allExact = Similarity.cosineTopK(queries, corpus, 1000)
      .select(col("query_id"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    res.foreach { case (q, v, c) =>
      assert(allExact((q, v)) === c, s"score mismatch for ($q,$v)")
    }

    // IVFADC = flat ADC ∩ probed cells: any flat-ADC top hit whose
    // cell was probed must also be an IVFADC hit (no residual
    // encoding, so ADC scores agree candidate-for-candidate)
    val flat = Pq.topK(queries, corpus, 10, rerank = 60)
      .select(col("query_id"), col("vec_id"))
      .as[(Long, Long)].collect()
    val ivfSets = res.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val flatInProbed = flat.filter { case (q, v) =>
      probed(q).contains(cellOf(v)) }
    val covered = flatInProbed.count { case (q, v) =>
      ivfSets.getOrElse(q, Set.empty).contains(v) }
    assert(covered.toDouble / flatInProbed.size >= 0.9,
      s"only $covered/${flatInProbed.size} probed-cell flat hits found")
  }

  test("residual IVFADC confines candidates to probed cells, reports " +
       "exact scores, and reaches sane recall within the probed cells") {
    val res = Pq.ivfResidualTopK(queries, corpus, 10, cells = 8,
        nprobe = 2, rerank = 60)
      .select(col("query_id"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect()
    assert(res.nonEmpty)

    val corp = corpus.select(col("id"), col("v"), col("n2"))
    val seeds = corp.where(col("id") < 8)
      .select(col("id").cast("int").as("cell"),
        col("v").as("cv"), col("n2").as("cn2"))
    val cents = Ivf.refine(Ivf.assign(corp, seeds)).localCheckpoint()
    val cellOf = Ivf.assign(corp, cents).select(col("id"), col("cell"))
      .as[(Long, Int)].collect().toMap
    val probed = Ivf.probe(
        queries.select(col("id"), col("v"), col("n2")), cents, 2)
      .select(col("query_id"), col("cell"))
      .as[(Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    res.foreach { case (q, v, _) =>
      assert(probed(q).contains(cellOf(v)),
        s"hit ($q,$v) in unprobed cell ${cellOf(v)}")
    }

    // scores are EXACT cosines (residual coding moves the ADC
    // estimate, never the re-ranked scores)
    val allExact = Similarity.cosineTopK(queries, corpus, 1000)
      .select(col("query_id"), col("vec_id"), col("cos"))
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    res.foreach { case (q, v, c) =>
      assert(allExact((q, v)) === c, s"score mismatch for ($q,$v)")
    }

    // recall floor against the probed-cell-restricted exact answer:
    // the best 10 exact neighbors within each query's probed cells —
    // residual ADC should recover most of them through the rerank=60
    // shortlist (a weak floor; typical is near-total)
    val bestInProbed = allExact.toSeq
      .filter { case ((q, v), _) => probed(q).contains(cellOf(v)) }
      .groupBy(_._1._1).view.mapValues(
        _.sortBy { case ((_, v), c) => (-c, v) }.take(10)
          .map(_._1._2).toSet)
    val resSets = res.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = bestInProbed.map { case (q, want) =>
      resSets.getOrElse(q, Set.empty).intersect(want).size.toDouble /
        math.max(1, want.size)
    }.toSeq
    assert(recalls.sum / recalls.size >= 0.6,
      s"mean probed-cell recall ${recalls.sum / recalls.size} below 0.6")
  }
}
