package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns._
import graft.functions.expressions.GraftFunctions

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — the query set is broadcast, so
  * the corpus streams through map-side (no shuffle of the 100 TB side);
  * per-query top-k is a windowed rank over a corpus-partitioned
  * aggregate.
  *
  * Scale path: cell-restricted search (IVF-style). Candidates are
  * limited to the query's cell (here the precomputed `label` column
  * stands in for a learned coarse quantizer), turning the scan into a
  * cell-key equi-join — the standard trade of recall for a ~#cells
  * fan-in reduction.
  *
  * All cosines use exact quantized integer arithmetic (VectorFns), so
  * ranks are deterministic across engines and partitionings.
  */
object Similarity {

  /** Prepares (id, cell, qvec, norm2). */
  def prep(emb: DataFrame, idCol: String, vecCol: String,
           cellCol: Option[String]): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val q = quantize(col(vecCol))
    emb.select(
      col(idCol).as("id"),
      cellCol.map(col).getOrElse(lit(0)).as("cell"),
      q.as("v")
    ).withColumn("n2", expr("graft_qdot(v, v)"))
  }

  /** Brute-force cosine top-k of `corpus` for each row of `queries`
    * (both prepped). Deterministic tiebreak on candidate id.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val qs = broadcast(queries.select(col("id").as("query_id"),
      col("v").as("qv"), col("n2").as("qn2")))
    val scored = corpus.join(qs, col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("vec_id"),
        qcosine(expr("graft_qdot(qv, v)"), col("qn2"), col("n2")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Cell-restricted (IVF-style) top-k: candidates share the query's
    * cell. Equi-join on cell key — scales as an ordinary shuffle join.
    */
  def cellTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val qs = broadcast(queries.select(col("id").as("query_id"),
      col("cell").as("qcell"), col("v").as("qv"), col("n2").as("qn2")))
    val scored = corpus
      .join(qs, col("cell") === col("qcell") && col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("vec_id"),
        qcosine(expr("graft_qdot(qv, v)"), col("qn2"), col("n2")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** Deterministic ±1 random-hyperplane matrix: component (p, i) is
    * +1 iff the low bit of the 60-bit md5 hash of "p|i" is set. Both
    * engines can rebuild it from the same rule, so LSH bucketing stays
    * oracle-checkable.
    */
  def hyperplanes(planes: Int, dim: Int): Seq[Seq[Long]] =
    (0 until planes).map { p =>
      (0 until dim).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p|$i".getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString
        if ((java.lang.Long.parseLong(hex.substring(0, 15), 16) & 1L) == 1L) 1L
        else -1L
      }
    }

  /** Sign-random-projection bucket (P-bit string) for a quantized
    * vector column: bit p = (v . plane_p >= 0). Exact integer dots via
    * graft_qdot -> bit-identical buckets everywhere.
    */
  def srpBucket(v: org.apache.spark.sql.Column,
                planes: Seq[Seq[Long]]): org.apache.spark.sql.Column =
    concat(planes.map { plane =>
      when(call_function("graft_qdot", v, typedLit(plane)) >= 0, "1")
        .otherwise("0")
    }: _*)

  /** LSH-bucketed ANN: queries only score candidates in their own
    * sign-random-projection bucket. The 100 TB shape: bucket is a
    * precomputable partition/cluster key, the scan becomes an
    * equi-join, recall trades against #planes.
    */
  def srpTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              planes: Seq[Seq[Long]]): DataFrame = {
    val withBucket = (df: DataFrame) =>
      df.withColumn("bucket", srpBucket(col("v"), planes))
    val qs = broadcast(withBucket(queries).select(col("id").as("query_id"),
      col("bucket").as("qbucket"), col("v").as("qv"), col("n2").as("qn2")))
    val scored = withBucket(corpus)
      .join(qs, col("bucket") === col("qbucket") && col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("vec_id"),
        qcosine(expr("graft_qdot(qv, v)"), col("qn2"), col("n2")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** All corpus pairs with cosine >= threshold (embedding near-dup).
    * Exhaustive O(n^2/2) comparison — correct baseline; at scale,
    * bucket by an LSH of the vector first and reuse the same verify.
    */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame =
    corpus.as("a").join(corpus.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        qcosine(expr("graft_qdot(a.v, b.v)"), col("a.n2"), col("b.n2")).as("cos"))
      .where(col("cos") >= threshold)

  /** SemDeDup (Abbas et al. 2023): embedding near-dup pairs restricted
    * to k-means cells — the scale path [[nearDupPairs]]'s Scaladoc
    * promises. Cluster with the [[Ivf]] coarse quantizer (deterministic
    * seeds, one quantized-mean Lloyd step, centroids broadcast — the
    * corpus never shuffles during assignment), then compare only
    * WITHIN each cell: the join is an equi-join on the cell key, so
    * pair count is Σ|cell|²/2 instead of n²/2 and each cell's pairs
    * co-locate on one reducer. Missed cross-cell near-dups are the
    * documented recall trade (the paper's too); raise `cells` for
    * smaller buckets, not bigger machines.
    */
  def semDedupPairs(corpus: DataFrame, cells: Int,
                    threshold: Double): DataFrame = {
    val corp = corpus.select(col("id"), col("v"), col("n2"))
    val seeds = corp.where(col("id") < cells)
      .select(col("id").cast("int").as("cell"),
        col("v").as("cv"), col("n2").as("cn2"))
    val cents = Ivf.refine(Ivf.assign(corp, seeds)).localCheckpoint(false)
    val assigned = Ivf.assign(corp, cents)
    assigned.as("a").join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .select(col("a.cell").as("cell"),
        col("a.id").as("id1"), col("b.id").as("id2"),
        qcosine(expr("graft_qdot(a.v, b.v)"), col("a.n2"), col("b.n2"))
          .as("cos"))
      .where(col("cos") >= threshold)
  }

  /** SCALE-SIZED SemDeDup: [[semDedupPairs]] with the cell count
    * derived from the corpus size — cells = max(8, ceil(n /
    * targetCell)) — so the expected cell population |cell| ≈
    * targetCell stays CONSTANT as the corpus grows. That sizing rule
    * is the operator's actual 100 TB contract: with fixed k the
    * within-cell pair term Σ|cell|²/2 grows quadratically (every cell
    * 10× denser under a 10× corpus), while with k ∝ n it is
    * n·targetCell/2 — linear. The flat n×k assignment scan stays
    * sub-dominant up to n ≈ targetCell²/2; past that (cluster scale)
    * assignment itself goes hierarchical — a √k-way coarse level over
    * the same quantizer, cost n·2√k — without touching the pair math.
    *
    * The corpus count comes from a count() pre-pass (one columnar
    * scan of the id column; at cluster scale, table statistics). It
    * is ROUNDED to the sizing formula both engines can mirror — the
    * DuckDB oracle computes the identical cells via a scalar
    * subquery, so the scaled variant is hash-checked, not trusted.
    */
  def semDedupPairsScaled(corpus: DataFrame, targetCell: Int,
                          threshold: Double): DataFrame = {
    val n = corpus.select(col("id")).count()
    val cells = math.max(8L, (n + targetCell - 1) / targetCell).toInt
    semDedupPairs(corpus, cells, threshold)
  }

  /** Assign each member row (`id`, `v`, `n2`, `ccell`) to its nearest
    * fine centroid (`ccell`, `j`, `cv`, `cn2`) WITHIN its own coarse
    * cell; ties break to the lowest `j`. Same zero-corpus-shuffle
    * shape as [[Ivf.assign]], except the broadcast carries one
    * centroid array PER coarse cell and the join is an equi-join on
    * `ccell` — each row scores only its coarse cell's ~√k fine
    * centroids instead of all k.
    */
  private def assignWithin(members: DataFrame, cents: DataFrame): DataFrame = {
    val centArr = broadcast(cents.groupBy(col("ccell"))
      .agg(collect_list(struct(col("j"), col("cv"), col("cn2"))).as("cents")))
    members.join(centArr, "ccell")
      .select(col("id"), col("v"), col("n2"), col("ccell"),
        aggregate(col("cents"),
          struct(lit(-2.0d).as("best"), lit(-1).as("j")),
          (acc, c) => {
            val cos = qcosine(
              call_function("graft_qdot", col("v"), c.getField("cv")),
              col("n2"), c.getField("cn2"))
            when(cos > acc.getField("best") ||
                 (cos === acc.getField("best") &&
                  c.getField("j") < acc.getField("j")),
              struct(cos.as("best"), c.getField("j").as("j")))
              .otherwise(acc)
          }).getField("j").as("j"))
  }

  /** One Lloyd refinement per (ccell, j) fine cell — [[Ivf.refine]]
    * with the two-part key. Empty fine cells drop out (no rows).
    */
  private def refineWithin(assigned: DataFrame): DataFrame =
    assigned
      .select(col("ccell"), col("j"), posexplode(col("v")).as(Seq("pos", "q")))
      .groupBy(col("ccell"), col("j"), col("pos"))
      .agg((sum(col("q")).cast("double") / count(lit(1))).as("mean"))
      .withColumn("cq", floor(col("mean") + 0.5d).cast("long"))
      .groupBy(col("ccell"), col("j"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cq")))),
        x => x.getField("cq")).as("cv"))
      .withColumn("cn2", call_function("graft_qdot", col("cv"), col("cv")))

  /** HIERARCHICAL scale-sized SemDeDup: the same cells = max(8,
    * ceil(n/targetCell)) pair math as [[semDedupPairsScaled]], but the
    * quantizer is two-level so training + assignment cost n·O(√k)
    * instead of n·k.
    *
    * Why: the flat scaled variant's n×k assignment scan is quadratic
    * in the corpus once k ∝ n — measured: its sf3→sf10 slope is 1.31,
    * with the crossover at n ≈ targetCell²/2 exactly where its
    * Scaladoc predicted. This is that Scaladoc's promised fix: a
    * k1 = ⌈√k⌉-way coarse level (seeds id < k1, one quantized-mean
    * Lloyd step — [[Ivf]] verbatim), then f = ⌈k/k1⌉ fine cells
    * trained and assigned WITHIN each coarse cell (seeds = the f
    * lowest-id members, one Lloyd step, both restricted to the cell's
    * members). Every step touches each corpus row O(k1 + f) = O(√k)
    * times; the only data-sized exchanges are the ccell hash
    * repartitions. At true cluster scale the same construction
    * recurses (depth log k), keeping per-row cost polylog.
    *
    * The trade vs the flat variant: fine cells refine against only
    * their coarse cell's members, so cell boundaries differ from the
    * flat k-means' and near-dups straddling a coarse boundary are
    * missed — the standard hierarchical-quantizer recall trade, same
    * family as nprobe=1 IVF search. Pairs remain a subset of the
    * exhaustive [[nearDupPairs]] with bit-identical cosines, and the
    * whole pipeline (integer dots, floor(mean + 0.5) requantization,
    * row_number seeding) is mirrored step-for-step by the DuckDB
    * oracle, so the variant is hash-checked, not trusted.
    *
    * Output: (cell = ccell·f + j, id1, id2, cos) for pairs with
    * cos ≥ threshold sharing a fine cell.
    */
  def semDedupPairsHier(corpus: DataFrame, targetCell: Int,
                        threshold: Double): DataFrame = {
    val corp = corpus.select(col("id"), col("v"), col("n2"))
    val n = corp.count()
    val k = math.max(8L, (n + targetCell - 1) / targetCell)
    val k1 = math.ceil(math.sqrt(k.toDouble)).toLong
    val f = ((k + k1 - 1) / k1).toInt

    val cSeeds = corp.where(col("id") < k1)
      .select(col("id").cast("int").as("cell"),
        col("v").as("cv"), col("n2").as("cn2"))
    val cCents = Ivf.refine(Ivf.assign(corp, cSeeds)).localCheckpoint(false)
    // coarse membership feeds fine seeding, training and assignment —
    // materialize once (lazy local checkpoint, ContextCleaner-freed)
    val coarse = Ivf.assign(corp, cCents)
      .withColumnRenamed("cell", "ccell").localCheckpoint(false)

    val wSeed = Window.partitionBy(col("ccell")).orderBy(col("id"))
    val fSeeds = coarse.withColumn("j", row_number().over(wSeed) - 1)
      .where(col("j") < f)
      .select(col("ccell"), col("j"), col("v").as("cv"), col("n2").as("cn2"))
    val fCents = refineWithin(assignWithin(coarse, fSeeds))
      .localCheckpoint(false)
    val asg = assignWithin(coarse, fCents)

    asg.as("a").join(asg.as("b"),
        col("a.ccell") === col("b.ccell") && col("a.j") === col("b.j") &&
        col("a.id") < col("b.id"))
      .select((col("a.ccell").cast("long") * f + col("a.j")).cast("int")
          .as("cell"),
        col("a.id").as("id1"), col("b.id").as("id2"),
        qcosine(expr("graft_qdot(a.v, b.v)"), col("a.n2"), col("b.n2"))
          .as("cos"))
      .where(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cell"), col("cos"))
  }
}
