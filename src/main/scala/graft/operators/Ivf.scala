package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns._

/** Real IVF (inverted-file) coarse quantizer: deterministic seeding,
  * one Lloyd refinement over QUANTIZED integer means, nprobe-cell
  * probing. The 100 TB ANN shape:
  *
  *   - centroid table is tiny (C rows) and always broadcast — the
  *     corpus never shuffles during assignment;
  *   - assignment is a map-side fanout (C scores/vector) + per-vector
  *     argmax; the corpus is written back partitioned by cell, so the
  *     search join is a co-located equi-join on the cell key;
  *   - refinement sums quantized components (exact integers) and
  *     re-quantizes the mean as floor(sum/n + 0.5) — centroids stay
  *     integer vectors, so every cosine downstream remains bit-exact
  *     across engines and partitionings (the property the DuckDB
  *     oracle checks).
  *
  * Recall/latency trade is the standard one: C cells shrink the scan
  * by ~C×; nprobe > 1 recovers recall at proportional cost.
  */
object Ivf {

  /** Assign every corpus row (`id`, `v`, `n2`) to its nearest centroid
    * (`cell`, `cv`, `cn2`) by quantized cosine; ties break to the
    * lowest cell id.
    *
    * ZERO corpus shuffle: the centroid table is folded into one array
    * row and cross-broadcast, and the argmax runs as a higher-order
    * `aggregate` inside the row — no fanout, no re-grouping, the
    * 100 TB corpus streams through map-side once. The explicit
    * (cos, cell) tiebreak makes the fold independent of centroid
    * array order.
    */
  def assign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val centArr = broadcast(centroids.agg(
      collect_list(struct(col("cell"), col("cv"), col("cn2"))).as("cents")))
    corpus.crossJoin(centArr)
      .select(col("id"), col("v"), col("n2"),
        aggregate(col("cents"),
          struct(lit(-2.0d).as("best"), lit(-1).as("cell")),
          (acc, c) => {
            val cos = qcosine(
              call_function("graft_qdot", col("v"), c.getField("cv")),
              col("n2"), c.getField("cn2"))
            when(cos > acc.getField("best") ||
                 (cos === acc.getField("best") &&
                  c.getField("cell") < acc.getField("cell")),
              struct(cos.as("best"), c.getField("cell").as("cell")))
              .otherwise(acc)
          }).getField("cell").as("cell"))
  }

  /** One Lloyd refinement: per-cell quantized mean,
    * cq_i = floor(sum_i / n + 0.5), plus its exact squared norm.
    * Output matches the centroid-table schema taken by [[assign]].
    */
  def refine(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("v")).as(Seq("pos", "q")))
      .groupBy(col("cell"), col("pos"))
      .agg((sum(col("q")).cast("double") / count(lit(1))).as("mean"))
      .withColumn("cq", floor(col("mean") + 0.5d).cast("long"))
      .groupBy(col("cell"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cq")))),
        x => x.getField("cq")).as("cv"))
      .withColumn("cn2", call_function("graft_qdot", col("cv"), col("cv")))

  /** Expand each query (`id`, `v`, `n2`) to its `nprobe` nearest
    * cells. Output: (query_id, qv, qn2, cell).
    */
  def probe(queries: DataFrame, centroids: DataFrame, nprobe: Int): DataFrame = {
    val scored = queries.join(broadcast(centroids))
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("n2").as("qn2"), col("cell"),
        qcosine(call_function("graft_qdot", col("v"), col("cv")),
          col("n2"), col("cn2")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cell"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn2"), col("cell"))
  }

  /** End-to-end IVF top-k: seed centroids from the corpus rows with
    * `id < cells` (deterministic), refine once, assign, probe `nprobe`
    * cells per query, exact-rank the candidates. `queries`/`corpus`
    * are prepped frames (`Similarity.prep`).
    */
  def topK(queries: DataFrame, corpus: DataFrame, k: Int,
           cells: Int = 8, nprobe: Int = 2): DataFrame = {
    // keep only the vector columns: prepped frames may carry their own
    // `cell` (e.g. a label), which IVF replaces with learned cells.
    val corp = corpus.select(col("id"), col("v"), col("n2"))
    val qs = queries.select(col("id"), col("v"), col("n2"))
    val seeds = corp.where(col("id") < cells)
      .select(col("id").cast("int").as("cell"),
        col("v").as("cv"), col("n2").as("cn2"))
    // cents feeds both the re-assignment and the probe branch of the
    // plan; lazy localCheckpoint so the seed-assignment + refinement
    // subtree runs once (it is C rows), without pinning a cache entry
    // per call — ContextCleaner frees the blocks when the plan is GC'd.
    val cents = refine(assign(corp, seeds))
      .localCheckpoint(false)
    val assigned = assign(corp, cents)
    val cands = probe(qs, cents, nprobe)
      .join(assigned, "cell")
      .where(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("vec_id"),
        qcosine(call_function("graft_qdot", col("qv"), col("v")),
          col("qn2"), col("n2")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cands.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
