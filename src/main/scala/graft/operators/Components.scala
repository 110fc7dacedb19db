package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the clustering step that turns near-duplicate PAIRS (MinHash/LSH,
  * SimHash, exact-Jaccard output) into duplicate GROUPS, so a corpus
  * curation pipeline can keep one canonical document per cluster
  * (reference behavior: the dedup stages of SURVEY §2.11; the pair
  * producers are `Dedup.minhashLshPairs` / `Dedup.jaccardPairs`).
  *
  * Algorithm: hash-min label propagation. Every node starts labeled
  * with its own id; each iteration every node takes the min of its
  * label and its neighbors' labels. Converges in O(component diameter)
  * iterations — near-dup clusters are dense and shallow (stars/cliques
  * around a template), so 3-5 iterations cover real corpora; maxIters
  * bounds adversarial chains.
  *
  * Scale shape per iteration: one shuffle join (labels ⋈ edges, both
  * partitioned by node) + one grouped min, materialized by a SINGLE
  * blocking action that doubles as the convergence check — labels are
  * monotone non-increasing, so the exact decimal sum of all labels
  * strictly decreases until the fixpoint; comparing successive sums
  * needs no second join or count job. The edge list is never
  * collected; state is one (node, label) row per node.
  * `localCheckpoint` truncates lineage so the plan stays constant-size
  * across iterations (swap for durable `checkpoint` on a
  * fault-tolerant cluster run).
  */
object Components {

  /** Returns (`node`, `component`) — component = min node id reachable.
    * Nodes are the endpoints of `edges`; isolated nodes (no edges) are
    * the caller's trivial singletons and are not emitted.
    */
  def connected(edges: DataFrame, aCol: String, bCol: String,
                maxIters: Int = 32): DataFrame = {
    val e0 = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    // symmetrize once; every propagation step reads this static frame
    val und = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()

    // exact order-independent fingerprint of a labeling: decimal(38,0)
    // sum never overflows (node ids ≤ 2^63, so even 10^15 rows stay
    // ~10^34 < 10^38) and, because labels only ever DECREASE, the sum
    // strictly decreases iff any label changed — one aggregate job
    // replaces the old join + count convergence probe, and the same
    // action materializes the iteration's lazy checkpoint.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).head().getDecimal(0)

    // init: own id vs min direct neighbor
    var labels = und.groupBy(col("a").as("node"))
      .agg(min(col("b")).as("minb"))
      .select(col("node"), least(col("node"), col("minb")).as("label"))
      .localCheckpoint()
    var prevSum = labelSum(labels)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIters) {
      // neighbor labels: for each edge (a,b), a can adopt label(b)
      val viaNeighbors = und.join(labels, und("b") === labels("node"))
        .groupBy(und("a").as("node"))
        .agg(min(col("label")).as("nlabel"))
      val next = Materialize(labels.join(viaNeighbors, "node")
        .select(col("node"), least(col("label"), col("nlabel")).as("label")),
        eager = false)
      val s = labelSum(next) // one job: checkpoint + convergence probe
      labels = next
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"Components.connected did not converge within maxIters=$maxIters " +
          "iterations — a component's diameter exceeds the bound; raise " +
          "maxIters")
    labels.select(col("node"), col("label").as("component"))
  }

  /** Connected components by ALTERNATING large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): each round rewires every node's neighbors to the
    * minimum of its closed neighborhood, halving star depth — O(log n)
    * rounds regardless of component DIAMETER. Prefer this over
    * [[connected]] for long-chain graphs (linked lists, road networks,
    * citation chains) where diameter ≈ n would mean n propagation
    * rounds; for shallow near-dup clusters the simpler propagation
    * wins on constant factors.
    *
    * Per round: two grouped-min + join steps (the two star ops) and a
    * convergence check; all frames stay distributed.
    */
  def connectedAlternating(edges: DataFrame, aCol: String, bCol: String,
                           maxRounds: Int = 24): DataFrame = {
    val e = canonicalEdges(edges, aCol, bCol)
    alternatingOn(e, maxRounds)
  }

  /** Size-gated front door: canonicalize the edge list once, then —
    * borrowing the broadcast-join discipline — solve BROADCAST-SIZED
    * component graphs on the driver with union-find (zero shuffle
    * rounds) and everything larger with the O(log n) alternating
    * contraction.
    *
    * Rationale, measured: each distributed round is a fixed-cost
    * scheduler/shuffle job regardless of data size, so a few-thousand-
    * edge near-dup graph pays ~6-8 such rounds (alternating) or
    * O(diameter) rounds (hash-min) for work a driver loop does in
    * milliseconds — at sf1 the CC stage was ~22 s of pure round
    * overhead on 2.5k edges. The gate (default 1M canonical edges,
    * ~16 MB collected — the same order as a broadcast side) bounds
    * driver memory a priori; above it, nothing is ever collected.
    * Both paths emit the identical (node, component = min reachable
    * id) labeling.
    */
  def connectedAuto(edges: DataFrame, aCol: String, bCol: String,
                    driverMaxEdges: Long = 1L << 20,
                    maxRounds: Int = 24): DataFrame = {
    val e = canonicalEdges(edges, aCol, bCol)
    // the count both materializes the checkpoint and arms the gate
    if (e.count() <= driverMaxEdges) {
      val spark = e.sparkSession
      // Primitive structures throughout: the collect lands as
      // specialized (Long, Long) tuples (~32 B/edge, so ~32 MB at the
      // 1M-edge gate), the union-find state is an open-addressing
      // long->long table (~24 B/slot at load <= 0.5), and the output
      // goes back through a local Dataset of specialized tuples — no
      // boxed Rows, no java.util.HashMap entry objects. The earlier
      // boxed implementation cost ~10x that near the gate, which
      // quietly turned the "~16 MB, broadcast-sized" gate rationale
      // into a few-hundred-MB driver spike.
      val pairEnc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong)
      val collected = e.as[(Long, Long)](pairEnc).collect()
      val parent = new LongLongMap(collected.length * 2)
      def find(x0: Long): Long = {
        var x = x0
        var p = parent(x)
        while (p != x) {                      // path halving
          val gp = parent(p)
          parent.put(x, gp)
          x = gp
          p = parent(x)
        }
        x
      }
      // attach the LARGER root under the smaller: every root is the
      // min id of its set by construction, so labels need no second
      // pass
      collected.foreach { case (a, b) =>
        parent.putIfAbsent(a, a)
        parent.putIfAbsent(b, b)
        val ra = find(a)
        val rb = find(b)
        if (ra < rb) parent.put(rb, ra)
        else if (rb < ra) parent.put(ra, rb)
      }
      val nodes = new Array[(Long, Long)](parent.size)
      var i = 0
      parent.foreachKey { k => nodes(i) = (k, find(k)); i += 1 }
      spark.createDataset(nodes.toIndexedSeq)(pairEnc)
        .toDF("node", "component")
    } else alternatingOn(e, maxRounds)
  }

  /** Minimal open-addressing long->long map (power-of-two capacity,
    * linear probing, grow at load 0.5) for the driver-side union-find:
    * ~24 B/slot in two primitive arrays vs ~100+ B/entry for a boxed
    * java.util.HashMap — the difference between the gate's documented
    * memory bound and a 10x overshoot. Occupancy is tracked in a
    * separate byte array so any long (including 0) is a valid key.
    */
  private final class LongLongMap(expected: Int) {
    private var cap = java.lang.Integer.highestOneBit(
      math.max(16, expected * 2) - 1) << 1
    private var mask = cap - 1
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var occ = new Array[Boolean](cap)
    private var n = 0

    def size: Int = n

    private def slot(k: Long): Int = {
      // 64->32 bit mix (splitmix64 finalizer) so sequential ids spread
      var h = k
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      var i = ((h ^ (h >>> 31)).toInt) & mask
      while (occ(i) && keys(i) != k) i = (i + 1) & mask
      i
    }

    def apply(k: Long): Long = vals(slot(k))

    def put(k: Long, v: Long): Unit = {
      val i = slot(k)
      if (!occ(i)) {
        occ(i) = true; keys(i) = k; n += 1
        if (n * 2 > cap) grow()
      }
      vals(slot(k)) = v
    }

    def putIfAbsent(k: Long, v: Long): Unit = {
      val i = slot(k)
      if (!occ(i)) {
        occ(i) = true; keys(i) = k; vals(i) = v; n += 1
        if (n * 2 > cap) grow()
      }
    }

    def foreachKey(f: Long => Unit): Unit = {
      var i = 0
      while (i < cap) { if (occ(i)) f(keys(i)); i += 1 }
    }

    private def grow(): Unit = {
      val (ok, ov, oo, ocap) = (keys, vals, occ, cap)
      cap <<= 1; mask = cap - 1
      keys = new Array[Long](cap); vals = new Array[Long](cap)
      occ = new Array[Boolean](cap); n = 0
      var i = 0
      while (i < ocap) {
        if (oo(i)) { put(ok(i), ov(i)) }
        i += 1
      }
    }
  }

  /** (a > b) canonical distinct edge list, checkpointed — the shared
    * first materialization of both [[connectedAuto]] paths.
    */
  private def canonicalEdges(edges: DataFrame, aCol: String,
                             bCol: String): DataFrame = {
    val e0 = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    e0.select(greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .distinct().localCheckpoint()
  }

  /** Alternating contraction over a canonical checkpointed edge list
    * (see [[connectedAlternating]] for the algorithm contract).
    */
  private def alternatingOn(canonical: DataFrame,
                            maxRounds: Int): DataFrame = {

    // large-star(u): every neighbor v > u re-points to
    // m = min(Γ(u) ∪ {u}). Operates on the symmetric edge view.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      val mins = sym.groupBy(col("a").as("u")).agg(min(col("b")).as("mb"))
        .select(col("u"), least(col("u"), col("mb")).as("m"))
      sym.where(col("b") > col("a"))
        .join(mins, col("a") === col("u"))
        .select(col("b").as("a"), col("m").as("b"))
        .where(col("a") =!= col("b"))
        .distinct()
    }

    // small-star(u): neighbors v < u (plus u itself) re-point to
    // m = min of that set. Operates on the to-smaller directed view.
    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(greatest(col("a"), col("b")).as("a"),
          least(col("a"), col("b")).as("b"))
        .distinct()
      val mins = dir.groupBy(col("a").as("u")).agg(min(col("b")).as("m"))
      val moved = dir.join(mins, col("a") === col("u"))
        .where(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
      val self = dir.join(mins, col("a") === col("u"))
        .select(col("a"), col("m").as("b"))
      moved.union(self).where(col("a") =!= col("b")).distinct()
    }

    // Order-independent fingerprint of the canonical edge set: row
    // count + exact decimal sum of per-edge 64-bit hashes, both from
    // ONE aggregate job (which also materializes the round's lazy
    // checkpoint) — replacing the old count + count + except.isEmpty
    // triple (3 blocking jobs, one a full anti-join shuffle). Equal
    // fingerprints on different sets need a colliding 64-bit hash SUM
    // at matching cardinality — vanishing odds, and one extra
    // harmless round would re-derive the same fixpoint anyway.
    def fingerprint(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).head()
      (r.getLong(0), r.getDecimal(1))
    }

    var e = canonical
    var prev = fingerprint(e)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val next = Materialize(smallStar(largeStar(e)), eager = false)
      // star-contraction fixpoint: the canonical edge set is stable
      val fp = fingerprint(next)
      converged = fp._1 == prev._1 && fp._2.compareTo(prev._2) == 0
      prev = fp
      e = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"Components.connectedAlternating did not converge within " +
          s"$maxRounds rounds")
    // at the fixpoint every edge is (node, componentMin); the minimum
    // itself appears only on the right — add its self-labeling row
    e.select(col("a").as("node"), col("b").as("component"))
      .union(e.select(col("b"), col("b")).distinct())
      .distinct()
  }
}
