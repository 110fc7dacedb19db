package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Cross-implementation check: our DataFrame hash-min label
  * propagation must agree with Spark's own GraphX
  * `connectedComponents` (Pregel-based, independently implemented)
  * on random graphs — both canonicalize a component by its minimum
  * vertex id, so the outputs are directly comparable.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("Components.connected agrees with GraphX connectedComponents " +
       "on random graphs") {
    val rng = new Random(23)
    (1 to 3).foreach { round =>
      val nodes = 20 + rng.nextInt(30)
      val edges = (for {
        a <- 0 until nodes
        b <- (a + 1) until nodes
        if rng.nextDouble() < (0.04 + 0.02 * round)
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val got = Components.connected(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        val graph = org.apache.spark.graphx.Graph.fromEdgeTuples(
          spark.sparkContext.parallelize(edges), defaultValue = 0)
        val want = graph.connectedComponents().vertices.collect().toMap
        assert(got === want, s"round=$round edges=$edges")
      }
    }
  }

  test("connectedAlternating (large-star/small-star) agrees with the " +
       "label propagation on random graphs") {
    val rng = new Random(31)
    (1 to 3).foreach { round =>
      val nodes = 15 + rng.nextInt(25)
      val edges = (for {
        a <- 0 until nodes
        b <- (a + 1) until nodes
        if rng.nextDouble() < 0.07
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val prop = Components.connected(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        val alt = Components
          .connectedAlternating(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        assert(alt === prop, s"round=$round edges=$edges")
      }
    }
  }

  test("connectedAuto emits the identical labeling on BOTH sides of " +
       "the driver gate (union-find below, star contraction above)") {
    val rng = new Random(47)
    (1 to 3).foreach { round =>
      val nodes = 15 + rng.nextInt(25)
      val edges = (for {
        a <- 0 until nodes
        b <- (a + 1) until nodes
        if rng.nextDouble() < 0.07
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val want = Components.connected(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        // gate wide open -> driver union-find path
        val viaDriver = Components
          .connectedAuto(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        // gate forced shut -> distributed alternating path
        val viaCluster = Components
          .connectedAuto(edges.toDF("a", "b"), "a", "b", driverMaxEdges = 0)
          .as[(Long, Long)].collect().toMap
        assert(viaDriver === want, s"driver path, round=$round")
        assert(viaCluster === want, s"cluster path, round=$round")
      }
    }
  }

  test("connectedAuto gate BOUNDARY: driverMaxEdges = E takes the " +
       "driver path, E - 1 the distributed path, labels identical") {
    // The path-pair test above forces each side with extreme gates;
    // this one pins the exact switch-over: the gate arms on the
    // CANONICAL edge count (post dedup/canonicalize), so a gate equal
    // to that count must take the union-find path (<=) and one less
    // must shuffle — and the two labelings must still be equal row
    // for row. Inputs include a duplicate and a reversed edge so the
    // canonical count (7) differs from the raw count (9).
    val raw = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (1L, 2L),
                  (10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L))
    val canonicalCount = 7L
    val atGate = Components.connectedAuto(raw.toDF("a", "b"), "a", "b",
        driverMaxEdges = canonicalCount)
      .as[(Long, Long)].collect().toMap
    val justOver = Components.connectedAuto(raw.toDF("a", "b"), "a", "b",
        driverMaxEdges = canonicalCount - 1)
      .as[(Long, Long)].collect().toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
                   10L -> 10L, 11L -> 10L, 12L -> 10L,
                   20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L)
    assert(atGate === want)
    assert(justOver === want)
  }

  test("connectedAlternating covers a 120-node chain in O(log) rounds " +
       "(diameter-independent, unlike plain propagation)") {
    val chain = (0L until 120L).map(i => (i, i + 1))
    val got = Components
      .connectedAlternating(chain.toDF("a", "b"), "a", "b", maxRounds = 12)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 121 && got.values.forall(_ == 0L))
  }

  test("convergence probes are folded into the iteration action: " +
       "bounded blocking actions per round") {
    // QueryExecutionListener fires once per blocking Dataset action —
    // the driver-side serialization points that matter on a busy
    // cluster (AQE splits one action into many scheduler jobs, so raw
    // job counts can't pin this).
    val names = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = names.add(funcName)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = names.add(s"FAIL:$funcName")
    }
    def actionsDuring(body: => Unit): Seq[String] = {
      names.clear()
      spark.listenerManager.register(listener)
      try {
        body
        // the listener bus is async; poll until the tally stabilizes
        var last = -1
        while (names.size != last) { last = names.size; Thread.sleep(250) }
        scala.jdk.CollectionConverters.ListHasAsScala(names).asScala.toSeq
      } finally spark.listenerManager.unregister(listener)
    }

    // lazy localCheckpoint and Dataset.rdd (the stats-resetting
    // rebuild inside Materialize) emit (job-free) events at
    // declaration time; the serialization points are the PROBE
    // actions that gate the next round
    def probes(evs: Seq[String]): Seq[String] =
      evs.filterNot(e => e == "localCheckpoint" || e == "rdd")

    // chain of 8: hash-min propagation needs 7 label-travel rounds +
    // 1 no-change round; per round exactly ONE blocking probe (the
    // label-sum head, which also materializes the lazy checkpoint),
    // plus the initial sum. A reintroduced separate per-round probe
    // (the old join+count) doubles the per-round tally and busts the
    // bound.
    val chain8 = (0L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    val aProp = probes(actionsDuring {
      Components.connected(chain8, "a", "b")
    })
    assert(aProp.size <= 1 + 8,
      s"connected ran ${aProp.size} probe actions for 8 rounds: $aProp")

    // alternating star contraction on a 32-chain: O(log n) rounds,
    // ONE fingerprint action per round (count+checksum in a single
    // agg) plus the initial fingerprint; the old count+count+except
    // probe tripled the per-round tally.
    val chain32 = (0L until 32L).map(i => (i, i + 1)).toDF("a", "b")
    val aAlt = probes(actionsDuring {
      Components.connectedAlternating(chain32, "a", "b", maxRounds = 12)
    })
    assert(aAlt.size <= 1 + 12,
      s"connectedAlternating ran ${aAlt.size} probe actions: $aAlt")
  }

  test("a long chain converges (diameter-bound iterations) and a " +
       "too-small maxIters throws instead of returning wrong labels") {
    // min label travels one hop per iteration: 25 < default maxIters
    val chain = (0L until 25L).map(i => (i, i + 1))
    val got = Components.connected(chain.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.size === 26 && got.values.forall(_ == 0L))
    intercept[IllegalStateException] {
      Components.connected(chain.toDF("a", "b"), "a", "b", maxIters = 3)
    }
  }
}
