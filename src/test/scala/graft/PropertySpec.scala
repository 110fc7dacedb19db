package graft

import scala.util.Random

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.Fns
import graft.operators.Hierarchy

/** Property tests (SURVEY §5d): the year-run compressor against a
  * reference decoder, and the distributed transitive closure against a
  * naive in-memory closure over random DAGs.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def scCheck(prop: Prop, tests: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests), prop)
    assert(res.passed, res.status.toString)
  }

  test("yearRuns: decoding the run string recovers exactly the input set") {
    val gen = Gen.listOf(Gen.chooseNum(1970, 2030))
    scCheck(Prop.forAll(gen) { years =>
      val s = Fns.yearRunsStr(years)
      val decoded: Set[Int] =
        if (s.isEmpty) Set.empty
        else s.split(", ").flatMap { run =>
          run.split("-") match {
            case Array(a) => Seq(a.toInt)
            case Array(a, b) => a.toInt to b.toInt
          }
        }.toSet
      decoded == years.toSet &&
        // runs are maximal: adjacent runs never touch
        (s.isEmpty || {
          val bounds = s.split(", ").map { r =>
            val p = r.split("-"); (p.head.toInt, p.last.toInt)
          }
          bounds.zip(bounds.tail).forall { case ((_, hi), (lo, _)) =>
            lo > hi + 1
          }
        })
    }, tests = 200)
  }

  test("jaccardPairs (prefix-filtered) equals the naive all-pairs " +
       "computation on random corpora") {
    val rng = new Random(7)
    val vocab = Vector("spark", "row", "data", "join", "scan", "key",
      "sort", "merge", "hash", "batch")
    def doc(): String =
      (0 until (3 + rng.nextInt(12))).map(_ => vocab(rng.nextInt(vocab.size)))
        .mkString(" ")
    (1 to 3).foreach { _ =>
      val docs = (0 until 40).map(i => (i.toLong, doc()))
      def shingleSet(t: String): Set[String] = {
        val w = t.split(" ")
        (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
      }
      val naive = (for {
        (i, ti) <- docs; (j, tj) <- docs if i < j
        a = shingleSet(ti); b = shingleSet(tj)
        inter = (a & b).size
        jac = inter.toDouble / (a.size + b.size - inter)
        if jac >= 0.5
      } yield (i, j)).toSet
      val got = graft.operators.Dedup
        .jaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text", 0.5)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(got === naive)
      // the frequency-ordered prefix variant must produce the SAME
      // exact result set (PPJoin is order-invariant).
      val gotFreq = graft.operators.Dedup
        .jaccardPairsFreq(docs.toDF("doc_id", "text"), "doc_id", "text", 0.5)
        .select("d1", "d2").as[(Long, Long)].collect().toSet
      assert(gotFreq === naive)
    }
  }

  test("jaccardPairs at threshold 0.25 keeps pairs whose Jaccard is " +
       "EXACTLY the threshold (the float positional-bound trap)") {
    // t = 0.25 makes t/(1+t) round UP in IEEE double (0.2000…0111), so
    // before the epsilon guard ceil(t/(1+t)·(n1+n2)) could come out
    // one too high and the positional filter dropped a genuinely
    // qualifying boundary pair (n1=2, n2=3, overlap 1 → J = 1/4
    // exactly). Construct many such boundary pairs across word
    // permutations so the shared trigram lands at every prefix
    // position on both sides of the global hash order.
    val words = Vector("alpha", "bravo", "carol", "delta", "echo",
      "fox", "golf", "hotel", "india", "julie", "kilo", "lima")
    val cases = for {
      a <- words.indices; b = (a + 1) % words.size; c = (a + 2) % words.size
      d = (a + 3) % words.size; e = (a + 4) % words.size; f = (a + 5) % words.size
    } yield (
      // doc1: 4 words → 2 trigrams; doc2: 5 words → 3 trigrams;
      // shared trigram (b c d) → J = 1 / (2 + 3 − 1) = 0.25 exactly
      s"${words(a)} ${words(b)} ${words(c)} ${words(d)}",
      s"${words(b)} ${words(c)} ${words(d)} ${words(e)} ${words(f)}")
    cases.zipWithIndex.foreach { case ((t1, t2), i) =>
      val docs = Seq((0L, t1), (1L, t2)).toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .jaccardPairs(docs, "doc_id", "text", 0.25)
        .select("d1", "d2", "jac").as[(Long, Long, Double)].collect()
      assert(got.toSeq === Seq((0L, 1L, 0.25)),
        s"case $i ($t1 | $t2): expected the exact-threshold pair, got " +
          got.mkString(","))
      val gotFreq = graft.operators.Dedup
        .jaccardPairsFreq(docs, "doc_id", "text", 0.25)
        .select("d1", "d2", "jac").as[(Long, Long, Double)].collect()
      assert(gotFreq.toSeq === Seq((0L, 1L, 0.25)), s"freq case $i")
    }
  }

  test("simhash 4x15-bit chunk banding never misses a pair at " +
       "hamming <= 3 (pigeonhole)") {
    val rng = new Random(11)
    (1 to 2000).foreach { _ =>
      val a = rng.nextLong() & ((1L << 60) - 1)
      // flip up to 3 random bits
      val flips = (0 until rng.nextInt(4)).map(_ => rng.nextInt(60))
      val b = flips.foldLeft(a)((acc, bit) => acc ^ (1L << bit))
      val shareChunk = (0 until 4).exists { c =>
        ((a >> (15 * c)) & 0x7fff) == ((b >> (15 * c)) & 0x7fff)
      }
      assert(shareChunk, s"a=$a b=$b flips=$flips")
    }
  }

  test("Hierarchy.closure equals the naive transitive closure on " +
       "random DAGs") {
    val rng = new Random(42)
    (1 to 5).foreach { _ =>
      val nodes = 2 + rng.nextInt(9)
      // edges only from lower to higher id => acyclic
      val edges = (for {
        p <- 0 until nodes
        c <- (p + 1) until nodes
        if rng.nextDouble() < 0.35
      } yield (s"n$p", s"n$c")).distinct
      if (edges.nonEmpty) {
        val naive = {
          val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
          def reach(n: String): Set[String] = {
            val direct = adj.getOrElse(n, Seq.empty).toSet
            direct ++ direct.flatMap(reach)
          }
          (for {
            p <- edges.map(_._1).distinct
            d <- reach(p)
          } yield (p, d)).toSet
        }
        // both strategies: driver-side (small edge lists) and the
        // distributed fixpoint (forced via limit 0)
        val gotMem = Hierarchy.closure(edges.toDF("parent", "child"),
            "parent", "child")
          .as[(String, String)].collect().toSet
        assert(gotMem === naive, s"edges=$edges (in-memory)")
        val gotDist = Hierarchy.closure(edges.toDF("parent", "child"),
            "parent", "child", driverSideEdgeLimit = 0L)
          .as[(String, String)].collect().toSet
        assert(gotDist === naive, s"edges=$edges (distributed)")
        val gotDbl = Hierarchy.closureDoubling(edges.toDF("parent", "child"),
            "parent", "child")
          .as[(String, String)].collect().toSet
        assert(gotDbl === naive, s"edges=$edges (doubling)")
      }
    }
  }

  test("Hierarchy.closureDoubling covers a depth-40 chain in few " +
       "iterations (log2 depth, not depth)") {
    val chain = (0 until 40).map(i => (s"n$i", s"n${i + 1}"))
    val got = Hierarchy.closureDoubling(chain.toDF("parent", "child"),
        "parent", "child", maxIters = 8) // 2^8 = 256 >> 40; depth-walk would need 40
      .as[(String, String)].collect().toSet
    // closure of a chain: all (i, j) with i < j — 41*40/2 pairs
    assert(got.size === 41 * 40 / 2)
  }

  test("Hierarchy.closure throws (not silent truncation) when maxDepth " +
       "is smaller than the hierarchy depth — both strategies") {
    // chain n0 -> n1 -> ... -> n6: diameter 6, so maxDepth=3 cannot
    // reach the fixpoint and must fail loudly.
    val chain = (0 until 6).map(i => (s"n$i", s"n${i + 1}"))
    assertThrows[IllegalStateException] {
      Hierarchy.closure(chain.toDF("parent", "child"), "parent", "child",
        maxDepth = 3).count()
    }
    assertThrows[IllegalStateException] {
      Hierarchy.closure(chain.toDF("parent", "child"), "parent", "child",
        maxDepth = 3, driverSideEdgeLimit = 0L).count()
    }
  }

  test("Components.connected equals naive union-find on random graphs") {
    val rng = new Random(11)
    (1 to 5).foreach { _ =>
      val nodes = 2 + rng.nextInt(14)
      val edges = (for {
        a <- 0 until nodes
        b <- (a + 1) until nodes
        if rng.nextDouble() < 0.18
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        // naive union-find reference
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElse(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val touched = edges.flatMap(e => Seq(e._1, e._2)).distinct
        // canonical id = min node of the component
        val naive = touched.groupBy(find).flatMap { case (_, ns) =>
          val m = ns.min; ns.map(_ -> m)
        }.toMap
        val got = graft.operators.Components
          .connected(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        assert(got === naive, s"edges=$edges")
      }
    }
  }
}
