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
        val got = Hierarchy.closure(edges.toDF("parent", "child"),
            "parent", "child")
          .as[(String, String)].collect().toSet
        assert(got === naive, s"edges=$edges")
      }
    }
  }
}
