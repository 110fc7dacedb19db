package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Job-count bound for the distributed hierarchy fixpoints: the
  * convergence probe IS the action that materializes each round's lazy
  * checkpoint, so every iteration costs exactly ONE blocking action —
  * the same invariant ComponentsSpec pins for label propagation.
  */
class HierarchyJobsSpec extends SparkSpec {
  import spark.implicits._

  private def actionsDuring(body: => Unit): Seq[String] = {
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
    names.clear()
    spark.listenerManager.register(listener)
    try {
      body
      var last = -1
      while (names.size != last) { last = names.size; Thread.sleep(250) }
      // lazy localCheckpoint and Dataset.rdd (the stats-resetting
      // rebuild inside Materialize) are job-free declaration events,
      // not blocking actions
      scala.jdk.CollectionConverters.ListHasAsScala(names).asScala.toSeq
        .filterNot(e => e == "localCheckpoint" || e == "rdd")
    } finally spark.listenerManager.unregister(listener)
  }

  test("closure (distributed branch): one blocking action per " +
       "iteration — the count doubles as the checkpoint materializer") {
    // chain of depth 6; driverSideEdgeLimit = 0 forces the
    // distributed loop. 5 growth rounds + 1 no-growth round, plus the
    // up-front base count: <= 8 actions with slack 1.
    val chain = (0 until 6).map(i => (s"n$i", s"n${i + 1}"))
      .toDF("parent", "child")
    val acts = actionsDuring {
      Hierarchy.closure(chain, "parent", "child",
        driverSideEdgeLimit = 0L)
    }
    assert(acts.size <= 8,
      s"closure ran ${acts.size} blocking actions for depth 6: $acts")
  }

  test("closureDoubling: O(log depth) iterations, one action each") {
    // chain of depth 8: reachable length doubles per round, so 3
    // growth rounds + 1 no-growth round + the initial count.
    val chain = (0 until 8).map(i => (s"n$i", s"n${i + 1}"))
      .toDF("parent", "child")
    val acts = actionsDuring {
      Hierarchy.closureDoubling(chain, "parent", "child")
    }
    assert(acts.size <= 6,
      s"closureDoubling ran ${acts.size} blocking actions for depth 8: $acts")
  }
}
