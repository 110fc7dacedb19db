package graft
import org.apache.spark.sql.SparkSession
object ScratchTime {
  def main(a: Array[String]): Unit = {
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.autoBroadcastJoinThreshold","64m")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = a.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (a.length > 1) a(1).split(",").toSeq
      else Seq("graph_kcore", "dedup_cluster_cc", "graph_label_propagation",
               "graph_bfs_hops", "pagerank_fixed")
    for (n <- names; run <- 1 to 2) {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val t0 = System.nanoTime()
      val c = SparkEntry.queries(n)(s, d).count()
      println(f"SCRATCH $n run$run n=$c t=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    s.stop()
  }
}
