package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
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
    val d = "/root/repo/testdata-sf1"
    def timed(tag: String)(f: => Long): Unit = {
      val t0=System.nanoTime(); val n=f
      println(f"SCRATCH $tag n=$n t=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    val docs = Tables.t(s, d, "documents")
    timed("pairs")(graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 0.5).count())
    timed("pairs2")(graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 0.5).count())
    // fresh frame per run: reusing one localCheckpointed frame across
    // unpersist cycles breaks its truncated lineage
    def pairs = graft.operators.Dedup.jaccardPairs(docs, "doc_id", "text", 0.5)
    timed("cc_hashmin")(graft.operators.Components.connected(pairs, "d1", "d2").count())
    timed("cc_alt")(graft.operators.Components.connectedAlternating(pairs, "d1", "d2").count())
    timed("cc_auto")(graft.operators.Components.connectedAuto(pairs, "d1", "d2").count())
    s.stop()
  }
}
