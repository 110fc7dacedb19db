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
    val d = a.headOption.getOrElse("/root/testdata/sf0.01")
    def timed(tag: String)(f: => Long): Unit = {
      val t0=System.nanoTime(); val n=f
      println(f"SCRATCH $tag n=$n t=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    val pp = Tables.t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val raw = pp.as("a")
      .join(pp.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    def canon = graft.operators.Triangles.orientById(raw)
    timed("trussness")(graft.operators.KTruss.trussness(canon, 6).count())
    s.stop()
  }
}
