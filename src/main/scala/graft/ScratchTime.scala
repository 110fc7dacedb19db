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
    val pp = Tables.t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val raw = pp.as("a")
      .join(pp.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    val canon = graft.operators.Triangles.orientById(raw)
    val cn = graft.operators.KCore.coreness(canon, 64)
    cn.groupBy("coreness").count().orderBy("coreness").show(70)
    s.stop()
  }
}
