package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
    val d = a.headOption.getOrElse("/root/testdata/sf0.1")
    val pp = Tables.t(s, d, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val raw = pp.as("a")
      .join(pp.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    def canon = graft.operators.Triangles.orientById(raw)

    def lpaWindow(canonEdges: DataFrame, iters: Int): DataFrame = {
      val nbrs = canonEdges
        .select(col("u").as("node"), col("v").as("nbr"))
        .unionByName(canonEdges.select(col("v").as("node"), col("u").as("nbr")))
        .localCheckpoint()
      var labels = nbrs.select(col("node")).distinct()
        .select(col("node"), col("node").as("label")).localCheckpoint()
      val w = Window.partitionBy("node").orderBy(col("cnt").desc, col("label").asc)
      for (_ <- 1 to iters) {
        labels = graft.operators.Materialize(nbrs
          .join(labels.withColumnRenamed("node", "nbr"), "nbr")
          .groupBy(col("node"), col("label"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("node"), col("label")))
      }
      labels
    }

    for (run <- 1 to 3) {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      var t0 = System.nanoTime()
      val c1 = graft.operators.LabelPropagation.run(canon, 4).count()
      println(f"SCRATCH lpa_agg run$run n=$c1 t=${(System.nanoTime()-t0)/1e9}%.2fs")
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      t0 = System.nanoTime()
      val c2 = lpaWindow(canon, 4).count()
      println(f"SCRATCH lpa_win run$run n=$c2 t=${(System.nanoTime()-t0)/1e9}%.2fs")
    }
    s.stop()
  }
}
