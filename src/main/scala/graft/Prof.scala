package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFns._

/** Ad-hoc stage profiler for the dedup path (dev tool). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.expressions.SortedIntersectSize.register(spark)
    graft.functions.expressions.WordShingles.register(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    val docs = Tables.t(spark, sfDir, "documents")
    val threshold = 0.5

    val base = docs
      .select(col("doc_id").as("doc"),
        expr("graft_shingles(text, 3)").as("sh"))
      .withColumn("n", size(col("sh")))
      .persist()
    time("base materialize")(base.count())

    val prefixLen = (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int")
    val ordered = array_sort(transform(col("sh"),
      s => struct(md5(s).as("h"), s.as("s"))))
    val prefixes = base.select(col("doc"), col("n"),
      explode(transform(slice(ordered, lit(1), prefixLen),
        x => x.getField("s"))).as("s")).persist()
    time("prefixes")(prefixes.count())

    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc") &&
        col("b.n") * threshold <= col("a.n") &&
        col("a.n") * threshold <= col("b.n"))
      .select(col("a.doc").as("d1"), col("b.doc").as("d2"))
      .distinct().persist()
    time("candidates")(cand.count())

    val a = base.select(col("doc").as("d1"), col("sh").as("sh1"), col("n").as("n1"))
    val b = base.select(col("doc").as("d2"), col("sh").as("sh2"), col("n").as("n2"))
    val verified = cand.join(a, "d1").join(b, "d2")
      .withColumn("i", expr("graft_sorted_intersect_size(sh1, sh2)"))
      .select(col("d1"), col("d2"),
        (col("i").cast("double") / (col("n1") + col("n2") - col("i"))).as("jac"))
      .where(col("jac") >= threshold)
    time("verify")(verified.count())

    spark.stop()
  }
}
