package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for the exact-Jaccard dedup path (dev tool):
  * compares candidate-pair counts and stage times between the
  * hash-ordered and frequency-ordered PPJoin prefix variants.
  */
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
    graft.functions.expressions.ShingleHashes.register(spark)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    val threshold = 0.5
    val base = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id").as("doc"),
        expr("graft_shingle_hashes(text, 3)").as("sh"))
      .withColumn("n", size(col("sh")))
      .persist()
    time("base materialize")(base.count())

    val prefixLen = (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int")
    val hashPrefixes = base.select(col("doc"), col("n"),
      explode(slice(col("sh"), lit(1), prefixLen)).as("s")).persist()
    time("hash prefixes")(hashPrefixes.count())

    val exploded = base.select(col("doc"), col("n"), explode(col("sh")).as("s"))
    val dfreq = exploded.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc")).orderBy(col("df"), col("s"))
    val freqPrefixes = exploded.join(dfreq, "s")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= prefixLen)
      .select(col("doc"), col("n"), col("s")).persist()
    time("freq prefixes")(freqPrefixes.count())

    def cands(p: org.apache.spark.sql.DataFrame) =
      p.as("a").join(p.as("b"),
          col("a.s") === col("b.s") && col("a.doc") < col("b.doc") &&
          col("b.n") * threshold <= col("a.n") &&
          col("a.n") * threshold <= col("b.n"))
        .select(col("a.doc").as("d1"), col("b.doc").as("d2"))
        .distinct()

    val ch = time("hash candidates")(cands(hashPrefixes).count())
    val cf = time("freq candidates")(cands(freqPrefixes).count())
    println(s"[prof] hash-order candidates: $ch, freq-order candidates: $cf")

    // BPE token counting: regex engine vs the native one-pass scan
    graft.functions.expressions.TokenCount.register(spark)
    val docs = Tables.t(spark, sfDir, "documents").persist()
    docs.count()
    val regexCount =
      "size(regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+', 0))"
    (1 to 2).foreach { round =>
      time(s"token count regex  x20 (r$round)")((1 to 20).foreach(_ =>
        docs.select(sum(expr(regexCount))).head()))
      time(s"token count native x20 (r$round)")((1 to 20).foreach(_ =>
        docs.select(sum(expr("graft_token_count(text)"))).head()))
    }
    spark.stop()
  }
}
