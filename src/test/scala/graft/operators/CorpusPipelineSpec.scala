package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curate: gates, exact dedup and near-dup removal compose with " +
       "full provenance") {
    val long = (1 to 60).map(i => s"w${i % 40}").mkString(" ")
    val longDup = long
    val nearDup = long.split(" ").updated(0, "changed").mkString(" ")
    val docs = Seq(
      (0L, long),                         // kept (canonical)
      (1L, longDup),                      // exact duplicate of 0
      (2L, nearDup),                      // near duplicate of 0
      (3L, "short text only"),            // too_short
      (4L, (1 to 60).map(_ => "der und der").mkString(" "))  // low diversity / language
    ).toDF("doc_id", "text")
    val out = CorpusPipeline.curate(docs, "doc_id", "text",
      CorpusPipeline.Config(minWords = 30, minUniqRatio = 0.2,
        langs = Set("en"), jaccardThreshold = 0.8))
      .select("doc_id", "drop_reason")
      .as[(Long, Option[String])].collect().toMap
    assert(out(0L) === None)
    assert(out(1L) === Some("exact_duplicate"))
    assert(out(2L) === Some("near_duplicate"))
    assert(out(3L) === Some("too_short"))
    assert(out(4L).nonEmpty) // gated for diversity or language
  }

  test("curate on the documents testdata keeps a majority and drops " +
       "the engineered near-dups") {
    val docs = graft.Tables.t(spark, sf("sf0.01"), "documents")
    val out = CorpusPipeline.curate(docs, "doc_id", "text",
      CorpusPipeline.Config(minWords = 10, minUniqRatio = 0.05,
        langs = Set("en", "de", "es", "fr"), jaccardThreshold = 0.8))
      .cache()
    val total = out.count()
    val dropped = out.where(col("drop_reason").isNotNull).count()
    assert(total === 500L)
    assert(dropped > 0L)
    assert(dropped < 250L)
    // every near-dup drop has a surviving smaller partner
    assert(out.where(col("drop_reason") === "near_duplicate").count() > 0)
  }
}
