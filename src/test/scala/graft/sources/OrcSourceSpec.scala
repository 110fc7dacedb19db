package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ORC source/sink (S16): the second columnar format a migrating
  * warehouse user brings. Same contract as the parquet path: exact
  * roundtrip, predicate pushdown to the scan, and column pruning —
  * verified from the formatted plan, not assumed.
  */
class OrcSourceSpec extends SparkSpec {
  import spark.implicits._

  test("ORC roundtrips exactly and pushes filters + pruned columns " +
       "to the scan") {
    val dir = Files.createTempDirectory("orc_src").toString + "/t"
    val rows = (1L to 1000L).map(i =>
      (i, s"name_$i", i * 1.5, if (i % 3 == 0) "A" else "B"))
    rows.toDF("id", "name", "score", "tag")
      .repartition(4)
      .write.orc(dir)

    val read = spark.read.orc(dir)
    // exact roundtrip
    assert(read.count() === 1000)
    assert(read.orderBy("id").as[(Long, String, Double, String)]
      .collect().toSeq === rows)

    // pushdown + pruning: only (id, score) reach the scan, and the
    // id predicate lands in PushedFilters
    val q = read.where(col("id") > 900).select(col("id"), col("score"))
    val plan = q.queryExecution.explainString(FormattedMode)
    assert(plan.contains("PushedFilters") &&
           plan.replaceAll("\\s", "").contains("GreaterThan(id,900)"),
      s"expected the id filter pushed to the ORC scan:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("name_"),
      s"unexpected plan:\n$plan")
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("id") && readSchema.contains("score") &&
           !readSchema.contains("name") && !readSchema.contains("tag"),
      s"expected 2-column pruned ReadSchema, got: $readSchema")
    assert(q.as[(Long, Double)].collect().toSet ===
      (901L to 1000L).map(i => (i, i * 1.5)).toSet)
  }
}
