package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** AQE hardening (SURVEY §6): the engine's answers must not depend on
  * adaptive execution being on or off, the plan pins must be evaluated
  * under AQE (Spark 4 default — what a production cluster runs), and
  * the explicit skew mitigation must agree with both the unsalted join
  * and AQE's own skew-join splitting.
  */
class AqeSpec extends SparkSpec {
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("the spec session runs under AQE (Spark default), so every plan " +
       "pin in PlanShapeSpec is an adaptive-plan pin") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    val p = SparkEntry.queries("bloom_semi_join")(spark, sf("sf0.001"))
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("AdaptiveSparkPlan"),
      s"expected an adaptive plan root:\n${p.take(400)}")
  }

  test("shuffle/join-heavy queries return identical rows with AQE on " +
       "and off") {
    val names = Seq("q5_region_revenue", "hierarchy_rollup",
      "dedup_minhash_lsh", "window_anchor", "pack_chunks",
      "grouping_rollup", "events_sessionize", "ann_ivfpq_adc")
    names.foreach { name =>
      def rows(): Seq[String] = {
        spark.catalog.clearCache()
        SparkEntry.queries(name)(spark, sf("sf0.001"))
          .collect().map(_.toString).sorted.toSeq
      }
      var on: Seq[String] = null
      var off: Seq[String] = null
      withConf("spark.sql.adaptive.enabled" -> "true") { on = rows() }
      withConf("spark.sql.adaptive.enabled" -> "false") { off = rows() }
      assert(on === off, s"$name differs between AQE on/off")
      assert(on.nonEmpty, s"$name returned no rows")
    }
  }

  test("saltedJoin equals the plain join, spreads the hot key across " +
       "the full salt range, and agrees with AQE skew-join splitting") {
    // skewed fact: 50k rows, 90% on key 0, unique payloads so the
    // full-row salt actually disperses the hot key
    val fact = spark.range(0, 50000).select(
      when(col("id") % 10 < 9, 0L).otherwise(col("id") % 100).as("k"),
      col("id").as("payload"))
    val dim = spark.range(0, 100).select(
      col("id").as("k"), concat(lit("dim_"), col("id")).as("label"))

    def checksum(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum(xxhash64(col("k"), col("payload"), col("label"))
          .cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }

    // force the shuffle-join regime saltedJoin exists for (no
    // broadcast shortcut), with and without AQE skew handling
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true") {
      val plain = checksum(fact.join(dim, Seq("k")))
      val salted = checksum(Skew.saltedJoin(fact, dim, Seq("k")))
      assert(salted === plain, "salted join changed the result")

      withConf("spark.sql.adaptive.enabled" -> "false") {
        val noAqe = checksum(Skew.saltedJoin(fact, dim, Seq("k")))
        assert(noAqe === plain, "salted join depends on AQE")
      }
    }

    // the deterministic salt must spread the dominant key over every
    // salt bucket — otherwise the hot partition just moved
    val salts = fact.where(col("k") === 0)
      .select(pmod(hash(col("k"), col("payload")), lit(16)).as("s"))
      .distinct().count()
    assert(salts === 16L, s"hot key only reached $salts/16 salt buckets")
  }
}
