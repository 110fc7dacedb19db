package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.{GdpPipeline => P}

/** R-semantics edge cases from SURVEY §7.4, as unit fixtures
  * (FIXTURES.md §A "parity edge cases").
  */
class GdpPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("computeMissingValues: dissolved-economy merge windows " +
       "(Czechoslovakia only 1991-1992) and remap chaining") {
    val df = Seq(
      ("203", 1991, "V", 10.0), ("703", 1991, "V", 5.0), // merged -> 200
      ("203", 1993, "V", 7.0),                           // outside window
      ("276", 1980, "V", 3.0),                           // FRG -> 280
      ("999", 2000, "V", 1.0)                            // untouched
    ).toDF("Economy_Code", "Year", "Variable", "Value")
    val got = P.computeMissingValues(df)
      .as[(String, Int, String, Double)].collect().toSet
    assert(got === Set(
      ("200", 1991, "V", 15.0),
      ("203", 1993, "V", 7.0),
      ("280", 1980, "V", 3.0),
      ("999", 2000, "V", 1.0)))
  }

  test("computeMissingValues: all-null group sums to 0 like R's " +
       "sum(na.rm=TRUE), not null") {
    val df = Seq(
      ("100", 2000, "V", Option.empty[Double]),
      ("100", 2000, "V", Option.empty[Double])
    ).toDF("Economy_Code", "Year", "Variable", "Value")
    val got = P.computeMissingValues(df).select("Value").as[Double].collect()
    assert(got.toSeq === Seq(0.0))
  }

  test("roundValues rounds half-to-even like R round()") {
    val df = Seq(0.5, 1.5, 2.5, -0.5, 2.4).toDF("Value")
    val got = P.roundValues(df).as[Double].collect().toSeq
    assert(got === Seq(0.0, 2.0, 2.0, -0.0, 2.0))
  }

  test("expandHierarchy flattens groups to leaves, keeps non-target " +
       "leaves only under 'Other territories'") {
    val edges = Seq(
      // world -> europe (group), europe -> {de (target), xx (non-target)}
      ("W", "World", 1940, 2102, "False", "E", "Europe", 1940, 2102, "False"),
      ("E", "Europe", 1940, 2102, "False", "DE", "Germany", 1940, 2102, "True"),
      ("E", "Europe", 1940, 2102, "False", "XX", "Nowhere", 1940, 2102, "False"),
      // other territories keeps its non-target child
      ("O", "Other territories", 1940, 2102, "False", "YY", "Tiny", 1940, 2102, "False")
    ).toDF("Parent_Code", "Parent_Label", "Parent_ValidFrom", "Parent_ValidTo",
      "Parent_IsTarget", "Child_Code", "Child_Label", "Child_ValidFrom",
      "Child_ValidTo", "Child_IsTarget")
    val got = P.expandHierarchy(edges)
      .select("Parent_Code", "Child_Code").as[(String, String)].collect().toSet
    // E's children flatten into W. Keep-rule subtlety (matches R): a
    // just-expanded row is kept by the `matched` disjunct even when the
    // child is non-target — (W, XX) survives because the fixpoint
    // terminates in the same round; (E, XX) is dropped as an unmatched
    // non-target; YY survives only via "Other territories".
    assert(got === Set(
      ("W", "DE"), ("W", "XX"), ("E", "DE"), ("O", "YY")))
  }

  test("computeAggregateValues: groups sum only surviving leaves and " +
       "World gets code 0000") {
    val edges = Seq(
      ("0", "World", 1940, 2102, "False", "DE", "Germany", 1940, 2102, "True"),
      ("0", "World", 1940, 2102, "False", "FR", "France", 1940, 2102, "True")
    ).toDF("Parent_Code", "Parent_Label", "Parent_ValidFrom", "Parent_ValidTo",
      "Parent_IsTarget", "Child_Code", "Child_Label", "Child_ValidFrom",
      "Child_ValidTo", "Child_IsTarget")
    val facts = Seq(
      ("DE", "Germany", 2000, "V", 10.0),
      ("FR", "France", 2000, "V", 20.0)
    ).toDF("Economy_Code", "Economy_Label", "Year", "Variable", "Value")
    val got = P.computeAggregateValues(facts, edges).collect().toSeq
    assert(got.length === 3)
    val world = got.filter(_.getString(1) == "World")
    assert(world === Seq(Row("0000", "World", 2000, "V", 30.0)))
  }

  test("lastYear is a config seam, not a constant: estimation and the " +
       "internal-estimate marking follow a non-2024 endpoint") {
    // synthesized release with endpoint 2030: constant-price 2029
    // facts get grown into 2030, deflated into current prices, and
    // the 2030 rows (and only those) carry the internal DataSource
    val facts = Seq(
      ("004", 2029, "GDP_at_constant_prices_2015", 100.0),
      ("004", 2028, "GDP_at_constant_prices_2015", 90.0)
    ).toDF("Economy_Code", "Year", "Variable", "Value")
    val growth = Seq(("004", 10.0)).toDF("UNCTcc", "Growth")
    val deflators = Seq(("004", 2030, 120.0))
      .toDF("Country_Code", "Year", "Deflator_USD")

    val est = P.estimateLastYear(facts, growth, deflators, lastYear = 2030)
    val y2030 = est.filter($"Year" === 2030)
      .select("Variable", "Value").as[(String, Double)].collect().toMap
    assert(y2030.keySet === Set("GDP_at_constant_prices_2015",
      "GDP_at_current_prices"))
    // 100 × (1 + 10/100) = 110; 110 × 120/100 = 132 (IEEE tolerance)
    assert(math.abs(y2030("GDP_at_constant_prices_2015") - 110.0) < 1e-9)
    assert(math.abs(y2030("GDP_at_current_prices") - 132.0) < 1e-9)
    // nothing lands on the old hard-coded endpoint
    assert(est.filter($"Year" === 2024).count() === 0)

    val usis = P.usisProjection(
      est.withColumn("Economy_Label", lit("Afghanistan"))
        .withColumn("CommentEN", lit(null: String))
        .withColumn("CommentFR", lit(null: String)),
      lastYear = 2030, refDate = "1-Jan-31")
      .select("Year", "DataSource").as[(Int, String)].collect().toSet
    assert(usis.filter(_._1 == 2030).forall(_._2 == "0001"))
    assert(usis.filter(_._1 != 2030).forall(_._2 == "4809"))
  }

  test("usisProjection maps measures/sources and keeps leaf codes only") {
    val df = Seq(
      ("158", "Taiwan", 2023, "GDP_at_current_prices", 5.0, null, null),
      ("004", "Afghanistan", 2024, "GDP_at_constant_prices_2015", 7.0, null, null),
      ("0000", "World", 2023, "GDP_at_current_prices", 9.0, null, null)
    ).toDF("Economy_Code", "Economy_Label", "Year", "Variable", "Value",
      "CommentEN", "CommentFR")
    val got = P.usisProjection(df, 2024, "1-Jan-26")
      .select("Country", "Measure", "DataSource", "RefDate")
      .as[(String, String, String, String)].collect().toSet
    assert(got === Set(
      ("158", "0100", "3001", "1-Jan-26"),
      ("004", "0940", "0001", "1-Jan-26")))
  }
}
