package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Fns.{roundHalfEven, sumOrZero}

/** The reference ETL pipeline (`gpd_etl_pipeline.R:560-571`) as pure
  * `DataFrame => DataFrame` stages, Spark-first:
  *
  *   - facts flow lazily through one Catalyst plan; only exports and
  *     the hierarchy fixpoint force actions;
  *   - all dimension joins are broadcast-sized (<= 2.2k rows) — at
  *     100 TB of facts every stage below stays map-side except the two
  *     grouped sums and the final sort;
  *   - R semantics preserved: half-even rounding, `sum(na.rm=TRUE)`
  *     over an all-null group = 0, name-aligned `bind_rows`, padded
  *     string economy codes end-to-end.
  *
  * Fact schema: Economy_Code, Year, Variable, Value (+ Economy_Label,
  * CommentEN/FR added by their stages).
  */
object GdpPipeline {

  /** One dissolved-economy merge rule: rows whose code is in `sources`
    * and whose year satisfies the window get re-coded to `target`
    * (`gpd_etl_pipeline.R:149-215`).
    */
  final case class MergeRule(target: String, sources: Seq[String],
                             fromYear: Int, toYear: Int)

  /** The reference's 10 merge cases; case 4 has two windows so it
    * appears twice (688/499 also merge 1999-2007 together with 412).
    */
  val mergeRules: Seq[MergeRule] = Seq(
    MergeRule("834", Seq("835", "836"), 1970, 2023),
    MergeRule("200", Seq("203", "703"), 1991, 1992),
    MergeRule("736", Seq("728", "729"), 2011, 2011),
    MergeRule("891", Seq("688", "499"), 1992, 1998),
    MergeRule("891", Seq("688", "499", "412"), 1999, 2007),
    MergeRule("890", Seq("688", "499", "191", "807", "705", "070"), 1991, 1991),
    MergeRule("810", Seq("643", "804", "112", "860", "398", "268", "031",
                         "440", "498", "428", "417", "762", "051", "795",
                         "233"), 1991, 1991),
    MergeRule("582", Seq("583", "584", "585"), 1970, 1981),
    MergeRule("280", Seq("276"), 1970, 1989),
    MergeRule("960", Seq("360"), 1970, 2002),
    MergeRule("590", Seq("591"), 1970, 1980))

  /** Stage: dissolved-economy merges + grouped sum
    * (`compute_missing_values`, `gpd_etl_pipeline.R:149-221`).
    * The masked remaps chain in rule order (later rules see earlier
    * rules' output, exactly like the R mutate chain); the final
    * grouped sum uses R's `sum(na.rm=TRUE)` (all-null group -> 0).
    */
  def computeMissingValues(df: DataFrame): DataFrame = {
    val recoded = mergeRules.foldLeft(col("Economy_Code")) { (acc, r) =>
      when(acc.isin(r.sources: _*) &&
             col("Year").between(r.fromYear, r.toYear), lit(r.target))
        .otherwise(acc)
    }
    df.withColumn("Economy_Code", recoded)
      .groupBy(col("Economy_Code"), col("Year"), col("Variable"))
      .agg(sumOrZero(col("Value")).as("Value"))
  }

  /** Stage: last-year estimation (`estimate_last_year`,
    * `gpd_etl_pipeline.R:275-317`). `growthRates` carries
    * (UNCTcc, Growth) — the recoded xlsx last column; `deflators`
    * carries (Country_Code, Year, Deflator_USD).
    */
  def estimateLastYear(df: DataFrame, growthRates: DataFrame,
                       deflators: DataFrame, lastYear: Int): DataFrame = {
    val growth = growthRates.withColumn("UNCTcc",
      graft.functions.Fns.recode(col("UNCTcc"), Map(
        "842" -> "840", "926" -> "826", "757" -> "756",
        "251" -> "250", "579" -> "578")))
    val estimateConstant = df
      .where(col("Year") === lastYear - 1 &&
             col("Variable") === "GDP_at_constant_prices_2015")
      .join(broadcast(growth), col("Economy_Code") === col("UNCTcc"), "left")
      .select(col("Economy_Code"), lit(lastYear).as("Year"), col("Variable"),
        (col("Value") * (lit(1.0) + col("Growth") / 100)).as("Value"))
    val estimateCurrent = estimateConstant
      .join(broadcast(deflators),
        col("Economy_Code") === col("Country_Code") &&
          estimateConstant("Year") === deflators("Year"), "left")
      .select(col("Economy_Code"), estimateConstant("Year"),
        lit("GDP_at_current_prices").as("Variable"),
        (col("Value") * col("Deflator_USD") / 100).as("Value"))
    df.unionByName(estimateConstant).unionByName(estimateCurrent)
  }

  /** Stage: R base `round()` = half-even (`round_values`,
    * `gpd_etl_pipeline.R:319-323`; mode documented in
    * `02-pipeline.Rmd:56-57`).
    */
  def roundValues(df: DataFrame): DataFrame =
    df.withColumn("Value", roundHalfEven(col("Value")))

  /** Stage: validity-window filter (`delete_data_out_of_valid_range`,
    * `gpd_etl_pipeline.R:325-334`). Row-dependent BETWEEN after a
    * broadcast dim join; codes without a target dim row get null
    * bounds and are dropped (R's NA-filter behavior).
    */
  def deleteOutOfValidRange(df: DataFrame, dimCountries: DataFrame): DataFrame = {
    val dims = dimCountries.where(col("IsTarget") === "True")
      .select(col("Code"), col("ValidFrom"), col("ValidTo"))
    df.join(broadcast(dims), col("Economy_Code") === col("Code"), "left")
      .where(col("Year").between(col("ValidFrom"), col("ValidTo")))
      .drop("Code", "ValidFrom", "ValidTo")
  }

  /** Stage: label join (`add_economy_labels`,
    * `gpd_etl_pipeline.R:336-345`).
    */
  def addEconomyLabels(df: DataFrame, labels: DataFrame): DataFrame = {
    val rest = df.columns.filterNot(_ == "Economy_Code").map(col)
    df.join(broadcast(labels), col("Economy_Code") === col("Code"), "left")
      .withColumnRenamed("Label", "Economy_Label")
      .select(col("Economy_Code") +: col("Economy_Label") +: rest.toIndexedSeq: _*)
  }

  private val childCols = Seq("Child_Code", "Child_Label", "Child_ValidFrom",
    "Child_ValidTo", "Child_IsTarget")

  /** Stage: hierarchy flattening fixpoint (`expand_hierarchy`,
    * `gpd_etl_pipeline.R:347-388`). NOT a transitive closure: each
    * iteration REPLACES a matched (parent, group-child) row with
    * (parent, grandchild, ...) rows, so groups flatten to their leaf
    * members; unmatched children survive only if they are targets or
    * sit under "Other territories" (the keep-rule at `:384`).
    *
    * Driver-side fixpoint over distributed joins; `localCheckpoint`
    * truncates lineage per iteration. Because the joined right side is
    * the *current* frame (not the original edges), depth halves each
    * pass — iterations = O(log depth).
    */
  def expandHierarchy(edges: DataFrame): DataFrame = {
    def expandableCount(df: DataFrame): Long =
      df.as("l").join(df.select(col("Parent_Code")).distinct().as("p"),
          col("l.Child_Code") === col("p.Parent_Code"), "left_semi")
        .count()

    var df = edges.localCheckpoint()
    var iters = 0
    while (expandableCount(df) > 0 && iters < 32) {
      val right = df.select(
        col("Parent_Code").as("__pc") +:
          childCols.map(c => col(c).as(s"${c}__new")): _*)
      val joined = df.join(right, col("Child_Code") === col("__pc"), "left")
        .withColumn("__matched", col("Child_Code__new").isNotNull)
      val replaced = childCols.foldLeft(joined) { (acc, c) =>
        acc.withColumn(c, when(col("__matched"), col(s"${c}__new"))
          .otherwise(col(c)))
      }
      // lazy checkpoint: the next expandableCount() materializes it,
      // saving one job per iteration.
      df = replaced
        .where(col("Child_IsTarget") === "True" || col("__matched") ||
               col("Parent_Label") === "Other territories")
        .select(edges.columns.map(col).toIndexedSeq: _*)
        .localCheckpoint(false)
      iters += 1
    }
    df
  }

  /** Stage: group aggregates (`compute_aggregate_values`,
    * `gpd_etl_pipeline.R:390-413`): flatten hierarchy, fan-out join to
    * facts (M:N), grouped null-skipping sum, World -> "0000" fix, then
    * name-aligned union with the facts and the reference's final sort.
    */
  def computeAggregateValues(df: DataFrame, edges: DataFrame): DataFrame = {
    val expanded = expandHierarchy(edges)
    val facts = df.select(col("Economy_Code").as("__code"), col("Year"),
      col("Variable"), col("Value"))
    val groups = expanded
      .join(facts, col("Child_Code") === col("__code"), "left")
      .where(col("Year").isNotNull)
      .groupBy(col("Parent_Code"), col("Parent_Label"), col("Year"),
        col("Variable"))
      .agg(sumOrZero(col("Value")).as("Value"))
      .withColumnRenamed("Parent_Code", "Economy_Code")
      .withColumnRenamed("Parent_Label", "Economy_Label")
      .withColumn("Economy_Code",
        when(col("Economy_Label") === "World", lit("0000"))
          .otherwise(col("Economy_Code")))
    df.unionByName(groups, allowMissingColumns = true)
      .orderBy("Economy_Code", "Year", "Variable")
  }

  /** One provenance-comment rule (`add_comments`,
    * `gpd_etl_pipeline.R:415-518`; cases 8-10 are commented out in the
    * reference and intentionally absent here).
    */
  final case class CommentRule(code: String, fromYear: Option[Int],
                               toYear: Option[Int], en: String, fr: String)

  val commentRules: Seq[CommentRule] = Seq(
    CommentRule("834", None, None,
      "Tanzania Mainland 835 + Zanzibar 836",
      "Tanzanie continentale 835 + Zanzibar 836"),
    CommentRule("200", Some(1991), Some(1992),
      "Czechia 203 + Slovakia 703",
      "Tchéquie 203 + Slovaquie 703"),
    CommentRule("736", Some(2011), Some(2011),
      "South Sudan 728 + Sudan 729",
      "Soudan du Sud 728 + Soudan 729"),
    CommentRule("891", Some(1992), Some(1998),
      "Serbia 688 + Montenegro 499",
      "Serbie 688 + Monténégro 499"),
    CommentRule("891", Some(1999), Some(2007),
      "Serbia 688 + Montenegro 499 + Kosovo 412",
      "Serbie 688 + Monténégro 499 + Kosovo 412"),
    CommentRule("890", Some(1991), Some(1991),
      "Serbia 688 + Montenegro 499 + Croatia 191 + North Macedonia 807 + Slovenia 705 + Bosnia and Herzegovina 070",
      "Serbie 688 + Monténégro 499 + Croatie 191 + Macédoine du Nord 807 + Slovénie 705 + Bosnie-Herzégovine 070"),
    CommentRule("810", Some(1991), Some(1991),
      "Russian Federation 643 + Ukraine 804 + Belarus 112 + Uzbekistan 860 + Kazakhstan 398 + Georgia 268 + Azerbaijan 031 + Lithuania 440 + Moldova 498 + Latvia 428 + Kyrgyzstan 417 + Tajikistan 762 + Armenia 051 + Turkmenistan 795 + Estonia 233",
      "Fédération de Russie 643 + Ukraine 804 + Bélarus 112 + Ouzbékistan 860 + Kazakhstan 398 + Géorgie 268 + Azerbaïdjan 031 + Lituanie 440 + République de Moldova 498 + Lettonie 428 + Kirghistan 417 + Tadjikistan 762 + Arménie 051 + Turkménistan 795 + Estonie 233"),
    CommentRule("582", Some(1970), Some(1981),
      "Micronesia 583 + Marshall Islands 584 + Palau 585",
      "Micronésie (États fédérés de) 583 + Îles Marshall 584 + Palaos 585"))

  /** Stage: masked comment assignment. */
  def addComments(df: DataFrame): DataFrame = {
    def mask(r: CommentRule) = (r.fromYear, r.toYear) match {
      case (Some(f), Some(t)) =>
        col("Economy_Code") === r.code && col("Year").between(f, t)
      case _ => col("Economy_Code") === r.code
    }
    def build(pick: CommentRule => String) =
      commentRules.foldLeft(lit(null).cast("string")) { (acc, r) =>
        when(mask(r), lit(pick(r))).otherwise(acc)
      }
    df.withColumn("CommentEN", build(_.en))
      .withColumn("CommentFR", build(_.fr))
  }

  /** Stage: USIS upload projection (`export_to_usis_csv`,
    * `gpd_etl_pipeline.R:525-558`). `refDate` is injected (the
    * reference stamps `today()`); `lastYear` marks internal estimates.
    */
  def usisProjection(df: DataFrame, lastYear: Int, refDate: String): DataFrame =
    df.where(length(col("Economy_Code")) < 4)
      .select(
        lit(5100).as("Series"),
        col("Economy_Code").as("Country"),
        col("Year"),
        lit("A00").as("Period"),
        lit("00").as("NAComponent"),
        when(col("Variable") === "GDP_at_current_prices", "0100")
          .otherwise("0940").as("Measure"),
        lit("0101").as("Source"),
        when(col("Year") === lastYear, "0001")
          .when(col("Economy_Code") === "158", "3001")
          .otherwise("4809").as("DataSource"),
        col("Value"),
        lit("00").as("DataStatus"),
        lit("0").as("DataConfidentiality"),
        col("CommentEN"),
        col("CommentFR"),
        lit("0").as("CommentConfidentiality"),
        lit(refDate).as("RefDate"))

  /** S8 parity data (`gdp_compare_with_old_data.R:54-90`): the exact
    * per-economy (Year, Variable, Release, Value) series the
    * reference's ggplot/PDF step consumes — rendering itself stays
    * outside the engine (SURVEY §2.1 S8); export this and point any
    * plotter at it.
    */
  def perEconomySeries(cmp: DataFrame): DataFrame =
    cmp.unpivot(
        Array(col("Code"), col("Economy_Label"), col("Year"), col("Variable")),
        Array(col("`Value.old`"), col("`Value.new`")),
        "Release", "Value")
      .withColumn("Release",
        when(col("Release") === "Value.old", "old").otherwise("new"))
      .orderBy("Economy_Label", "Variable", "Release", "Year")

  /** Entry point 2 (`gdp_compare_with_old_data.R:19-51`): old release
    * vs new release, full outer on (Code, Year, Variable) with
    * `.old`/`.new` value suffixes, label taken from the new side.
    */
  def comparison(oldRelease: DataFrame, labels: DataFrame,
                 newDf: DataFrame): DataFrame = {
    val fixedLabels = labels.withColumn("Label",
      when(col("Code") === "498", "Republic of Moldova")
        .when(col("Code") === "410", "Republic of Korea")
        .when(col("Code") === "890", "Yugoslavia, Soc. Fed. Rep. of")
        .otherwise(col("Label")))
    val old = oldRelease
      .join(broadcast(fixedLabels), col("Economy_Label") === col("Label"), "left")
      .select(col("Code"), col("Economy_Label"), col("Year"),
        col("US_at_constant_prices_2015_Value")
          .as("GDP_at_constant_prices_2015"),
        col("US_at_current_prices_Value").as("GDP_at_current_prices"))
      .unpivot(
        Array(col("Code"), col("Economy_Label"), col("Year")),
        Array(col("GDP_at_constant_prices_2015"), col("GDP_at_current_prices")),
        "Variable", "Value")
      .withColumnRenamed("Economy_Label", "Economy_Label.old")
      .withColumnRenamed("Value", "Value.old")
    val niu = newDf
      .withColumnRenamed("Economy_Label", "Economy_Label.new")
      .withColumnRenamed("Value", "Value.new")
    old.join(niu,
        old("Code") === niu("Economy_Code") &&
          old("Year") === niu("Year") &&
          old("Variable") === niu("Variable"), "full_outer")
      .select(
        coalesce(old("Code"), niu("Economy_Code")).as("Code"),
        col("`Economy_Label.new`").as("Economy_Label"),
        coalesce(old("Year"), niu("Year")).as("Year"),
        coalesce(old("Variable"), niu("Variable")).as("Variable"),
        col("`Value.old`").as("Value.old"),
        col("`Value.new`").as("Value.new"),
        col("CommentEN"), col("CommentFR"))
  }
}
