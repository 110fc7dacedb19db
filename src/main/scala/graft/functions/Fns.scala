package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar/column function surface (SURVEY.md §2.9): the reference's
  * tidyverse scalar vocabulary re-expressed as codegen-friendly Spark
  * `Column` combinators. Everything here is a pure expression — no
  * driver-side evaluation — so Catalyst can push, prune and fold as
  * usual.
  *
  * Numeric-parity notes (SURVEY §7.4):
  *   - money sums go through exact DECIMAL so results are independent
  *     of partition/merge order at any scale (a straight double sum is
  *     nondeterministic across cluster layouts);
  *   - R `round()` is half-even → use Spark `bround`, never `round`;
  *   - R `sum(na.rm=TRUE)` over an all-NA group is 0, not NULL →
  *     wrap with `sumOrZero`.
  */
object Fns {

  /** Exact currency type: values < 10^10 with 2 decimals (reference
    * values are USD; testdata prices are 2-decimal doubles).
    */
  val Money: DecimalType = DecimalType(12, 2)
  /** Rates/fractions like discounts and tax: 0.00–9.99. */
  val Rate: DecimalType = DecimalType(4, 2)

  def money(c: Column): Column = c.cast(Money)
  def rate(c: Column): Column = c.cast(Rate)
  def dbl(c: Column): Column = c.cast(DoubleType)

  /** Backtick-quote an identifier for interpolation into `expr()` /
    * `col()` strings: a column name containing a dot, space, or
    * backtick would otherwise misparse as a nested-field path or
    * break the expression. Shared by every operator that builds SQL
    * fragments from caller-supplied column names.
    */
  def quoted(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Order-insensitive exact sum of a 2-decimal double column,
    * returned as double. At 100 TB the aggregation tree's merge order
    * is arbitrary; decimal accumulation keeps the result stable.
    */
  def moneySum(c: Column): Column = dbl(sum(money(c)))

  /** dplyr `sum(x, na.rm = TRUE)`: all-null group yields 0, not null
    * (`gpd_etl_pipeline.R:217`).
    */
  def sumOrZero(c: Column): Column = coalesce(sum(c), lit(0.0))

  /** `str_pad(x, n, "left", "0")` — zero-padded economy codes
    * (`gpd_etl_pipeline.R:80`).
    */
  def padCode(c: Column, len: Int = 3): Column = lpad(c, len, "0")

  /** dplyr `near(a, b, tol)` (`04-discrepancies-before-last-year.Rmd:97`). */
  def near(a: Column, b: Column, tol: Double): Column = abs(a - b) < lit(tol)

  /** dplyr `recode(col, from -> to, ...)`: unmatched values pass through
    * (`gpd_etl_pipeline.R:285-292`). Compiles to a chained CASE WHEN —
    * stays inside whole-stage codegen (a join against a tiny map table
    * would shuffle nothing either, but CASE folds constants).
    */
  def recode(c: Column, mapping: Map[String, String]): Column =
    mapping.foldLeft(c) { case (acc, (from, to)) =>
      when(c === lit(from), lit(to)).otherwise(acc)
    }

  /** R base `round()` = half-even. Alias to make intent explicit at
    * call sites (`gpd_etl_pipeline.R:321`, SURVEY §2.9).
    */
  def roundHalfEven(c: Column, scale: Int = 0): Column = bround(c, scale)

  /** `"29-Aug-25"`-style RefDate stamp (`gpd_etl_pipeline.R:550-554`).
    * Month abbreviations must be US-locale regardless of JVM default.
    */
  def refDate(c: Column): Column = date_format(c, "d-MMM-yy")

  /** Year-run compression (`04-discrepancies-before-last-year.Rmd:61-83`):
    * sorted distinct years -> "1999-2002, 2005-2006, 2010".
    * A scalar UDF over `sort_array(collect_set(year))` — groups are
    * small (≤ #years per entity) so the collected array is bounded;
    * the heavy lifting (grouping) stays distributed.
    */
  private[graft] def yearRunsStr(years: Seq[Int]): String = {
    val ys = if (years == null) Seq.empty[Int] else years.distinct.sorted
    if (ys.isEmpty) ""
    else {
      val sb = new StringBuilder
      var start = ys.head
      var prev = ys.head
      def emit(): Unit = {
        if (sb.nonEmpty) sb.append(", ")
        sb.append(if (start == prev) start.toString else s"$start-$prev")
      }
      ys.tail.foreach { y =>
        if (y == prev + 1) prev = y
        else { emit(); start = y; prev = y }
      }
      emit()
      sb.toString
    }
  }

  val yearRuns: UserDefinedFunction = udf(yearRunsStr _)

  /** R `format(x, digits = 3, scientific = TRUE)` ≈ `%.2E`
    * (`05-discrepancies-last-year.Rmd:22-25`).
    *
    * NOT `String.format("%.2E")`: Java's Formatter rounds decimal ties
    * HALF_UP while C printf (R, DuckDB, glibc) rounds the exact binary
    * value HALF_EVEN — 6765.0 formats as 6.77E+03 in Java but
    * 6.76E+03 everywhere else. Rounding the exact BigDecimal expansion
    * with HALF_EVEN reproduces printf.
    */
  // shared per-call state hoisted out of the row loop (r20): the
  // MathContext is immutable, and the old f-interpolator built a
  // locale-resolving java.util.Formatter PER ROW for a two-digit
  // zero-pad — a corpus-sized allocation stream in a scan-speed
  // projection. Output bytes are identical (FnsSpec).
  private val sciMc =
    new java.math.MathContext(3, java.math.RoundingMode.HALF_EVEN)

  private[graft] def sciFormatStr(d: Double): String = {
    if (d == 0.0) return "0.00E+00"
    if (d.isNaN || d.isInfinite) return d.toString
    val exact = new java.math.BigDecimal(math.abs(d))
    val rounded = exact.round(sciMc)
    val exp = rounded.precision - rounded.scale - 1
    val mantissa = rounded.movePointLeft(exp).setScale(2)
    val ae = math.abs(exp)
    val sb = new java.lang.StringBuilder(12)
    if (d < 0) sb.append('-')
    sb.append(mantissa.toPlainString).append('E')
      .append(if (exp < 0) '-' else '+')
    if (ae < 10) sb.append('0')
    sb.append(ae)
    sb.toString
  }

  val sciFormat: UserDefinedFunction = udf { d: java.lang.Double =>
    if (d == null) null else sciFormatStr(d)
  }
}
