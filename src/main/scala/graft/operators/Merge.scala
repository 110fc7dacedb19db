package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD-1 upsert (MERGE WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED
  * THEN INSERT) as a pure relational transform — the generalized form
  * of the reference's old-release × new-release reconciliation
  * (`gdp_compare_with_old_data.R:38-44` full-join + coalesce pattern).
  *
  * One full-outer shuffle join on the key; every payload column is
  * `coalesce(updates, base)`. rows only in `updates` are inserts, rows
  * only in `base` carry through, matches take the update side. At
  * 100 TB both sides shuffle on the key ONCE — or zero times if both
  * are bucketed on it (sources/Layout.writeBucketed); there is no
  * per-row driver logic to serialize.
  */
object Merge {

  /** `base` upserted with `updates`; both must expose `keyCol` and the
    * same payload columns. */
  def upsert(base: DataFrame, updates: DataFrame, keyCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol)
    require(updates.columns.toSet == base.columns.toSet,
      s"upsert sides must share a schema; base=${base.columns.mkString(",")} " +
        s"updates=${updates.columns.mkString(",")}")
    // Row-level update semantics: a matched update row wins WHOLESALE,
    // including any NULL payload values it carries — the presence
    // marker (never-null on the update side) decides, not per-column
    // coalesce, which would silently stitch columns from both rows.
    val b = base.as("b")
    val u = updates.withColumn("__upd", lit(1)).as("u")
    b.join(u, col(s"b.$keyCol") === col(s"u.$keyCol"), "full_outer")
      .select(
        coalesce(col(s"u.$keyCol"), col(s"b.$keyCol")).as(keyCol) +:
          payload.map(c => when(col("u.__upd").isNotNull, col(s"u.$c"))
            .otherwise(col(s"b.$c")).as(c)): _*)
  }
}
