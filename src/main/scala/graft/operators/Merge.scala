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

  /** SCD-2 history merge: applies a full snapshot to a validity-
    * interval history (`keyCol`, `valueCol`, `valid_from`, `valid_to`
    * with NULL = current) as of `asOf`:
    *
    *   - changed value  → current row closed at `asOf` + new current row
    *   - new key        → new current row opening at `asOf`
    *   - unchanged      → carried through untouched
    *   - key absent from the snapshot → carried through (no implicit
    *     deletes; close them upstream if the snapshot is authoritative)
    *
    * `snapshot` must be unique per key (same contract as [[upsert]]):
    * duplicate snapshot keys would fan out the current row into
    * overlapping validity intervals. Dedupe upstream with a
    * deterministic winner, e.g. `max(struct(version, payload))`.
    *
    * One full-outer shuffle of the CURRENT rows against the snapshot;
    * closed history is a pure pass-through union that never shuffles —
    * at 100 TB the (large, append-only) closed partition is untouched,
    * which is the property that makes SCD-2 tractable at scale.
    * Null-safe change detection (`<=>`), so NULL→value and value→NULL
    * both version correctly.
    */
  def scd2(history: DataFrame, snapshot: DataFrame, keyCol: String,
           valueCol: String, asOf: java.sql.Date): DataFrame = {
    val closed = history.where(col("valid_to").isNotNull)
    val open = history.where(col("valid_to").isNull).as("h")
    val snap = snapshot.select(col(keyCol), col(valueCol))
      .withColumn("__snap", lit(1)).as("u")
    val j = open.join(snap, col(s"h.$keyCol") === col(s"u.$keyCol"),
      "full_outer")
    val changed = col("u.__snap").isNotNull &&
      !(col(s"u.$valueCol") <=> col(s"h.$valueCol"))
    // existing current rows: closed at asOf when the value changed
    val carried = j.where(col(s"h.$keyCol").isNotNull)
      .select(col(s"h.$keyCol").as(keyCol), col(s"h.$valueCol").as(valueCol),
        col("h.valid_from"),
        when(changed, lit(asOf)).otherwise(col("h.valid_to")).as("valid_to"))
    // new versions: changed values and brand-new keys open at asOf
    val opened = j.where(col("u.__snap").isNotNull &&
        (col(s"h.$keyCol").isNull || changed))
      .select(col(s"u.$keyCol").as(keyCol), col(s"u.$valueCol").as(valueCol),
        lit(asOf).as("valid_from"), lit(null).cast("date").as("valid_to"))
    closed.unionByName(carried).unionByName(opened)
  }

  /** `base` upserted with `updates`; both must expose `keyCol` and the
    * same payload columns. `updates` must be unique per key (duplicate
    * update keys would fan out the full outer join — dedupe upstream
    * with a deterministic winner, e.g. max(struct(version, payload))).
    */
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
            .otherwise(col(s"b.$c")).as(c)).toIndexedSeq: _*)
  }
}
