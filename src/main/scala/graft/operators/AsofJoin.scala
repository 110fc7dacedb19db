package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — for every left row, the latest right row with
  * `rightTime <= leftTime` within the same key. Spark has no native
  * operator (SURVEY §7.3 case (a): compose existing ops), so this uses
  * the union-and-carry-forward formulation:
  *
  *   tag left/right -> union -> per-key window ordered by (time, tag)
  *   -> `last(struct(payload), ignoreNulls)` over unbounded-preceding
  *   -> keep left rows.
  *
  * One shuffle on the key, no range explosion, no per-key collect —
  * the classic scalable shape (a sort-merge band join would re-scan
  * right rows per left row). Ties (equal timestamps) match, like
  * DuckDB/QuestDB ASOF semantics — right rows sort before left rows at
  * the same instant.
  *
  * Semantics notes (join-equality parity with DuckDB ASOF):
  *   - All payload columns are carried as ONE struct, so every output
  *     row's payload values come from the same matched right row even
  *     when individual payload columns are NULL.
  *   - NULL-key and NULL-time right rows are dropped up front: in join
  *     equality NULL never matches, and a NULL `rightTime` satisfies no
  *     `rightTime <= leftTime` inequality. Left rows with a NULL key or
  *     NULL time come out with a NULL payload (no match), because NULLs
  *     sort first in the ascending time order and no surviving right
  *     row shares a NULL key partition.
  */
object AsofJoin {

  /** `left asof-join right` on `keyCol`, times `leftTime`/`rightTime`;
    * every column of `payload` (from the right side) is carried
    * forward as `asof_<name>`. Left rows keep all their columns plus
    * the carried payload columns (null when no prior right row
    * exists).
    */
  private def quoted(name: String): String = graft.functions.Fns.quoted(name)

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val payloadType = StructType(payload.map(c => right.schema(c)))
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col("__t"), col("__side")) ++
        left.columns.map(c => col(quoted(c)).as(s"__l_$c")) :+
        lit(null).cast(payloadType).as("__p"): _*)
    val rTagged = right
      .where(col(keyCol).isNotNull && col(rightTime).isNotNull)
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col("__t"), col("__side")) ++
        left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
        struct(payload.map(c => col(quoted(c))): _*).as("__p"): _*)
    // right rows sort before left rows at equal times => ties match
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__c", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(left.columns.toIndexedSeq.map(c => col(quoted(s"__l_$c")).as(c)) ++
        // getField, not col("__c.name"): a payload name with a dot
        // would otherwise parse as a nested-field path and misresolve
        payload.map(c => col("__c").getField(c).as(s"asof_$c")): _*)
  }
}
