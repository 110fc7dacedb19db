package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the latest right row with
  * `rightTime <= leftTime` within the same key. Spark has no native
  * operator (SURVEY §7.3 case (a): compose existing ops), so this uses
  * the union-and-carry-forward formulation:
  *
  *   tag left/right -> union -> per-key window ordered by (time, tag)
  *   -> `last(right value, ignoreNulls)` over unbounded-preceding
  *   -> keep left rows.
  *
  * One shuffle on the key, no range explosion, no per-key collect —
  * the classic scalable shape (a sort-merge band join would re-scan
  * right rows per left row). Ties (equal timestamps) match, like
  * DuckDB/QuestDB ASOF semantics — right rows sort before left rows at
  * the same instant.
  */
object AsofJoin {

  /** `left asof-join right` on `keyCol`, times `leftTime`/`rightTime`;
    * every column of `payload` (from the right side) is carried
    * forward. Left rows keep all their columns plus the carried
    * payload columns (null when no prior right row exists).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTime: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col("__t"), col("__side")) ++
        left.columns.map(c => col(c).as(s"__l_$c")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col("__t"), col("__side")) ++
        left.columns.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        payload.map(c => col(c).as(s"__p_$c")): _*)
    // right rows sort before left rows at equal times => ties match
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(s"__c_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried.where(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l_$c").as(c)) ++
        payload.map(c => col(s"__c_$c").as(s"asof_$c")): _*)
  }
}
