package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators (SURVEY §6 / BASELINE scale goals).
  *
  * Context: Spark's hash aggregation already does map-side partial
  * combine, so plain skewed SUM/COUNT rarely needs help, and AQE
  * handles skewed *sort-merge* joins. The two cases that still hurt at
  * 100 TB and are handled here:
  *
  *   - a broadcast-ineligible join where a handful of keys dominate
  *     (AQE can split partitions but replication beats it when the
  *     small side fits per-key) -> [[saltedJoin]];
  *   - exact distinct aggregation, where all values of a hot key land
  *     on one reducer -> [[twoPhaseDistinctCount]].
  */
object Skew {

  /** Inner equi-join with the big side's hot keys spread over
    * `factor` reducers: the big side gets a deterministic salt, the
    * small side is replicated `factor` times, and the join key becomes
    * (key, salt). Result equals `big.join(small, keys, "inner")`.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }

  /** Exact COUNT(DISTINCT value) per key without funneling each hot
    * key through one reducer: phase 1 dedups on (key, value) — the
    * salt is the value itself — phase 2 counts per key.
    */
  def twoPhaseDistinctCount(df: DataFrame, key: Column, value: Column,
                            resultName: String = "distinct_cnt"): DataFrame =
    df.select(key.as("__k"), value.as("__v"))
      .distinct()
      .groupBy(col("__k"))
      .agg(count(lit(1)).as(resultName))
      .withColumnRenamed("__k", "key")
}
