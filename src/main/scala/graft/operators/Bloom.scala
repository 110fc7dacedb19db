package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter-accelerated semi join: build a bloom filter over the
  * small side's keys (one reduce to the driver, constant-size bits),
  * broadcast it, and pre-filter the big side BEFORE its shuffle — the
  * semi join that follows only sees survivors, so at 100 TB the
  * exchange carries ~selectivity × fpp-adjusted rows instead of the
  * full fact table. The final equi-semi-join keeps semantics EXACT;
  * the bloom can only prune, never change the result (false positives
  * are re-checked, false negatives don't exist).
  *
  * This is the manual form of what AQE's runtime row-group filtering
  * does opportunistically — made explicit so the pruning is guaranteed
  * and testable, not plan-dependent.
  */
object Bloom {

  /** Exact `big ⋉ small` on a long-typed key, bloom-pruned map-side.
    *
    * `expectedItems`/`fpp` size the filter (bits ≈ -n·ln(fpp)/ln²2;
    * the 1M/1% default is ~1.2 MB — cheap to broadcast). Null keys
    * never match, mirroring equi-join semantics.
    */
  def semiJoin(big: DataFrame, small: DataFrame,
               bigKey: String, smallKey: String,
               expectedItems: Long = 1L << 20,
               fpp: Double = 0.01): DataFrame = {
    // the filter is BUILT from the small column's values and PROBED
    // with mightContainLong — both sides must be integral or the probe
    // hashes different bytes than the build and silently drops matches
    val integral = Set("ByteType", "ShortType", "IntegerType", "LongType")
    def keyType(df: DataFrame, c: String) = df.schema(c).dataType.toString
    require(integral(keyType(small, smallKey)) && integral(keyType(big, bigKey)),
      s"Bloom.semiJoin needs integral keys; got $bigKey:${keyType(big, bigKey)}" +
        s" vs $smallKey:${keyType(small, smallKey)}")
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
    big.where(mightContain(col(bigKey).cast("long")))
      .join(small, big(bigKey) === small(smallKey), "left_semi")
  }
}
