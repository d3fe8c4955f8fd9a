package graft
package operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: two-stage salted aggregation for
  * hot-key groupBys (the classic 100 TB failure mode: a handful of
  * group keys hold most rows, so one reducer partition runs forever).
  *
  * Stage 1 aggregates on (key, salt) — the hot key's rows spread over
  * `buckets` reducers; stage 2 merges the tiny per-salt partials.
  * Correct for any algebraic aggregate (sum/count/min/max); demoed and
  * equality-tested in SaltedSpec. AQE skew handling
  * (`spark.sql.adaptive.skewJoin.enabled`, on in GraftSession) covers
  * joins; this covers aggregations, which AQE does not re-salt.
  */
object Salted {

  /** Salted equivalent of `df.groupBy(key).agg(sum(value), count(*))`. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltSource: Column, buckets: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"),
        pmod(hash(saltSource), lit(buckets)).as("salt"))
      .groupBy("k", "salt")
      .agg(sum(col("v")).as("ps"), count(lit(1)).as("pc"))
      .groupBy("k")
      .agg(sum(col("ps")).as("sum_v"), sum(col("pc")).as("n"))
}
