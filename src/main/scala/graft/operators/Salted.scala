package graft
package operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * joins; this covers aggregations and windows, which AQE does not
  * re-salt.
  *
  * The auto hook ([[Salted.hotKeys]] → [[Salted.withOwnerStats]]) is
  * the [[Events.qKeySkew]] diagnostic turned into a plan decision: a
  * cheap sampled probe estimates per-key row share BEFORE the big
  * shuffle; when any key exceeds the hot-share threshold the window
  * path (whole key in one task) is swapped for the salted
  * aggregate-and-join-back path, which spreads every key `buckets`
  * ways and rejoins one stats row per key (AQE-skew-splittable).
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

  /** Sampled heavy-hitter probe (the [[Events.qKeySkew]] share metric
    * as a pre-shuffle decision): keys whose share of SAMPLED rows
    * exceeds `hotShare`. A key owning ≥ hotShare of a 100 TB corpus is
    * visible in any few-percent sample with overwhelming probability,
    * so the probe is one narrow pass over a fraction of the data plus
    * a ≤`cap`-row collect. Sampling is seeded — deterministic plans. */
  def hotKeys(df: DataFrame, key: Column, hotShare: Double = 0.05,
      sampleFraction: Double = 0.1, cap: Int = 20): Seq[Any] = {
    val sampled = df.select(key.as("k")).sample(sampleFraction, seed = 42L)
    val n = sampled.count()
    if (n == 0) return Nil
    sampled.groupBy("k").agg(count(lit(1)).as("c"))
      .filter(col("c") >= lit(math.ceil(hotShare * n).toLong))
      .orderBy(desc("c"))
      .limit(cap)
      .collect().map(_.get(0)).toSeq
  }

  /** Attach per-key ownership stats to every row of `df`:
    * `owner` = min(value) over the key, `n_keyrows` = rows per key —
    * the pair the substring/fingerprint dedup family consumes.
    *
    * `hot` empty → single-shuffle window (the right plan when no key
    * dominates). `hot` non-empty → salted two-stage aggregate on
    * (key, salt) merged per key, then joined back — three linear
    * shuffles, no single-task key. Both paths return identical rows;
    * SaltedSpec proves equality on a planted hot key. */
  def withOwnerStats(df: DataFrame, key: Column, value: Column,
      buckets: Int = 16, hot: Seq[Any] = Nil): DataFrame =
    if (hot.isEmpty) {
      val w = Window.partitionBy(key)
      df.withColumn("owner", min(value).over(w))
        .withColumn("n_keyrows", count(lit(1)).over(w))
    } else {
      val stats = df
        .select(key.as("__k"), value.as("__v"),
          pmod(hash(value), lit(buckets)).as("__salt"))
        .groupBy("__k", "__salt")
        .agg(min(col("__v")).as("pm"), count(lit(1)).as("pc"))
        .groupBy("__k")
        .agg(min(col("pm")).as("owner"), sum(col("pc")).as("n_keyrows"))
      df.join(stats, key === col("__k")).drop("__k")
    }

  /** Probe-then-choose: the auto-salting hook for gram-keyed stages. */
  def autoOwnerStats(df: DataFrame, key: Column, value: Column,
      buckets: Int = 16, hotShare: Double = 0.05,
      sampleFraction: Double = 0.1): DataFrame =
    withOwnerStats(df, key, value, buckets,
      hotKeys(df, key, hotShare, sampleFraction))
}
