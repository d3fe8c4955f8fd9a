package graft
package operators

import org.apache.spark.sql.functions._

/** Bottom-k quantile sketch ([[Events.qQuantileSketch]]): the sampled
  * estimate must be (a) partitioning-invariant — the k-smallest-by-hash
  * sample is a property of the hash multiset, not of row order — and
  * (b) an actual ceil-rank quantile of an independently recomputed
  * reference sample, with the exact twin agreeing with the engine's
  * own percentile operator.
  */
class QuantileSketchSpec extends SparkSpec {

  test("quantile sketch: shape, monotone cuts, exact side matches qPercentile") {
    val out = Events.qQuantileSketch(spark, sfDir).collect()
    val types = out.map(_.getString(0)).distinct
    assert(out.length === types.length * Events.QsPcts.length)
    // per type: est and exact are non-decreasing in pct
    types.foreach { t =>
      val rows = out.filter(_.getString(0) == t).sortBy(_.getInt(1))
      val est = rows.map(_.getDouble(4))
      val exact = rows.map(_.getDouble(5))
      assert(est.zip(est.tail).forall { case (a, b) => a <= b }, s"est not monotone for $t")
      assert(exact.zip(exact.tail).forall { case (a, b) => a <= b }, s"exact not monotone for $t")
    }
    // the exact twin at the shared cuts equals qPercentile's wide row
    val p = Relational.qPercentile(spark, sfDir).collect()
      .map(r => r.getString(0) -> Seq(25, 50, 75, 90).zip(
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap)
      .toMap
    // cents round-trip: vc/100.0 vs the raw stored double — equal up to
    // one representation ulp on 2-decimal data
    out.filter(r => Seq(25, 50, 75, 90).contains(r.getInt(1))).foreach { r =>
      assert(math.abs(r.getDouble(5) - p(r.getString(0))(r.getInt(1))) < 1e-9,
        s"exact_value diverges from qPercentile at ${r.getString(0)}/p${r.getInt(1)}")
    }
  }

  test("quantile sketch: estimate is the ceil-rank quantile of the reference sample") {
    import graft.embed.Embedder.hash60
    // independent driver-side recomputation of the bottom-k sample
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        Relational.cents(col("value")).as("vc"))
      .collect()
      .map(r => (r.getString(0), hash60(r.getLong(1).toString), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val samp = rows.map(r => (r._2, r._3)).sorted.take(Events.QsK).map(_._2).sorted
      t -> Events.QsPcts.map { p =>
        p -> samp(math.max(math.ceil(samp.length * p / 100.0).toInt, 1) - 1)
      }.toMap
    }
    val out = Events.qQuantileSketch(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val want = expected(r.getString(0))(r.getInt(1)) / 100.0
      assert(r.getDouble(4) === want,
        s"est mismatch at ${r.getString(0)}/p${r.getInt(1)}")
    }
  }

  test("quantile sketch: sample is partitioning-invariant (mergeable)") {
    import spark.implicits._
    import graft.embed.Embedder.hash60Col
    val base = Tables.events(spark, sfDir)
      .select(col("event_type"),
        hash60Col(col("event_id").cast("string")).as("h"),
        Relational.cents(col("value")).as("vc"))
    def sample(parts: Int) = base.repartition(parts)
      .as[(String, Long, Long)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(graft.functions.MinKPairAggregator.minK(Events.QsK))
      .toDF("event_type", "mins")
      .select(col("event_type"), explode(col("mins")).as("e"))
      .select(col("event_type"), col("e._1").as("h"), col("e._2").as("vc"))
    assert(sample(1).exceptAll(sample(13)).count() === 0)
    assert(sample(13).exceptAll(sample(1)).count() === 0)
  }
}
