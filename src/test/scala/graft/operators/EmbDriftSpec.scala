package graft
package operators

import org.apache.spark.sql.functions._

/** Embedding-release drift: member accounting must match the release
  * pattern exactly, and the centroid cosine must behave (1.0 when the
  * release leaves a label's members proportionally intact — here the
  * drop/re-add pattern keeps centroids close, never above 1). */
class EmbDriftSpec extends SparkSpec {

  test("q_emb_drift: counts reconcile with the release pattern, " +
      "cosines in (0, 1]") {
    val rows = Ann.qEmbDrift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val e = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val v1 = e.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val label = r.getInt(0)
      assert(r.getLong(1) === v1(label))
      val expectedV2 = e.count(x => x._2 == label && x._1 % 7 != 0) +
        e.count(x => x._2 == label && x._1 % 13 == 0)
      assert(r.getLong(2) === expectedV2.toLong)
      val cos = r.getDouble(3)
      assert(cos > 0.0 && cos <= 1.0, s"label $label cos=$cos")
      // the simulated release keeps ~6/7 of members: at sf0.001 a
      // label has only a handful of vectors so the centroid can move
      // visibly, but a same-label centroid flipping past orthogonal
      // would mean broken math, not drift
      assert(cos > 0.5, s"label $label drifted implausibly: $cos")
    }
    assert(rows.map(_.getInt(0)).toSet === v1.keySet)
  }
}
