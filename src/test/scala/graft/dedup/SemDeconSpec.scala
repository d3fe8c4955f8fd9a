package graft
package dedup

import org.apache.spark.sql.functions._

import graft.operators.{Ann, Dedup}

/** Semantic decontamination ([[Dedup.qSemDecon]]): reported pairs must
  * be genuine bucket-mates with driver-verified cosines, train/eval
  * sides must never mix, and the argmax per train vector must hold.
  */
class SemDeconSpec extends SparkSpec {

  test("sem decon: sides, bucket-mate property, exact scores, argmax") {
    val out = Dedup.qSemDecon(spark, sfDir).collect()
    assert(out.length === 20)
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    out.foreach { r =>
      assert(r.getLong(0) >= 20 && r.getLong(1) < 20)
    }
    val buckets = Ann.lshBuckets(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    out.foreach { r =>
      val (t, ev) = (r.getLong(0), r.getLong(1))
      assert(buckets(t) === buckets(ev), s"$t/$ev not bucket-mates")
      assert(math.abs(r.getDouble(2) - cos(vecs(t), vecs(ev))) < 1e-5,
        s"score mismatch for $t/$ev")
      // argmax: no OTHER bucket-mate eval vec scores higher
      (0L until 20L).filter(e2 => e2 != ev && buckets(e2) == buckets(t))
        .foreach { e2 =>
          assert(cos(vecs(t), vecs(e2)) <= cos(vecs(t), vecs(ev)) + 1e-9,
            s"argmax violated for $t: eval $e2 beats $ev")
        }
    }
  }
}
