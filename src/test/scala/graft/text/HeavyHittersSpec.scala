package graft
package text

import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAggregator
import graft.operators.TextAnalysis
import graft.operators.TextAnalysis.toks

/** Misra–Gries heavy hitters: the bounded sketch must (a) never hold
  * more than its counter budget, (b) never overestimate and never
  * underestimate by more than N/(c+1) — the superset guarantee the
  * exact-verify pass builds on — and (c) compose with the verify join
  * into exactly the plain GROUP BY answer. */
class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  test("mg: bounded buffer, underestimates only, error ≤ N/(c+1), " +
      "superset of true heavy hitters — adversarial order and merges") {
    val c = 8
    // One genuinely heavy token (freq 60 of N=140), a mid token the
    // threshold excludes, and 70 near-distinct fillers that force
    // constant decrements; interleaved so partial summaries disagree.
    val heavy = Seq.fill(60)("heavy")
    val mid = Seq.fill(10)("mid")
    val fillers = (0 until 70).map(i => s"f$i")
    val stream = (heavy ++ mid ++ fillers)
    val n = stream.length
    // 7 partitions → 7 partial summaries merged in driver-opaque order
    val sk = stream.toDS().repartition(7)
      .select(MisraGriesAggregator.mg(c))
      .collect().head
    assert(sk.n === n.toLong)
    val summary = sk.items
    assert(summary.length <= c)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    summary.foreach { case (tok, est) =>
      assert(est <= exact(tok), s"$tok overestimated: $est > ${exact(tok)}")
      assert(exact(tok) - est <= n / (c + 1) + 1,
        s"$tok under by ${exact(tok) - est}, bound ${n / (c + 1)}")
    }
    // any token with freq > N/(c+1) must survive
    val kept = summary.map(_._1).toSet
    exact.foreach { case (tok, f) =>
      if (f > n / (c + 1)) assert(kept.contains(tok), s"lost $tok (f=$f)")
    }
  }

  test("q_heavy_hitters equals the exact GROUP BY twin") {
    val tok = Tables.documents(spark, sfDir)
      .select(explode(toks(col("text"))).as("word"))
    val total = tok.count()
    val twin = tok.groupBy("word").agg(count(lit(1)).as("n"))
      .filter(col("n") * TextAnalysis.HhK >= total)
      .withColumn("frac", round(col("n").cast("double") / total, 6))
      .orderBy(desc("n"), col("word"))
      .collect()
    val got = TextAnalysis.qHeavyHitters(spark, sfDir).collect()
    assert(got.nonEmpty)
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq === twin.map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2))).toSeq)
  }
}
