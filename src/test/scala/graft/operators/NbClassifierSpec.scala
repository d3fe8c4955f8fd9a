package graft
package operators

/** Naive Bayes confusion matrix vs a straight-line in-memory reference
  * with the same integer-micro fixed-point discipline, plus a
  * planted-signal sanity check (disjoint class vocabularies must give
  * a perfect diagonal).
  */
class NbClassifierSpec extends SparkSpec {

  /** Plain-Scala multinomial NB with the exact arithmetic of
    * [[Quality.nbConfusion]]: 80/20 doc_id%5 split, add-one smoothing,
    * per-(word,class) log-likelihood and prior rounded to integer
    * micros before any summation, argmax with lexicographic
    * tie-break. */
  private def referenceNb(
      docs: Seq[(Long, String, String)]): Map[(String, String), Long] = {
    def words(t: String) =
      t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    val tok = docs.flatMap { case (id, src, text) =>
      words(text).map(w => (id, src, w))
    }
    val tr = tok.filter(_._1 % 5 != 0)
    val ho = tok.filter(_._1 % 5 == 0)
    val classDocs = tr.groupBy(_._2).map { case (c, xs) =>
      c -> xs.map(_._1).distinct.size.toLong
    }
    val tot = tr.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong }
    val vocab = tr.map(_._3).distinct.size.toLong
    val cnt = tr.groupBy(x => (x._2, x._3)).map { case (k, xs) =>
      k -> xs.size.toLong
    }
    val allDocs = classDocs.values.sum
    def micro(x: Double) = math.round(x * 1e6)
    val classes = classDocs.keys.toSeq.sorted
    val conf = scala.collection.mutable.Map.empty[(String, String), Long]
    ho.groupBy(_._1).foreach { case (_, rows) =>
      val actual = rows.head._2
      val wcounts = rows.groupBy(_._3).map { case (w, xs) =>
        w -> xs.size.toLong
      }
      val scores = classes.map { c =>
        val prior = micro(math.log(classDocs(c).toDouble / allDocs))
        val like = wcounts.map { case (w, n) =>
          n * micro(math.log((cnt.getOrElse((c, w), 0L) + 1).toDouble /
            (tot(c) + vocab)))
        }.sum
        (c, prior + like)
      }
      val best = scores.minBy { case (c, s) => (-s, c) }._1
      conf((actual, best)) = conf.getOrElse((actual, best), 0L) + 1L
    }
    conf.toMap
  }

  private def confusionOf(
      docs: Seq[(Long, String, String)]): Map[(String, String), Long] = {
    val spark2 = spark
    import spark2.implicits._
    Quality.nbConfusion(
        docs.toDF("doc_id", "source", "text")
          .select(org.apache.spark.sql.functions.col("doc_id"),
            org.apache.spark.sql.functions.col("source"),
            org.apache.spark.sql.functions.col("text")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("disjoint class vocabularies classify the held-out docs " +
      "perfectly") {
    val docs = (1L to 20L).map { i =>
      if (i % 2 == 0) (i, "code", s"def fn$i return yield lambda")
      else (i, "prose", s"the quiet morning river $i flows gently")
    }
    val got = confusionOf(docs)
    assert(got === referenceNb(docs))
    // doc_id%5==0 held-out: 4 docs, 2 per class, all on the diagonal
    assert(got === Map(("code", "code") -> 2L, ("prose", "prose") -> 2L))
  }

  test("confusion matrix matches the in-memory reference on the real " +
      "sf0.001 corpus") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").as[(Long, String, String)]
      .collect().toSeq
    val got = Quality.qNbClassifier(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === referenceNb(docs))
    // held-out docs all accounted for
    assert(got.values.sum === docs.count(_._1 % 5 == 0))
  }
}
