package graft
package streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model.Artifacts
import graft.operators.Quality

/** Online NB serving: streamed micro-batch scores against the
  * published artifact equal the one-shot batch scores, under any
  * batch slicing. */
class StreamingClassifySpec extends SparkSpec {

  test("streamed scores against the published model == batch scores") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sfDir)
    val path = java.nio.file.Files
      .createTempDirectory("graft_sclassify").toString + "/nb"
    Artifacts.saveNb(
      Quality.nbTrain(docs.filter(col("doc_id") % 5 =!= 0)), path)
    val model = Artifacts.loadNb(spark, path)

    val ho = docs.filter(col("doc_id") % 5 === 0)
      .select("doc_id", "source", "text")
      .as[(Long, String, String)].collect().toSeq
    assert(ho.nonEmpty)

    val stream = MemoryStream[(Long, String, String)]
    val out = ArrayBuffer.empty[(Long, String, String, Long)]
    val q = StreamingClassify.start(
        stream.toDF().toDF("doc_id", "source", "text"), model,
        carry = Seq("source")) { scored =>
      out ++= scored.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    }
    try {
      // three uneven micro-batches
      val (b1, rest) = ho.splitAt(ho.length / 3)
      val (b2, b3) = rest.splitAt(1)
      stream.addData(b1: _*); q.processAllAvailable()
      stream.addData(b2: _*); q.processAllAvailable()
      stream.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    val batch = Quality.nbScore(
        docs.filter(col("doc_id") % 5 === 0), model,
        carry = Seq("source"))
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(out.sortBy(_._1).toSeq === batch.sortBy(_._1))
  }
}
