package graft
package streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming MinHash-LSH near-dup filter: the row-local signature must
  * be bit-identical to the batch signature matrix, and the stream's
  * first-claimant band semantics must reproduce the deterministic
  * earliest-arrival expectation. */
class StreamingDedupSpec extends SparkSpec {

  test("row-local signature == batch minhashSigsWide, doc for doc") {
    val wide = Dedup.minhashSigsWide(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (0 until 16).map(i => r.getLong(i + 1)).toArray)
      .toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty)
    var checked = 0
    docs.foreach { case (id, text) =>
      StreamingDedup.signatureOf(text) match {
        case Some(sig) =>
          assert(wide.contains(id), s"doc $id missing from batch matrix")
          assert(sig.toSeq === wide(id).toSeq, s"signature mismatch for doc $id")
          checked += 1
        case None =>
          assert(!wide.contains(id), s"doc $id unexpectedly in batch matrix")
      }
    }
    assert(checked === wide.size)
  }

  test("stream claims: first arrival wins every band; novelty matches replay") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").limit(30).collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingDedup.bandClaims(stream.toDS())
      .writeStream.format("memory").queryName("band_claims")
      .outputMode("append").start()
    try {
      // one micro-batch per doc, in doc_id order → deterministic
      // first-claimant semantics
      docs.zipWithIndex.foreach { case ((id, text), i) =>
        stream.addData((id, new Timestamp(base + i * 1000L), text))
        q.processAllAvailable()
      }
    } finally q.stop()

    val claims = spark.table("band_claims")
    // expectation derived independently from the pure signature:
    // earliest doc_id claiming each (band, sig) wins; novel = won all 4
    val sigs = docs.flatMap { case (id, text) =>
      StreamingDedup.signatureOf(text).map(s =>
        id -> StreamingDedup.bandSigsOf(s))
    }
    val winners = sigs
      .flatMap { case (id, bs) => bs.zipWithIndex.map { case (s, b) => ((b, s), id) } }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val expectedClaims = winners.toSeq.map { case ((b, s), id) => (id, b, s) }.sorted
    val gotClaims = claims.select("doc_id", "band", "band_sig").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted
    assert(gotClaims === expectedClaims)

    val expectedNovel = sigs.collect {
      case (id, bs) if bs.zipWithIndex.forall { case (s, b) => winners((b, s)) == id } => id
    }.toSet
    val gotNovel = StreamingDedup.novelFromClaims(claims)
      .collect().map(_.getLong(0)).toSet
    assert(gotNovel === expectedNovel)
    // sanity: the first doc is always novel
    assert(gotNovel.contains(docs.head._1))
  }
}
