package graft
package streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming segment claims must implement first-occurrence-wins
  * exactly (derived independently from the pure segment functions),
  * and the sink-side reassembly must rebuild the surviving text. */
class StreamingLineDedupSpec extends SparkSpec {

  test("stream segments: first arrival wins; reassembly matches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").limit(30).collect()
      .map(r => (r.getLong(0), r.getString(1)))

    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingLineDedup.segClaims(stream.toDS())
      .writeStream.format("memory").queryName("seg_claims")
      .outputMode("append").start()
    try {
      docs.zipWithIndex.foreach { case ((id, text), i) =>
        stream.addData((id, new Timestamp(base + i * 1000L), text))
        q.processAllAvailable()
      }
    } finally q.stop()

    val claims = spark.table("seg_claims")
    // independent expectation: per segment TEXT, the earliest
    // (doc_id, pos) among per-doc first occurrences wins
    val perDoc = docs.map { case (id, text) =>
      id -> StreamingLineDedup.firstOccurrence(
        StreamingLineDedup.segmentsOf(text))
    }
    val winners = perDoc
      .flatMap { case (id, segs) => segs.map { case (pos, s) => (s, (id, pos)) } }
      .groupBy(_._1).map { case (s, v) => s -> v.map(_._2).min }
    val expected = winners.toSeq
      .map { case (s, (id, pos)) => (id, pos, s) }.sorted
    val got = claims.select("doc_id", "pos", "seg").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq.sorted
    assert(got === expected)

    // reassembly: surviving segments of each doc, in position order
    val rebuilt = StreamingLineDedup.rebuiltFromClaims(claims)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val expectedText = expected.groupBy(_._1).map { case (id, rows) =>
      id -> rows.sortBy(_._2).map(_._3).mkString(" ")
    }
    assert(rebuilt === expectedText)
    // the first doc survives intact
    val first = docs.head
    assert(rebuilt(first._1) ===
      StreamingLineDedup.firstOccurrence(
        StreamingLineDedup.segmentsOf(first._2))
        .map(_._2).mkString(" "))
  }

  test("cross-doc tie in ONE micro-batch: min (doc_id, pos) claimant wins") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    // two docs sharing their text arrive in the SAME batch, the
    // higher doc_id added first — dropDuplicatesWithinWatermark would
    // keep doc 99's arbitrary first-seen claim; the batch rule
    // (qLineDedup) demands doc 7's
    val shared = Seq.fill(graft.operators.Dedup.SegLen)("tok").mkString(" ")
    val ts = Timestamp.valueOf("2026-01-01 00:00:00")
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingLineDedup.segClaims(stream.toDS())
      .writeStream.format("memory").queryName("seg_claims_tie")
      .outputMode("append").start()
    try {
      stream.addData((99L, ts, shared), (7L, ts, shared))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("seg_claims_tie")
      .select("doc_id", "pos").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.toSeq === Seq((7L, 0)))
  }
}
