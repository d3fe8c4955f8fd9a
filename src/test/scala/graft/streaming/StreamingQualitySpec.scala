package graft
package streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Streaming quality gate: gopher flags on the stream must be
  * bit-identical to the batch operator (same expressions), only
  * gopher-keepers may claim dedup state, and the sink-side decision
  * table must match the independently derived batch expectation. */
class StreamingQualitySpec extends SparkSpec {

  test("gate: claims only from gopher-keepers; decision matches batch replay") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)

    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = StreamingQuality.gatedClaims(stream.toDS())
      .writeStream.format("memory").queryName("gate_claims")
      .outputMode("append").start()
    try {
      docs.zipWithIndex.foreach { case ((id, text), i) =>
        stream.addData((id, new Timestamp(base + i * 1000L), text))
        q.processAllAvailable()
      }
    } finally q.stop()
    val claims = spark.table("gate_claims")

    // batch gopher verdicts for the same docs — the structural twin
    val flags = Quality.gopherFlags(
      docs.toSeq.toDF("doc_id", "text"))
    val gopherKeep = flags.filter(col("keep"))
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // 1. no claim from a gopher-rejected doc
    val claimants = claims.select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(claimants.subsetOf(gopherKeep))

    // 2. independent expectation: among keepers in arrival (= doc_id)
    // order, earliest claimant wins each (band, sig); novel = all 4
    val sigs = docs.filter(d => gopherKeep(d._1)).flatMap { case (id, text) =>
      StreamingDedup.signatureOf(text).map(id -> StreamingDedup.bandSigsOf(_))
    }
    val winners = sigs
      .flatMap { case (id, bs) => bs.zipWithIndex.map { case (s, b) => ((b, s), id) } }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    val expectNovel = sigs.collect {
      case (id, bs) if bs.zipWithIndex.forall { case (s, b) => winners((b, s)) == id } => id
    }.toSet

    // 3. the sink-side decision table: composite keep == gopher ∧ all-4
    val decision = StreamingQuality.gateFromClaims(claims, flags).collect()
    assert(decision.length === docs.length, "one verdict row per streamed doc")
    decision.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val gk = r.getAs[Boolean]("gopher_keep")
      val bands = r.getAs[Long]("bands_won")
      val keep = r.getAs[Boolean]("keep")
      assert(gk === gopherKeep(id))
      assert(keep === (gk && bands == 4L))
      assert(keep === (gopherKeep(id) && expectNovel(id)),
        s"doc $id: stream keep=$keep, batch replay=${gopherKeep(id) && expectNovel(id)}")
    }
    // the gate actually gates: at least one doc fails gopher OR dedup
    // on the synthetic corpus (planted near-dup pairs)
    assert(decision.count(!_.getAs[Boolean]("keep")) > 0)
  }

  test("stream c4 flags == batch qC4Rules, row-identical under uneven " +
      "batch slicing") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val stream = MemoryStream[(Long, String)]
    val q = Quality.c4Flags(stream.toDS().toDF("doc_id", "text"))
      .select("doc_id", "n_lines", "kept_lines", "n_sentences",
        "has_lorem", "has_brace", "has_js", "keep")
      .writeStream.format("memory").queryName("c4_stream")
      .outputMode("append").start()
    try {
      stream.addData(docs.take(1).toSeq); q.processAllAvailable()
      stream.addData(docs.slice(1, 8).toSeq); q.processAllAvailable()
      stream.addData(docs.drop(8).toSeq); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("c4_stream").collect()
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val ids = streamed.keySet
    val batch = graft.operators.Quality.qC4Rules(spark, sfDir).collect()
      .filter(r => ids(r.getLong(0)))
      .map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(streamed.size === docs.length)
    assert(streamed === batch,
      "streamed C4 flags diverged from the batch operator")
  }

  test("stream gopher flags == batch qGopherRules flags (same docs)") {
    val batch = graft.operators.Quality.qGopherRules(spark, sfDir)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val viaTransform = Quality.gopherFlags(
      Tables.documents(spark, sfDir)).select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(viaTransform === batch)
  }
}
