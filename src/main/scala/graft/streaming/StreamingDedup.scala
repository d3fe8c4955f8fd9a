package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.embed.Embedder
import graft.operators.Dedup

/** One LSH band claim emitted per (doc, band) — top-level for the
  * streaming encoder. */
case class BandClaim(doc_id: Long, ts: Timestamp, band: Int, band_sig: String)

/** Streaming near-duplicate filtering — the training-pipeline shape
  * "drop incoming documents that near-duplicate anything already
  * ingested", run as MinHash-LSH over a document stream.
  *
  * Design: the per-document signature is computed ROW-LOCALLY (pure
  * function, no shuffle — unlike the batch path, which amortizes one
  * doc_id shuffle across the corpus, a stream computes each arrival's
  * 16 minima inline), then each doc claims its 4 LSH band buckets;
  * `dropDuplicatesWithinWatermark(band, band_sig)` keeps the FIRST
  * claimant of every bucket, so a later doc that fails to win one of
  * its bands is an LSH candidate near-dup of an earlier doc — the
  * same any-band-collision rule the batch candidate join uses.
  * State is one row per bucket claimed WITHIN the watermark delay:
  * unlike plain `dropDuplicates` (whose state Spark only evicts when
  * the event-time column is part of the key, i.e. never here — it
  * would grow with corpus size), the within-watermark variant evicts
  * each bucket row once the watermark passes its claim time, so state
  * is bounded by arrival rate × delay. The trade: `delay` is the
  * dedup HORIZON — a duplicate arriving more than `delay` after the
  * original re-wins the bucket and must be caught by the sink's exact
  * verification against the persisted claims table (which a
  * production near-dup pipeline runs anyway, see below).
  *
  * Like the batch LSH stage this emits CANDIDATES: a production sink
  * verifies exact Jaccard against the band winner before dropping
  * (`Dedup.qDedupMinhash` semantics). The per-doc "won all 4 bands"
  * reduction is a second stateful aggregation, which streaming append
  * mode cannot chain after dedup without another watermark barrier —
  * run [[novelFromClaims]] in the sink (`foreachBatch`) or on the
  * replayed claims table.
  */
object StreamingDedup {

  /** Pure-Scala 16-min MinHash signature, bit-identical to the batch
    * `Dedup.minhashSigsWide` columns: same 3-token shingles, same
    * md5-based hash60 → mod p universal family, same coefficients.
    * None when the doc has < 3 tokens (no shingles — the batch filter).
    * Equality with the batch matrix is pinned by StreamingSpec. */
  def signatureOf(text: String): Option[Array[Long]] = {
    val t = Embedder.tokenize(text)
    if (t.length < 3) None
    else {
      val p = Dedup.MinhashP
      val hvs = (0 to t.length - 3)
        .map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").distinct
        .map(s => Embedder.hash60(s) % p)
      Some(Dedup.minhashCoeffs.map { case (_, a, b) =>
        hvs.iterator.map(h => (a * h + b) % p).min
      }.toArray)
    }
  }

  /** The 4 LSH band signatures (md5 of 4 comma-joined minima — the
    * batch band construction). */
  def bandSigsOf(sig: Array[Long]): Seq[String] =
    (0 until 4).map(b =>
      Embedder.md5hex((0 until 4).map(j => sig(4 * b + j)).mkString(",")))

  /** doc stream (id, event-time, text) → surviving band claims.
    * `delay` doubles as the dedup horizon: state for a bucket lives
    * `delay` past its claim's event time, then is evicted. */
  def bandClaims(docs: Dataset[(Long, Timestamp, String)],
      delay: String = "1 hour"): DataFrame = {
    import docs.sparkSession.implicits._
    docs.flatMap { case (id, ts, text) =>
      signatureOf(text).toSeq.flatMap { sig =>
        bandSigsOf(sig).zipWithIndex.map { case (s, b) =>
          BandClaim(id, ts, b, s)
        }
      }
    }.toDF()
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("band", "band_sig")
  }

  /** Sink-side reduction over the claims table: a doc is LSH-novel iff
    * it won ALL 4 of its bands (any lost band ⇒ candidate near-dup of
    * an earlier arrival). */
  def novelFromClaims(claims: DataFrame): DataFrame =
    claims.groupBy("doc_id")
      .agg(count(lit(1)).as("bands_won"))
      .filter(col("bands_won") === 4)
      .select("doc_id")
}
