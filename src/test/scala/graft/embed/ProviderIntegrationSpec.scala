package graft
package embed

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.api.IndexPipeline

/** E2/E3: an EXTERNAL, non-deterministic embedding provider slots
  * through the whole index → search loop, and the reference's
  * batch-of-100 call contract (`embedding.ts:88-123`) holds: one bulk
  * call per ≤batchSize slice, results index-aligned with inputs.
  * The fake provider records every call in a JVM-static log (tasks in
  * local mode share the JVM), and embeds each text as a direction no
  * hash of the text could produce — so only true provider plumbing,
  * not the default embedder, can explain the stored vectors.
  */
object RecordingProvider {
  // (batchSize of the call, texts) per embedBatch invocation
  val calls = new ConcurrentLinkedQueue[Seq[String]]()
  def reset(): Unit = calls.clear()
}

class RecordingProvider(val dim: Int = 8) extends EmbeddingProvider {
  // Non-deterministic w.r.t. the text content alone: the direction is
  // keyed by an opaque per-text tag the test controls, not a hash.
  def embed(text: String): Array[Double] = {
    val axis = if (text.contains("zanzibar")) 0
      else if (text.contains("quasar")) 1 else 7
    Array.tabulate(dim)(i => if (i == axis) 1.0 else 0.0)
  }
  override def embedBatch(texts: Seq[String]): Seq[Array[Double]] = {
    RecordingProvider.calls.add(texts)
    texts.map(embed)
  }
}

class ProviderIntegrationSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2026-01-02 03:04:05")

  test("E3 embedAll: splitting, alignment, progress, error context") {
    val prov = new RecordingProvider
    RecordingProvider.reset()
    // empty input short-circuits without a provider call
    assert(BatchEmbedding.embedAll(prov, Nil, 100) === Nil)
    assert(RecordingProvider.calls.isEmpty)
    // within one batch → exactly one call
    BatchEmbedding.embedAll(prov, (1 to 100).map(i => s"t$i"), 100)
    assert(RecordingProvider.calls.size === 1)
    // 250 texts at batch 100 → calls of 100/100/50, order preserved
    RecordingProvider.reset()
    val progress = Seq.newBuilder[(Int, Int)]
    val out = BatchEmbedding.embedAll(prov, (1 to 250).map(i => s"t$i"), 100,
      (done, total) => progress += ((done, total)))
    assert(out.length === 250)
    assert(RecordingProvider.calls.asScala.map(_.length).toSeq === Seq(100, 100, 50))
    assert(RecordingProvider.calls.asScala.flatten.toSeq === (1 to 250).map(i => s"t$i"))
    assert(progress.result() === Seq((100, 250), (200, 250), (250, 250)))
    // a failing batch reports WHICH batch failed (reference error text)
    val boom = new EmbeddingProvider {
      val dim = 4
      def embed(text: String): Array[Double] = Array.fill(4)(0.0)
      override def embedBatch(texts: Seq[String]): Seq[Array[Double]] =
        if (texts.exists(_ == "t150")) throw new IllegalStateException("rate limit")
        else texts.map(embed)
    }
    val e = intercept[RuntimeException] {
      BatchEmbedding.embedAll(boom, (1 to 250).map(i => s"t$i"), 100)
    }
    assert(e.getMessage === "Failed to generate embeddings for batch 2")
  }

  test("external provider flows through indexFiles → search, batched") {
    val root = Files.createTempDirectory("graft_prov")
    val in = Files.createDirectory(root.resolve("in"))
    // two docs with distinct provider axes + filler docs so the corpus
    // spans several chunks per partition
    Files.writeString(in.resolve("target.txt"), "zanzibar harbor " * 120)
    Files.writeString(in.resolve("other.txt"), "quasar field " * 120)
    (1 to 6).foreach(i =>
      Files.writeString(in.resolve(s"filler$i.txt"), s"plain filler text $i " * 120))
    val store = s"$root/store"
    val prov = new RecordingProvider
    RecordingProvider.reset()
    IndexPipeline.indexFiles(spark, s"$root/in", "*", store, t0,
      provider = Some(prov), embedBatchSize = 3)

    // call accounting: every bulk call respected the batch size, and
    // the union of all calls covers every stored chunk exactly once
    val calls = RecordingProvider.calls.asScala.toSeq
    assert(calls.nonEmpty && calls.forall(_.length <= 3))
    assert(calls.exists(_.length > 1), "chunks were actually batched")
    val stored = spark.read.parquet(s"$store/chunks")
    assert(calls.map(_.length).sum.toLong === stored.count())

    // result alignment: each stored chunk carries the vector the
    // provider returned for ITS text — axis 0 iff zanzibar text
    val mismatched = stored
      .select(col("content"), col("embedding"))
      .collect()
      .count { r =>
        val v = r.getSeq[Float](1)
        val axis = v.indexOf(1.0f)
        val want = if (r.getString(0).contains("zanzibar")) 0
          else if (r.getString(0).contains("quasar")) 1 else 7
        axis != want || v.count(_ != 0.0f) != 1
      }
    assert(mismatched === 0)

    // end-to-end: searching with the same provider surfaces the
    // axis-0 doc first — impossible via the default hashing embedder,
    // whose 64-dim vectors wouldn't even match the store's dim=8
    val hits = IndexPipeline.search(spark, store, "zanzibar", k = 2,
      provider = Some(prov)).collect()
    assert(hits.nonEmpty)
    assert(hits.head.getAs[String]("content").contains("zanzibar"))
    assert(hits.head.getAs[Double]("score") >= 1.0)
  }
}
