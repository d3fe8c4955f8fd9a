package graft.embed

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.atomic.AtomicLong

import com.fasterxml.jackson.databind.ObjectMapper

/** [[EmbeddingProvider]] backed by a real HTTP embedding endpoint —
  * the seam the reference fills with its network embedder
  * (`src/core/embedding/embedding.ts:30-81`; model/transport details
  * differ, the contract is the same: one bulk call per ≤batch slice,
  * results index-aligned with inputs).
  *
  * Wire contract (generic JSON, adaptable per deployment):
  * `POST endpoint` with body `{"texts": ["…", …]}` (plus
  * `Authorization: Bearer <key>` when a key is configured) →
  * `{"embeddings": [[…], …]}`, one array of `dim` numbers per input,
  * same order. Any non-2xx status or shape mismatch throws —
  * [[BatchEmbedding.embedAll]] wraps it with the reference's
  * which-batch error context.
  *
  * [[requestCount]] counts wire calls so the batch-of-100 accounting
  * is assertable against a live endpoint, not just a recording fake.
  * The client is driver-side (indexing pre-pass), matching where the
  * reference embeds; nothing here is serialized into Spark tasks.
  */
class HttpEmbeddingProvider(
    endpoint: String,
    apiKey: Option[String],
    val dim: Int,
    timeout: Duration = Duration.ofSeconds(30)) extends EmbeddingProvider {

  @transient private lazy val client =
    HttpClient.newBuilder().connectTimeout(timeout).build()
  @transient private lazy val mapper = new ObjectMapper()

  private val requests = new AtomicLong(0)
  /** Wire calls made so far (batch accounting). */
  def requestCount: Long = requests.get()

  def embed(text: String): Array[Double] = embedBatch(Seq(text)).head

  override def embedBatch(texts: Seq[String]): Seq[Array[Double]] = {
    val body = mapper.createObjectNode()
    val arr = body.putArray("texts")
    texts.foreach(arr.add)
    val builder = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(timeout)
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(body)))
    apiKey.foreach(k => builder.header("Authorization", s"Bearer $k"))
    requests.incrementAndGet()
    val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(
        s"embedding endpoint returned HTTP ${resp.statusCode()}")
    val root = mapper.readTree(resp.body())
    val embs = root.get("embeddings")
    if (embs == null || !embs.isArray || embs.size() != texts.length)
      throw new RuntimeException(
        s"embedding endpoint returned ${if (embs == null) "no" else embs.size()}" +
          s" embeddings for ${texts.length} texts")
    (0 until embs.size()).map { i =>
      val v = embs.get(i)
      if (!v.isArray || v.size() != dim)
        throw new RuntimeException(
          s"embedding $i has dim ${if (v.isArray) v.size() else "?"}, want $dim")
      Array.tabulate(dim) { j =>
        val x = v.get(j)
        // asDouble() would coerce nulls/strings to 0.0 and smuggle a
        // malformed response past the shape checks (ADVICE r7)
        if (x == null || !x.isNumber)
          throw new RuntimeException(
            s"embedding $i component $j is non-numeric: $x")
        x.asDouble()
      }
    }
  }
}
