package graft
package embed

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

/** The HTTP provider seam, proven two ways:
  *
  *  1. against a loopback `HttpServer` speaking the wire contract —
  *     runs everywhere, exercises the REAL request/response path
  *     (serialization, auth header, error statuses), no egress;
  *  2. against a live endpoint, opt-in via `GRAFT_EMBED_URL`
  *     (+ optional `GRAFT_EMBED_KEY`, `GRAFT_EMBED_DIM`) — skipped,
  *     not failed, when unset, so the offline gate stays green while
  *     the seam is smoke-testable the day a real embedder is wired
  *     (reference batch accounting, `embedding.ts:88-123`).
  */
class HttpProviderSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  /** Loopback endpoint implementing the wire contract with axis
    * embeddings (axis = index of the text within ALL texts served) —
    * distinguishable from anything a local hash could produce. */
  private def withServer(dim: Int, failOn: String => Boolean = _ => false)(
      f: (String, AtomicInteger) => Unit): Unit = {
    val served = new AtomicInteger(0)
    val hits = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/embed", (ex: HttpExchange) => {
      hits.incrementAndGet()
      val req = mapper.readTree(ex.getRequestBody)
      val texts = req.get("texts")
      val bad = (0 until texts.size()).exists(i => failOn(texts.get(i).asText))
      val resp = if (bad) {
        ex.sendResponseHeaders(429, 0)
        "too many requests".getBytes("UTF-8")
      } else {
        val root = mapper.createObjectNode()
        val out = root.putArray("embeddings")
        (0 until texts.size()).foreach { _ =>
          val axis = served.getAndIncrement() % dim
          val v = out.addArray()
          (0 until dim).foreach(j => v.add(if (j == axis) 1.0 else 0.0))
        }
        val bytes = mapper.writeValueAsBytes(root)
        ex.sendResponseHeaders(200, bytes.length)
        bytes
      }
      ex.getResponseBody.write(resp)
      ex.close()
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/embed", hits)
    finally server.stop(0)
  }

  test("loopback endpoint: batch accounting, alignment, error context") {
    withServer(dim = 8) { (url, hits) =>
      val prov = new HttpEmbeddingProvider(url, Some("test-key"), dim = 8)
      // 250 texts at batch 100 → exactly 3 wire calls, order preserved
      val out = BatchEmbedding.embedAll(prov, (1 to 250).map(i => s"t$i"), 100)
      assert(out.length === 250)
      assert(prov.requestCount === 3)
      assert(hits.get() === 3)
      assert(out.forall(_.length == 8))
      // alignment: the server hands out axes in served order, so text i
      // must carry axis i % dim — any reordering or splitting breaks it
      out.zipWithIndex.foreach { case (v, i) =>
        assert(v(i % 8) === 1.0 && v.sum === 1.0, s"text $i misaligned")
      }
    }
    // an HTTP failure surfaces as the reference's which-batch context
    withServer(dim = 8, failOn = _ == "t150") { (url, _) =>
      val prov = new HttpEmbeddingProvider(url, None, dim = 8)
      val e = intercept[RuntimeException] {
        BatchEmbedding.embedAll(prov, (1 to 250).map(i => s"t$i"), 100)
      }
      assert(e.getMessage === "Failed to generate embeddings for batch 2")
      assert(e.getCause.getMessage.contains("429"))
    }
    // a dim mismatch is rejected at the provider, not stored
    withServer(dim = 4) { (url, _) =>
      val prov = new HttpEmbeddingProvider(url, None, dim = 8)
      val e = intercept[RuntimeException] { prov.embedBatch(Seq("x")) }
      assert(e.getMessage.contains("dim 4"))
    }
  }

  test("live endpoint smoke (opt-in via GRAFT_EMBED_URL)") {
    val url = sys.env.get("GRAFT_EMBED_URL")
    assume(url.isDefined,
      "GRAFT_EMBED_URL not set — live provider smoke skipped")
    val prov = new HttpEmbeddingProvider(
      url.get,
      sys.env.get("GRAFT_EMBED_KEY"),
      sys.env.getOrElse("GRAFT_EMBED_DIM", "64").toInt)
    // the reference contract at its production batch size: 250 texts
    // → ceil(250/100) = 3 wire calls, every vector dim-checked
    val out = BatchEmbedding.embedAll(
      prov, (1 to 250).map(i => s"graft live smoke text $i"), 100)
    assert(out.length === 250)
    assert(prov.requestCount === 3)
    assert(out.forall(_.length == prov.dim))
  }
}
