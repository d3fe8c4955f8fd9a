package graft
package sources

import org.scalatest.funsuite.AnyFunSuite

class RateLimiterSpec extends AnyFunSuite {

  test("burst admits immediately, then throttles at the configured rate") {
    var now = 0L
    val rl = new RateLimiter(ratePerSecond = 2.0, burst = 3, nanoTime = () => now)
    // burst of 3 goes through instantly
    assert((1 to 3).map(_ => rl.acquireDelayNanos()).forall(_ == 0L))
    // 4th must wait ~0.5s
    val d = rl.acquireDelayNanos()
    assert(d > 400000000L && d <= 500000000L)
    // half a second later a token is available
    now += 500000000L
    assert(rl.acquireDelayNanos() === 0L)
    // tokens never exceed burst
    now += 60L * 1000000000L
    assert((1 to 3).map(_ => rl.acquireDelayNanos()).forall(_ == 0L))
    assert(rl.acquireDelayNanos() > 0L)
  }
}

class StructuredKnowledgeSpec extends AnyFunSuite {
  import java.nio.file.Files
  import graft.api.StructuredKnowledge

  test("Q8: topic slug round trip + listing") {
    val dir = Files.createTempDirectory("graft_sk")
    StructuredKnowledge.write(dir, "Vector Index: Build & Tune!", "body text")
    assert(StructuredKnowledge.slugOf("Vector Index: Build & Tune!")
      === "vector-index-build-tune")
    val back = StructuredKnowledge.read(dir, "Vector Index: Build & Tune!")
    assert(back.exists(_.contains("body text")))
    assert(back.exists(_.startsWith("# Vector Index: Build & Tune!")))
    StructuredKnowledge.write(dir, "another topic", "x")
    assert(StructuredKnowledge.topics(dir)
      === Seq("another-topic", "vector-index-build-tune"))
    assert(StructuredKnowledge.read(dir, "missing") === None)
  }

  test("read_cached tool: type filter, topic filter, missing cache") {
    import graft.api.{QueryCache, ReadCached}
    val dir = Files.createTempDirectory("graft_rc")
    val qf = dir.resolve("queries.tsv")
    new QueryCache(persistTo = Some(qf)).record("alpha beta", 3)
    val kdir = dir.resolve("knowledge")
    StructuredKnowledge.write(kdir, "Topic One", "first body")
    StructuredKnowledge.write(kdir, "Topic Two", "second body")

    val all = ReadCached.read(Some(qf), kdir)
    assert(all.queries.exists(_.nonEmpty))
    assert(all.knowledge.map(_.topic) === Seq("topic-one", "topic-two"))
    assert(all.knowledge.head.content.contains("first body"))

    val qOnly = ReadCached.read(Some(qf), kdir, readType = "queries")
    assert(qOnly.queries.nonEmpty && qOnly.knowledge.isEmpty)

    val one = ReadCached.read(Some(qf), kdir, readType = "knowledge",
      topic = Some("Topic Two"))
    assert(one.queries.isEmpty && one.knowledge.map(_.topic) === Seq("topic-two"))

    val none = ReadCached.read(None, dir.resolve("absent"))
    assert(none.queries.isEmpty && none.knowledge.isEmpty)
  }
}
