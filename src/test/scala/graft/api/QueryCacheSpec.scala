package graft
package api

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class QueryCacheSpec extends AnyFunSuite {

  test("Q7: exact hit, 70% keyword containment, recency preference") {
    val c = new QueryCache(capacity = 3)
    c.record("spark shuffle partitions", 5)
    c.record("vector index build", 7)
    assert(c.findSimilar("vector index build") === Some("vector index build"))
    // 2 of 3 cached keywords contained (66%) → below threshold
    assert(c.findSimilar("vector index tuning") === None)
    // all cached keywords contained (100%) → hit
    assert(c.findSimilar("how to build a vector index fast")
      === Some("vector index build"))
    // recency: two candidates qualify → most recent wins
    c.record("vector index rebuild", 2)
    assert(c.findSimilar("vector index build rebuild everything")
      === Some("vector index rebuild"))
    // capacity: oldest evicted
    c.record("a", 1)
    assert(c.size === 3)
    assert(c.findSimilar("spark shuffle partitions") === None)
  }

  test("Q7: reference matching rules — length>3 keywords, substring containment, direction") {
    val c = new QueryCache()
    c.record("indexing pipeline overview", 3)
    // keywords come from the NEW query and short tokens (<=3 chars) are
    // dropped: "how to use the" contributes nothing; "pipeline" +
    // "indexing" are the keywords and both are substrings of the cache
    assert(c.findSimilar("how to use the indexing pipeline") ===
      Some("indexing pipeline overview"))
    // substring (not token) containment: "index" matches inside "indexing"
    assert(c.findSimilar("index pipeline setup guide") === None) // 2/4 = 50%
    assert(c.findSimilar("index pipeline") === Some("indexing pipeline overview")) // 2/2
    // direction: cached entry longer than the query no longer blocks a
    // hit — only the NEW query's keywords must be covered
    assert(c.findSimilar("pipeline") === Some("indexing pipeline overview"))
    // exact match is case-insensitive (reference compares lowercased)
    assert(c.findSimilar("INDEXING Pipeline OVERVIEW") ===
      Some("indexing pipeline overview"))
  }

  test("Q7: persistence round trip") {
    val f = Files.createTempFile("graft_qc", ".tsv")
    val c1 = new QueryCache(persistTo = Some(f))
    c1.record("alpha beta gamma", 4)
    val c2 = new QueryCache(persistTo = Some(f))
    assert(c2.size === 1)
    assert(c2.findSimilar("alpha beta gamma") === Some("alpha beta gamma"))
  }
}

class CursorSpec extends SparkSpec {

  test("O5: cursor round trip and page walk") {
    assert(Cursor.decode(Cursor.encode(20, "q x")) === Some((20, "q x")))
    assert(Cursor.decode("!!!") === None)

    val df = Tables.orders(spark, sfDir)
      .orderBy(org.apache.spark.sql.functions.col("o_orderkey"))
      .select("o_orderkey")
    val (p1, c1) = Cursor.page(df, "q", None, 10)
    assert(p1.count() === 10 && c1.isDefined)
    val (p2, _) = Cursor.page(df, "q", c1, 10)
    val k1 = p1.collect().map(_.getLong(0)).toSet
    val k2 = p2.collect().map(_.getLong(0)).toSet
    assert(k1.intersect(k2).isEmpty)
    // stale cursor for a different query restarts from 0
    val (p3, _) = Cursor.page(df, "other", c1, 10)
    assert(p3.collect().map(_.getLong(0)).toSet === k1)
  }
}
