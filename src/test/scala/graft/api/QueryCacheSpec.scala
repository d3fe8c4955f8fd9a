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
