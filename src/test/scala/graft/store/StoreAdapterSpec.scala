package graft
package store

import org.apache.spark.sql.functions._

/** Adapter-registry parity (reference registry.ts semantics) and
  * cross-adapter equivalence — the reference's memory-vs-sqlite
  * differential tests become memory-vs-parquet here. */
class StoreAdapterSpec extends SparkSpec {

  private def freshDir() =
    java.nio.file.Files.createTempDirectory("graft_adapter").toString

  private def sampleDocs(n: Int) = {
    val spark2 = spark
    import spark2.implicits._
    (0 until n).map(i => (i.toLong, s"doc $i content", i.toLong)).toDF(
      "doc_id", "content", "ver")
  }

  test("registry: built-ins, duplicate rejection, unknown provider, custom registration") {
    AdapterRegistry.clear()
    assert(AdapterRegistry.hasProvider("memory"))
    assert(AdapterRegistry.hasProvider("parquet"))
    intercept[IllegalArgumentException] {
      AdapterRegistry.register("memory", _ => new MemoryAdapter)
    }
    intercept[IllegalArgumentException] {
      AdapterRegistry.create(StoreConfig("sqlite"))
    }
    // custom adapter registration is first-class (reference
    // registry.ts:78-84): register, resolve, use, unregister
    AdapterRegistry.register("custom-mem", _ => new MemoryAdapter)
    val a = AdapterRegistry.create(StoreConfig("custom-mem"))
    a.insertBatch(sampleDocs(3))
    assert(a.count(spark) === 3)
    assert(AdapterRegistry.unregister("custom-mem"))
    assert(!AdapterRegistry.hasProvider("custom-mem"))
    // parquet without a path is a config error
    intercept[IllegalArgumentException] {
      AdapterRegistry.create(StoreConfig("parquet"))
    }
  }

  test("memory and parquet adapters are operation-for-operation equivalent") {
    val spark2 = spark
    import spark2.implicits._
    val mem = AdapterRegistry.create(StoreConfig("memory"))
    val pq = AdapterRegistry.create(
      StoreConfig("parquet", Some(freshDir())))
    val both = Seq(mem, pq)

    both.foreach(_.insertBatch(sampleDocs(10)))
    both.foreach(a => assert(a.count(spark) === 10))

    // second insert batch appends
    val more = Seq((10L, "doc 10 content", 10L), (11L, "doc 11 content", 11L))
      .toDF("doc_id", "content", "ver")
    both.foreach(_.insertBatch(more))
    both.foreach(a => assert(a.count(spark) === 12))

    // point lookup
    both.foreach { a =>
      val row = a.get(spark, "doc_id", 7L).collect()
      assert(row.length === 1 && row.head.getAs[String]("content") === "doc 7 content")
    }

    // delete a batch of ids
    val ids = Seq(1L, 3L, 11L).toDF("doc_id")
    both.foreach(_.delete(spark, ids, "doc_id"))
    both.foreach(a => assert(a.count(spark) === 9))
    both.foreach(a => assert(a.get(spark, "doc_id", 3L).isEmpty))

    // upsert: replace doc 2, add doc 12; keep-latest by version
    val updates = Seq((2L, "doc 2 REVISED", 99L), (12L, "doc 12 content", 12L))
      .toDF("doc_id", "content", "ver")
    both.foreach(_.upsert(spark, updates, "doc_id", "ver"))
    both.foreach { a =>
      assert(a.count(spark) === 10)
      assert(a.get(spark, "doc_id", 2L).head.getAs[String]("content")
        === "doc 2 REVISED")
    }

    // final contents identical across adapters
    val m = mem.readAll(spark).orderBy("doc_id").collect().toSeq
    val p = pq.readAll(spark).select("doc_id", "content", "ver")
      .orderBy("doc_id").collect().toSeq
    assert(m === p)

    // info contract (reference getInfo)
    assert(mem.info("provider") === "memory")
    assert(pq.info("provider") === "parquet")
    assert(pq.info("version") === "2") // delete + upsert = two staged rewrites
    mem.close(); pq.close()
  }
}
