package graft
package streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingIngestSpec extends SparkSpec {

  private val t0 = Timestamp.valueOf("2026-01-02 03:04:05")

  test("stream of docs lands in the same store, searchable immediately") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext

    val root = Files.createTempDirectory("graft_sink")
    val store = s"$root/store"

    val stream = MemoryStream[(String, String)]
    val q = StreamingIngest.start(
      stream.toDF().toDF("title", "text"), store, s"$root/ckpt", t0)
    try {
      stream.addData(("doc-a", "walrus iguana pelican " * 60))
      q.processAllAvailable()
      stream.addData(("doc-b", "borscht gazpacho chowder " * 60))
      q.processAllAvailable()
    } finally q.stop()

    val chunks = spark.read.parquet(s"$store/chunks")
    assert(chunks.select("sourceId").distinct().count() === 2)
    // batch search API works over the streamed store
    val hits = api.IndexPipeline.search(spark, store, "gazpacho chowder", k = 2)
    assert(hits.count() > 0)
    assert(hits.head.getAs[String]("sourceType") === "stream")
  }
}
