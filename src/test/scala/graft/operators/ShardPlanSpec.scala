package graft
package operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.embed.Embedder.hash60Col

/** Training-shard plan: the two-pass segmented global rank must equal
  * the single-window formulation row-for-row, and the manifest must
  * satisfy the invariants a trainer relies on (full-size shards except
  * the tail, lossless doc accounting). */
class ShardPlanSpec extends SparkSpec {

  test("q_shard_plan equals the single-window global-rank twin") {
    val twin = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"),
        hash60Col(concat(lit("shard:"), col("doc_id").cast("string")))
          .as("h"),
        hash60Col(col("text")).as("ch"))
      .withColumn("rk", row_number().over(Window.orderBy("h", "doc_id")))
      .withColumn("shard_id", expr(s"(rk - 1) div ${Curation.ShardDocs}"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_bytes"),
        expr("CAST(sum(CAST(ch AS DECIMAL(38,0))) % 1152921504606846976 AS BIGINT)")
          .as("checksum"))
      .orderBy("shard_id")
      .collect()
    val got = Curation.qShardPlan(spark, sfDir).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq ===
      twin.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq)
  }

  test("writeShards round-trip: read-back audit matches the manifest " +
      "shard-for-shard") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_shards").toString
    Curation.writeShards(spark, sfDir, out)
    val audit = Curation.verifyShards(spark, out).collect()
    assert(audit.length ===
      Curation.qShardPlan(spark, sfDir).count())
    assert(audit.forall(_.getBoolean(5)), audit.mkString("\n"))
    // the written layout really is shard-partitioned directories
    assert(new java.io.File(s"$out/shards").listFiles()
      .exists(_.getName.startsWith("shard_id=")))

    // corruption drill: delete one shard directory (the partial-copy
    // failure the audit exists for) — its row must read ok=FALSE, not
    // NULL, and every other shard must still verify
    val victim = new java.io.File(s"$out/shards").listFiles()
      .filter(_.getName.startsWith("shard_id=")).head
    val victimId = victim.getName.stripPrefix("shard_id=").toLong
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(victim)
    val after = Curation.verifyShards(spark, out).collect()
    assert(after.length === audit.length)
    after.foreach { r =>
      assert(!r.isNullAt(5), s"ok must never be NULL: $r")
      assert(r.getBoolean(5) === (r.getLong(0) != victimId), r.toString)
    }
  }

  test("q_shard_plan invariants: contiguous ids, full shards except " +
      "the tail, lossless doc and byte accounting") {
    val rows = Curation.qShardPlan(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
    assert(rows.map(_.getLong(0)).toSeq === rows.indices.map(_.toLong))
    rows.dropRight(1).foreach(r =>
      assert(r.getLong(1) === Curation.ShardDocs))
    assert(rows.last.getLong(1) <= Curation.ShardDocs)
    assert(rows.map(_.getLong(1)).sum === docs.count())
    assert(rows.map(_.getLong(2)).sum ===
      docs.agg(sum("n_chars")).head.getLong(0))
  }
}
