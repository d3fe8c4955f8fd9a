package graft
package model

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Quality}

/** Artifact publish/load round-trips: the loaded model must serve
  * byte-identical results to the in-session model, publishes must be
  * atomic (no staging residue, clean overwrite). */
class ArtifactsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_artifacts").toString

  test("NB model round-trips: loaded artifact scores identically") {
    val docs = Tables.documents(spark, sfDir)
    val m = Quality.nbTrain(docs.filter(col("doc_id") % 5 =!= 0))
    val path = tmp() + "/nb"
    Artifacts.saveNb(m, path)
    val loaded = Artifacts.loadNb(spark, path)
    val ho = docs.filter(col("doc_id") % 5 === 0)
    val direct = Quality.nbScore(ho, m, carry = Seq("source"))
    val viaDisk = Quality.nbScore(ho, loaded, carry = Seq("source"))
    assert(viaDisk.exceptAll(direct).isEmpty &&
      direct.exceptAll(viaDisk).isEmpty)
    // no staging residue; single-file layout per table
    assert(!new java.io.File(path + ".staging").exists())
    assert(new java.io.File(s"$path/priors.parquet").listFiles()
      .count(_.getName.endsWith(".parquet")) === 1)
  }

  test("BPE merge table round-trips: loaded artifact encodes " +
      "identically") {
    val merges = Curation.bpeTrain(spark, sfDir, Curation.BpeMerges)
    val path = tmp() + "/bpe"
    Artifacts.saveBpe(merges, path)
    val loaded = Artifacts.loadBpe(spark, path)
    val direct = Curation.bpeEncode(spark, sfDir, merges)
    val viaDisk = Curation.bpeEncode(spark, sfDir, loaded)
    assert(viaDisk.exceptAll(direct).isEmpty &&
      direct.exceptAll(viaDisk).isEmpty)
  }

  test("re-publish atomically replaces the previous artifact") {
    val spark2 = spark
    import spark2.implicits._
    val path = tmp() + "/t"
    Artifacts.publish(Seq((1L, "a")).toDF("k", "v"), path)
    Artifacts.publish(Seq((2L, "b"), (3L, "c")).toDF("k", "v"), path)
    val got = Artifacts.load(spark, path).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === Seq((2L, "b"), (3L, "c")))
    assert(!new java.io.File(path + ".staging").exists())
  }
}
