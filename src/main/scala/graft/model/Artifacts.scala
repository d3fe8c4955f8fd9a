package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Quality

/** Versioned-publish store for trained model artifacts — the BPE merge
  * table ([[graft.operators.Curation.bpeTrain]]), the NB classifier
  * ([[Quality.nbTrain]]), and any other bounded model table. Completes
  * each model family's lifecycle the way the IVF index already has it
  * (build → sealed artifact → serve): train → [[publish]] → load →
  * serve, with the same atomicity discipline as
  * [[graft.operators.Ann.resealIndex]] — write everything under
  * `<path>.staging`, then delete-and-rename, so a reader never
  * observes a half-written artifact. Model tables are bounded (merge
  * budget / V×C), so a single-file parquet per table is the right
  * layout: one broadcast-able file, no small-file fan-out.
  */
object Artifacts {

  /** Crash-safe publish swap, shared by every artifact/index publisher
    * (NB/BPE tables, [[graft.operators.Ann.resealIndex]], the
    * streaming delta re-seal): rename the live directory ASIDE, rename
    * the staged one in, then delete the old. A plain delete-then-
    * rename leaves a window the length of a recursive delete (O(files)
    * metadata ops) where a crash destroys the ONLY copy; here the
    * no-artifact window is a single rename, and a crash at any point
    * leaves a recoverable copy (live at `dst`, or aside at
    * `dst.old` — cleaned up on the next publish). */
  private[graft] def swap(spark: SparkSession, tmp: String,
      dst: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    val fs = dstPath.getFileSystem(conf)
    val old = new org.apache.hadoop.fs.Path(dst + ".old")
    fs.delete(old, true) // leftover from a prior crash
    if (fs.exists(dstPath))
      require(fs.rename(dstPath, old),
        s"artifact swap: could not move live aside: $dst")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dstPath),
      s"artifact publish swap failed: $tmp -> $dst")
    fs.delete(old, true)
  }

  /** Atomically publish one bounded model table at `path`. */
  def publish(df: DataFrame, path: String): Unit = {
    val tmp = path + ".staging"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    swap(df.sparkSession, tmp, path)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Publish the three NB tables as ONE atomic artifact directory —
    * a reader can never see priors from one training run and
    * likelihoods from another. */
  def saveNb(m: Quality.NbModel, path: String): Unit = {
    val spark = m.priors.sparkSession
    val tmp = path + ".staging"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    m.wordLik.coalesce(1).write.parquet(s"$tmp/word_lik.parquet")
    m.priors.coalesce(1).write.parquet(s"$tmp/priors.parquet")
    m.unseen.coalesce(1).write.parquet(s"$tmp/unseen.parquet")
    swap(spark, tmp, path)
  }

  def loadNb(spark: SparkSession, path: String): Quality.NbModel =
    Quality.NbModel(
      spark.read.parquet(s"$path/word_lik.parquet"),
      spark.read.parquet(s"$path/priors.parquet"),
      spark.read.parquet(s"$path/unseen.parquet"))

  /** BPE merge-table publish/load ([[publish]]/[[load]] with the
    * ranked-merges column contract documented at one site). */
  def saveBpe(merges: DataFrame, path: String): Unit = publish(merges, path)

  def loadBpe(spark: SparkSession, path: String): DataFrame =
    load(spark, path).select("rank", "left", "right", "pair_count")
}
