package graft.store

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Pluggable storage contract — the engine's analogue of the
  * reference's `VectorDBAdapter` (types.ts:74-94) and its adapter
  * registry (registry.ts:23-140).
  *
  * Design shift, deliberate: the reference puts `search` INSIDE the
  * adapter because every backend (sqlite-vec, DuckDB VSS, JS Map) has
  * its own kNN machinery. In Spark the scan is the substrate — an
  * adapter's job ends at producing/maintaining a DataFrame; scoring,
  * filtering, top-k, and analytics are the same Catalyst plans
  * regardless of backing store (`Search`, `IndexPipeline`). So the
  * contract keeps the storage verbs (insert/read/get/delete/upsert/
  * count/info/close) and drops the query verbs, which compose on top.
  */
trait StoreAdapter {

  /** Append a batch of rows (the reference's insert/insertBatch — one
    * columnar write, never a row loop). */
  def insertBatch(df: DataFrame): Unit

  /** The full store as a DataFrame — the substrate every query plan
    * starts from (list/count/search are transformations of this). */
  def readAll(spark: SparkSession): DataFrame

  /** Point lookup by id (S10) — pushdown-friendly. */
  def get(spark: SparkSession, idCol: String, id: Any): DataFrame =
    readAll(spark).filter(col(idCol) === lit(id))

  /** Delete by id set (S9, anti-join rewrite). */
  def delete(spark: SparkSession, ids: DataFrame, idCol: String): Unit

  /** Upsert = union + keep-latest per key (S8). */
  def upsert(spark: SparkSession, updates: DataFrame, idCol: String,
      versionCol: String): Unit

  def count(spark: SparkSession): Long = readAll(spark).count()

  /** Reference `getInfo` — provider/version/capabilities. */
  def info: Map[String, String]

  def close(): Unit = ()
}

/** Adapter construction config (reference `VectorDBConfig`). */
case class StoreConfig(provider: String, path: Option[String] = None,
    options: Map[String, String] = Map.empty)

/** Parquet-backed adapter with staged-rewrite versioning: mutations
  * (delete/upsert) write a fresh `v{n+1}` directory and flip the
  * current-version pointer — parquet files are immutable, so in-place
  * mutation is a rewrite by construction. At 100 TB the pointer flip
  * is what a table format (Delta/Iceberg) does transactionally; the
  * dataflow below is identical. */
class ParquetAdapter(base: String) extends StoreAdapter {
  private var version = 0
  private def dir(v: Int) = s"$base/v$v"
  private var initialized = false

  private def stage(spark: SparkSession)(f: DataFrame => DataFrame): Unit = {
    val next = f(readAll(spark))
    ChunkStore.write(next, dir(version + 1))
    version += 1
  }

  override def insertBatch(df: DataFrame): Unit = {
    if (!initialized) {
      ChunkStore.write(df, dir(version))
      initialized = true
    } else {
      // columnar append into the current version directory
      ChunkStore.write(df, dir(version), mode = SaveMode.Append)
    }
  }

  override def readAll(spark: SparkSession): DataFrame =
    ChunkStore.read(spark, dir(version))

  override def delete(spark: SparkSession, ids: DataFrame,
      idCol: String): Unit =
    stage(spark)(_.join(broadcast(ids.select(col(idCol))), Seq(idCol),
      "left_anti"))

  override def upsert(spark: SparkSession, updates: DataFrame, idCol: String,
      versionCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy(desc(versionCol))
    stage(spark)(_.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn"))
  }

  override def info: Map[String, String] = Map(
    "provider" -> "parquet",
    "version" -> version.toString,
    "path" -> dir(version),
    "capabilities" -> "columnar-scan,pushdown,partition-pruning,staged-rewrite")
}

/** In-memory adapter (reference memory-adapter.ts — a `Map` there, a
  * held DataFrame here). Test/dev scale: the data still lives in
  * executors, but mutations rebuild the lineage eagerly. */
class MemoryAdapter extends StoreAdapter {
  private var data: Option[DataFrame] = None

  override def insertBatch(df: DataFrame): Unit =
    data = Some(data.fold(df)(_.unionByName(df)).localCheckpoint(eager = true))

  override def readAll(spark: SparkSession): DataFrame =
    data.getOrElse(spark.emptyDataFrame)

  override def delete(spark: SparkSession, ids: DataFrame,
      idCol: String): Unit =
    data = data.map(_.join(broadcast(ids.select(col(idCol))), Seq(idCol),
      "left_anti").localCheckpoint(eager = true))

  override def upsert(spark: SparkSession, updates: DataFrame, idCol: String,
      versionCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol).orderBy(desc(versionCol))
    data = data.map(_.unionByName(updates)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .localCheckpoint(eager = true))
  }

  override def info: Map[String, String] = Map(
    "provider" -> "memory",
    "version" -> "1.0.0",
    "capabilities" -> "vector-search,metadata-filter,batch-operations")

  override def close(): Unit = data = None
}

/** Adapter registry (reference registry.ts): named factories with
  * duplicate-registration rejection, unknown-provider errors, custom
  * registration, and built-ins pre-registered. Thread-safe — a Spark
  * driver may serve concurrent sessions. */
object AdapterRegistry {
  type Factory = StoreConfig => StoreAdapter

  private val adapters =
    scala.collection.mutable.LinkedHashMap.empty[String, Factory]

  private def builtins(): Unit = {
    adapters("memory") = _ => new MemoryAdapter
    adapters("parquet") = cfg => new ParquetAdapter(cfg.path.getOrElse(
      throw new IllegalArgumentException("parquet adapter requires a path")))
  }
  builtins()

  def register(provider: String, factory: Factory): Unit = synchronized {
    if (adapters.contains(provider))
      throw new IllegalArgumentException(
        s"Adapter already registered for provider: $provider")
    adapters(provider) = factory
  }

  def create(config: StoreConfig): StoreAdapter = synchronized {
    adapters.getOrElse(config.provider,
      throw new IllegalArgumentException(
        s"No adapter registered for provider: ${config.provider}"))(config)
  }

  def listProviders: Seq[String] = synchronized(adapters.keys.toSeq)

  def hasProvider(provider: String): Boolean =
    synchronized(adapters.contains(provider))

  def unregister(provider: String): Boolean =
    synchronized(adapters.remove(provider).isDefined)

  /** Reset to built-ins (reference `clear` + re-init; test hook). */
  def clear(): Unit = synchronized {
    adapters.clear()
    builtins()
  }
}
