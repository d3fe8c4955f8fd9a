package graft.api

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.store.{AdapterRegistry, StoreAdapter, StoreConfig}

/** Configuration discovery + defaults (reference
  * `src/core/config/config-operations.ts:53-138`,
  * `src/core/utils/config-merger.ts:39-71`): walk the discovery chain,
  * first parseable file wins (parse failures skip to the next path —
  * the reference's try/continue), deep-merge the partial config over
  * the defaults.
  *
  * JVM mapping notes: `.ts`/`.js` config modules have no JVM analogue
  * — JSON files only; the reference's dynamic-import custom adapters
  * (config-operations.ts:150-200) become fully-qualified class names
  * loaded reflectively and registered in [[AdapterRegistry]]. Default
  * provider is `parquet` (the engine's canonical store) where the
  * reference defaults to `sqlite`; every other default value is the
  * reference's.
  */
object GraftConfig {

  val Defaults: JValue = JsonMethods.parse(
    """{
      |  "vectorDB": {"provider": "parquet",
      |               "options": {"path": "./graft.db", "dimension": 768}},
      |  "embedding": {"model": "hashing-tf-768", "dimension": 768},
      |  "indexing": {"chunkSize": 1000, "chunkOverlap": 200,
      |               "batchSize": 100, "preserveBoundaries": true},
      |  "search": {"defaultK": 10, "enableRerank": true,
      |             "rerankBoostFactor": 1.5, "hybridKeywordWeight": 0.3},
      |  "ci": {"doc": {"threshold": 0.7,
      |                 "documentPaths": ["docs/**/*.md", "README.md"]}}
      |}""".stripMargin)

  /** Reference path list (config-operations.ts:60-67), `.ts`/`.js`
    * entries excluded. */
  def discoveryPaths(cwd: Path, home: Path): Seq[Path] = Seq(
    cwd.resolve("graft.config.json"),
    cwd.resolve(".graftrc.json"),
    home.resolve(".graft").resolve("config.json"))

  private def parseFile(p: Path): Option[JValue] =
    if (!Files.exists(p)) None
    else scala.util.Try(
      JsonMethods.parse(Files.readString(p, StandardCharsets.UTF_8))).toOption

  private def deep(user: JValue, defaults: JValue,
      replaceArrays: Boolean): JValue = (user, defaults) match {
    case (JObject(u), JObject(d)) =>
      val userKeys = u.map(_._1).toSet
      JObject(u.map { case (k, uv) =>
        k -> d.collectFirst { case (`k`, dv) => deep(uv, dv, replaceArrays) }
          .getOrElse(uv)
      } ++ d.filterNot { case (k, _) => userKeys(k) })
    case (JArray(u), JArray(d)) => if (replaceArrays) JArray(u)
      else JArray(u ++ d)
    case (JNothing | JNull, d) => d
    case (u, _) => u
  }

  /** defu-style deep merge (reference `config-merger.ts:
    * mergeGistdexConfig`): USER values win over defaults for scalars,
    * objects merge recursively, arrays concatenate with the user's
    * elements FIRST. (json4s `JValue.merge` is the wrong tool here:
    * it appends user array elements after the defaults', so a user
    * could never put their entry ahead of a default.) */
  def mergeDefu(user: JValue, defaults: JValue): JValue =
    deep(user, defaults, replaceArrays = false)

  /** The reference's `mergeWithArrayReplace` (config-merger.ts:28-34):
    * defu merge, except a user array replaces the default array
    * WHOLESALE — setting `ci.doc.documentPaths` overrides the default
    * globs instead of accumulating alongside them. */
  def mergeArrayReplace(user: JValue, defaults: JValue): JValue =
    deep(user, defaults, replaceArrays = true)

  /** First parseable file in the chain, merged over defaults with
    * array-replace semantics (a configured array overrides its
    * default); empty chain → pure defaults. */
  def load(cwd: Path, home: Path): GraftConfig =
    new GraftConfig(discoveryPaths(cwd, home).iterator
      .flatMap(parseFile(_).iterator)
      .nextOption()
      .fold(Defaults)(mergeArrayReplace(_, Defaults)))

  def loadFile(p: Path): GraftConfig =
    new GraftConfig(parseFile(p).fold(Defaults)(mergeArrayReplace(_, Defaults)))

  /** Reference `save` — pretty JSON to the given path. */
  def save(cfg: JValue, path: Path): Unit = {
    Files.createDirectories(
      Option(path.toAbsolutePath.getParent).getOrElse(path.toAbsolutePath))
    Files.writeString(path, JsonMethods.pretty(JsonMethods.render(cfg)),
      StandardCharsets.UTF_8)
  }
}

class GraftConfig(val json: JValue) {
  private def str(path: String*) : Option[String] =
    path.foldLeft(json)(_ \ _) match {
      case JString(s) => Some(s); case _ => None
    }
  private def num(path: String*): Option[Double] =
    path.foldLeft(json)(_ \ _) match {
      case JInt(i) => Some(i.toDouble)
      case JDouble(d) => Some(d)
      case JDecimal(d) => Some(d.toDouble)
      case _ => None
    }
  private def bool(path: String*): Option[Boolean] =
    path.foldLeft(json)(_ \ _) match {
      case JBool(b) => Some(b); case _ => None
    }

  def provider: String = str("vectorDB", "provider").getOrElse("parquet")
  def dbPath: String = str("vectorDB", "options", "path").getOrElse("./graft.db")
  def dimension: Int =
    num("vectorDB", "options", "dimension").getOrElse(768.0).toInt
  def chunkSize: Int = num("indexing", "chunkSize").getOrElse(1000.0).toInt
  def chunkOverlap: Int = num("indexing", "chunkOverlap").getOrElse(200.0).toInt
  def batchSize: Int = num("indexing", "batchSize").getOrElse(100.0).toInt
  def preserveBoundaries: Boolean =
    bool("indexing", "preserveBoundaries").getOrElse(true)
  def defaultK: Int = num("search", "defaultK").getOrElse(10.0).toInt
  def enableRerank: Boolean = bool("search", "enableRerank").getOrElse(true)
  def rerankBoostFactor: Double =
    num("search", "rerankBoostFactor").getOrElse(1.5)
  def hybridKeywordWeight: Double =
    num("search", "hybridKeywordWeight").getOrElse(0.3)
  def ciThreshold: Double = num("ci", "doc", "threshold").getOrElse(0.7)
  def documentPaths: Seq[String] = json \ "ci" \ "doc" \ "documentPaths" match {
    case JArray(vs) => vs.collect { case JString(s) => s }
    case _ => Seq("docs/**/*.md", "README.md")
  }

  /** `customAdapters`: provider → fully-qualified class name of a
    * `StoreConfig => StoreAdapter` factory (the JVM analogue of the
    * reference's module-path dynamic import). */
  def customAdapters: Map[String, String] = json \ "customAdapters" match {
    case JObject(fields) =>
      fields.collect { case (k, JString(v)) => k -> v }.toMap
    case _ => Map.empty
  }

  /** Load + register every configured custom adapter; returns the
    * providers registered (already-registered names are skipped, as
    * the reference's registry refuses duplicates). */
  def registerCustomAdapters(): Seq[String] =
    customAdapters.toSeq.sortBy(_._1).flatMap { case (provider, className) =>
      if (AdapterRegistry.hasProvider(provider)) None
      else scala.util.Try {
        val factory = Class.forName(className)
          .getDeclaredConstructor().newInstance()
          .asInstanceOf[StoreConfig => StoreAdapter]
        AdapterRegistry.register(provider, factory)
        provider
      }.toOption
    }

  /** Build the configured store adapter. */
  def createAdapter(): StoreAdapter =
    AdapterRegistry.create(StoreConfig(provider, Some(dbPath)))
}
