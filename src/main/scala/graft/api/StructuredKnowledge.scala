package graft.api

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Q8 structured-knowledge store (reference
  * `src/mcp/utils/structured-knowledge.ts:15-66`): topic → markdown
  * artifacts in a cache directory, slug-named, listable. Driver-side
  * file IO by design — these are agent-session artifacts, not data. */
object StructuredKnowledge {

  def slugOf(topic: String): String =
    topic.toLowerCase.replaceAll("[^a-z0-9]+", "-")
      .stripPrefix("-").stripSuffix("-").take(64)

  def write(dir: Path, topic: String, markdown: String): Path = {
    Files.createDirectories(dir)
    val f = dir.resolve(slugOf(topic) + ".md")
    Files.writeString(f, s"# $topic\n\n$markdown",
      StandardCharsets.UTF_8)
    f
  }

  def read(dir: Path, topic: String): Option[String] = {
    val f = dir.resolve(slugOf(topic) + ".md")
    if (Files.exists(f)) Some(Files.readString(f, StandardCharsets.UTF_8))
    else None
  }

  def topics(dir: Path): Seq[String] =
    if (!Files.exists(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".md"))
      .map(_.stripSuffix(".md"))
      .toSeq.sorted
}

/** `gistdex_read_cached` MCP tool analogue (reference
  * `src/mcp/tools/read-cached-tool.ts`): one call surfaces the
  * persisted query cache and/or the structured-knowledge topics, with
  * an optional single-topic filter. */
object ReadCached {

  case class KnowledgeEntry(file: String, topic: String, content: String)
  case class Result(queries: Option[String], knowledge: Seq[KnowledgeEntry])

  /** `readType` ∈ queries | knowledge | all (reference default all). */
  def read(queriesFile: Option[Path], knowledgeDir: Path,
      readType: String = "all", topic: Option[String] = None): Result = {
    val wantQ = readType == "queries" || readType == "all"
    val wantK = readType == "knowledge" || readType == "all"
    val q = if (wantQ)
      queriesFile.filter(Files.exists(_))
        .map(Files.readString(_, StandardCharsets.UTF_8))
    else None
    val k = if (wantK) {
      val names = topic match {
        case Some(t) => Seq(StructuredKnowledge.slugOf(t))
          .filter(s => StructuredKnowledge.topics(knowledgeDir).contains(s))
        case None => StructuredKnowledge.topics(knowledgeDir)
      }
      names.map { slug =>
        KnowledgeEntry(s"$slug.md", slug,
          Files.readString(knowledgeDir.resolve(s"$slug.md"),
            StandardCharsets.UTF_8))
      }
    } else Seq.empty
    Result(q, k)
  }
}
