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
