package graft.api

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.Base64

import scala.collection.mutable

/** Q7 query cache (reference `src/mcp/utils/query-cache.ts:27-225`):
  * remember the last N successful queries; `findSimilar` returns an
  * exact match, else the most recent cached query whose keyword set is
  * ≥70% contained in the new query's keywords.
  *
  * Driver-side state (the reference persists JSON+markdown in a cache
  * dir; here a line-oriented file via injectable path — no
  * dependencies, reload-safe). Deliberately NOT a Spark job: the cache
  * holds ≤100 tiny records.
  */
class QueryCache(capacity: Int = 100, persistTo: Option[Path] = None) {

  case class Entry(query: String, keywords: Set[String], resultCount: Long,
      seq: Long)

  private val entries = mutable.ArrayBuffer.empty[Entry]
  private var counter = 0L

  persistTo.filter(Files.exists(_)).foreach { p =>
    Files.readAllLines(p, StandardCharsets.UTF_8).forEach { line =>
      line.split("\t") match {
        case Array(q64, n) =>
          val q = new String(Base64.getDecoder.decode(q64), StandardCharsets.UTF_8)
          record(q, n.toLong, persist = false)
        case _ => ()
      }
    }
  }

  private def keywordsOf(q: String): Set[String] =
    q.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet

  def record(query: String, resultCount: Long, persist: Boolean = true): Unit = {
    counter += 1
    entries += Entry(query, keywordsOf(query), resultCount, counter)
    if (entries.length > capacity) entries.remove(0)
    if (persist) persistTo.foreach { p =>
      Files.writeString(p,
        entries.map(e => Base64.getEncoder.encodeToString(
          e.query.getBytes(StandardCharsets.UTF_8)) + "\t" + e.resultCount)
          .mkString("", "\n", "\n"))
    }
  }

  /** Exact match first; else ≥70% of a cached entry's keywords appear
    * in the new query's keywords; most recent wins. */
  def findSimilar(query: String): Option[String] = {
    entries.reverseIterator.find(_.query == query).map(_.query).orElse {
      val kw = keywordsOf(query)
      entries.reverseIterator.find { e =>
        e.keywords.nonEmpty &&
          e.keywords.count(kw.contains).toDouble / e.keywords.size >= 0.7
      }.map(_.query)
    }
  }

  def size: Int = entries.length
}

/** O5 cursor pagination (reference `agent-query-tool.ts:784-807,
  * 876-895`): opaque base64 `offset:query` cursors over a
  * deterministically-ordered result. */
object Cursor {

  def encode(offset: Int, query: String): String =
    Base64.getEncoder.encodeToString(
      s"$offset:$query".getBytes(StandardCharsets.UTF_8))

  def decode(cursor: String): Option[(Int, String)] =
    try {
      val s = new String(Base64.getDecoder.decode(cursor), StandardCharsets.UTF_8)
      val i = s.indexOf(':')
      if (i < 1) None else Some((s.substring(0, i).toInt, s.substring(i + 1)))
    } catch { case _: Exception => None }

  /** Page a deterministically-ordered DataFrame; returns the page and
    * the next cursor (None when exhausted). */
  def page(df: org.apache.spark.sql.DataFrame, query: String,
      cursor: Option[String], pageSize: Int)
      : (org.apache.spark.sql.DataFrame, Option[String]) = {
    val offset = cursor.flatMap(decode).filter(_._2 == query).map(_._1).getOrElse(0)
    val pageDf = df.offset(offset).limit(pageSize)
    val next =
      if (pageDf.count() < pageSize) None
      else Some(encode(offset + pageSize, query))
    (pageDf, next)
  }
}
