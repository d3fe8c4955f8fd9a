package graft.api

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.Base64

import scala.collection.mutable

/** Q7 query cache (reference `src/mcp/utils/query-cache.ts:27-225`):
  * remember the last N successful queries; `findSimilar` returns an
  * exact (case-insensitive) match, else the most recent cached query
  * that contains ≥70% of the NEW query's keywords (length>3, substring
  * containment) — `query-cache.ts:203-212`.
  *
  * Driver-side state (the reference persists JSON+markdown in a cache
  * dir; here a line-oriented file via injectable path — no
  * dependencies, reload-safe). Deliberately NOT a Spark job: the cache
  * holds ≤100 tiny records.
  */
class QueryCache(capacity: Int = 100, persistTo: Option[Path] = None) {

  case class Entry(query: String, resultCount: Long, seq: Long)

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

  def record(query: String, resultCount: Long, persist: Boolean = true): Unit = {
    counter += 1
    entries += Entry(query, resultCount, counter)
    if (entries.length > capacity) entries.remove(0)
    if (persist) persistTo.foreach { p =>
      Files.writeString(p,
        entries.map(e => Base64.getEncoder.encodeToString(
          e.query.getBytes(StandardCharsets.UTF_8)) + "\t" + e.resultCount)
          .mkString("", "\n", "\n"))
    }
  }

  /** Exact (case-insensitive) match first; else the most recent cached
    * query containing ≥70% of the new query's keywords. Keywords = the
    * NEW query's lowercase whitespace tokens of length > 3; a keyword
    * "matches" when it appears as a substring of the cached query text
    * (`query-cache.ts:203-212` — note the direction: new-query
    * keywords tested against cached text, not the reverse; an empty
    * keyword list matches everything, 0 >= 0, exactly as the
    * reference's filter does). */
  def findSimilar(query: String): Option[String] = {
    val qLower = query.toLowerCase
    entries.reverseIterator.find(_.query.toLowerCase == qLower).map(_.query)
      .orElse {
        val keywords = qLower.split("\\s+").filter(_.length > 3).toSeq
        entries.reverseIterator.find { e =>
          val cached = e.query.toLowerCase
          keywords.count(cached.contains) >= keywords.length * 0.7
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
