package graft.pipeline

import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Feed-registry loader: parses the reference's `feeds_config.yaml`
  * shape into [[FeedConfig]]s (ref: api_utils.py:29-55,
  * definitions.py:16).
  *
  * Mirrored semantics:
  *  - missing file → no feeds (api_utils.py:31-33 returns `{}`)
  *  - empty/comment-only file → no feeds (api_utils.py:36 `if config`)
  *  - `custom_feeds.<id>`: `url` required (api_utils.py:48 indexes it —
  *    here a clear error instead of a KeyError), `api_token` and
  *    `headers` optional (api_utils.py:50-51 `.get`)
  *  - empty-string api_token behaves as absent (api_utils.py:18
  *    `if api_token:` — Python falsy)
  *
  * The parser covers the YAML subset the reference's config uses —
  * nested block mappings by 2-space-style indentation, `#` comments,
  * single/double-quoted or bare scalars, and inline `{}` — with no
  * external dependency (the runtime ships no YAML jar).
  */
object FeedRegistry {

  /** Parsed YAML subset: a mapping whose values are strings or nested
    * mappings. */
  sealed trait Node
  final case class Scalar(value: String) extends Node
  final case class Mapping(entries: Vector[(String, Node)]) extends Node {
    def get(key: String): Option[Node] = entries.find(_._1 == key).map(_._2)
  }

  /** Load the registry; a missing path yields no feeds. */
  def load(path: String): Seq[FeedConfig] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Seq.empty
    else parse(Files.readString(p))
  }

  /** Parse a feeds_config.yaml document. */
  def parse(text: String): Seq[FeedConfig] = {
    val root = parseMapping(text)
    root.get("custom_feeds") match {
      case Some(m: Mapping) =>
        m.entries.map {
          case (id, feed: Mapping) =>
            val url = feed.get("url") match {
              case Some(Scalar(u)) if u.nonEmpty => u
              case _ => throw new IllegalArgumentException(
                s"feed '$id' has no url in feeds config")
            }
            val token = feed.get("api_token") match {
              case Some(Scalar(t)) if t.nonEmpty => Some(t) // "" is absent
              case _ => None
            }
            val headers = feed.get("headers") match {
              case Some(hm: Mapping) =>
                hm.entries.collect { case (k, Scalar(v)) => k -> v }.toMap
              case _ => Map.empty[String, String]
            }
            FeedConfig(id, url, token, headers)
          case (id, _) => throw new IllegalArgumentException(
            s"feed '$id' must be a mapping")
        }
      case _ => Seq.empty // no custom_feeds key (or scalar) → no feeds
    }
  }

  /** Indentation-based block-mapping parser for the subset above. */
  def parseMapping(text: String): Mapping = {
    val lines = text.linesIterator.zipWithIndex.flatMap { case (raw, n) =>
      val noComment = stripComment(raw)
      val trimmed = noComment.trim
      if (trimmed.isEmpty) None
      else Some((noComment.indexWhere(!_.isWhitespace), trimmed, n + 1))
    }.toVector
    val (node, rest) = parseBlock(lines, 0)
    require(rest.isEmpty, s"unparsed content at line ${rest.head._3}")
    node
  }

  private def parseBlock(
      lines: Vector[(Int, String, Int)], indent: Int): (Mapping, Vector[(Int, String, Int)]) = {
    val out = mutable.ArrayBuffer.empty[(String, Node)]
    var rest = lines
    while (rest.nonEmpty && rest.head._1 == indent) {
      val (_, line, n) = rest.head
      val colon = line.indexOf(':')
      require(colon > 0, s"expected 'key: value' at line $n: $line")
      val key = unquote(line.take(colon).trim)
      val value = line.drop(colon + 1).trim
      rest = rest.tail
      if (value.isEmpty) {
        // block value: children are any deeper-indented run (possibly none)
        if (rest.nonEmpty && rest.head._1 > indent) {
          val (child, r) = parseBlock(rest, rest.head._1)
          out += key -> child
          rest = r
        } else out += key -> Mapping(Vector.empty)
      } else if (value == "{}") out += key -> Mapping(Vector.empty)
      else out += key -> Scalar(unquote(value))
    }
    require(rest.isEmpty || rest.head._1 < indent,
      s"inconsistent indent at line ${rest.head._3}")
    (Mapping(out.toVector), rest)
  }

  /** Drop a trailing `#` comment — a hash outside quotes that starts
    * the line or follows whitespace (a bare `url: http://x#frag` keeps
    * its fragment, matching YAML's rule). A quote only OPENS a string
    * at a value position (line start or after `:`/whitespace) — an
    * apostrophe inside a plain scalar (`o'reilly`) is literal text,
    * as in YAML. */
  private def stripComment(s: String): String = {
    var inS = false; var inD = false
    var i = 0
    while (i < s.length) {
      val atValueStart = i == 0 || {
        val prev = s.charAt(i - 1)
        prev.isWhitespace || prev == ':'
      }
      s.charAt(i) match {
        case '\'' if !inD && (inS || atValueStart) => inS = !inS
        case '"' if !inS && (inD || atValueStart) => inD = !inD
        case '#' if !inS && !inD &&
            (i == 0 || s.charAt(i - 1).isWhitespace) =>
          return s.take(i)
        case _ =>
      }
      i += 1
    }
    s
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
