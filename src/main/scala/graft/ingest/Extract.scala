package graft.ingest

import java.nio.charset.StandardCharsets

/**
 * Normative HTML extraction functions.
 *
 * This is the engine's analog of the reference's wikitext parsing
 * (`WikiProcessor.kt:45-53`, which delegates link/redirect extraction to
 * bliki's `WikiPatternMatcher`): one pure, versioned implementation of
 *   html (binary) -> extracted text      (the byte-identical per-url invariant)
 *   html (binary) -> ordered link urls   (the reference's `[[links]]` analog)
 *   html (binary) -> redirect target     (the reference's `#REDIRECT` analog)
 *
 * Everything is deterministic, allocation-light, and usable both as plain
 * Scala functions (unit-testable without Spark) and through the registered
 * UDFs in [[ExtractFunctions]]. Golden tests in `ExtractSpec` freeze the
 * exact output bytes.
 *
 * Redirect analog (per FIXTURES.md §1): a page is a redirect iff its html
 * contains `<link rel="canonical" href="...">` pointing at a DIFFERENT
 * normalized url than the page's own, or `<meta http-equiv="refresh"
 * content="N;url=...">`. The target plays the role of the reference's
 * `#REDIRECT [[Target]]` (`WikiProcessor.kt:49-52`).
 */
object Extract {

  /** Version tag recorded in lineage; bump on ANY behavioral change. */
  val Version = "1.0.0"

  // ---------------------------------------------------------------------------
  // Text extraction: html bytes -> canonical text. The invariant surface.
  // ---------------------------------------------------------------------------

  /**
   * Strip tags, drop script/style bodies, decode the five core entities,
   * collapse runs of whitespace to single spaces, trim. The result is the
   * canonical `text` column — byte-identical per url across the pipeline
   * (north-rule invariant; mirrors the role of the reference's parsed
   * page text in `WikiProcessor.kt:45`).
   */
  def extractText(html: Array[Byte]): String = {
    if (html == null) return ""
    extractText(new String(html, StandardCharsets.UTF_8))
  }

  def extractText(html: String): String = {
    if (html == null) return ""
    val n = html.length
    val sb = new java.lang.StringBuilder(n / 2)
    var i = 0
    var lastWasSpace = true // leading whitespace is trimmed
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        // script/style: skip through the matching close tag, body included
        val lower = lowerTagAt(html, i)
        if (lower == "script" || lower == "style") {
          val close = indexOfIgnoreCase(html, "</" + lower, i)
          i = if (close < 0) n else html.indexOf('>', close) match {
            case -1 => n
            case e  => e + 1
          }
        } else {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
        }
        // tags are word boundaries: emit a single space separator
        if (!lastWasSpace && sb.length > 0) { sb.append(' '); lastWasSpace = true }
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(html, i)
        val isSpace = decoded == ' '
        if (!(isSpace && lastWasSpace)) {
          sb.append(decoded)
          lastWasSpace = isSpace
        }
        i = next
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') {
        if (!lastWasSpace) { sb.append(' '); lastWasSpace = true }
        i += 1
      } else {
        sb.append(c)
        lastWasSpace = false
        i += 1
      }
    }
    // trailing separator trim
    var len = sb.length
    while (len > 0 && sb.charAt(len - 1) == ' ') len -= 1
    sb.substring(0, len)
  }

  /** Decode `&amp; &lt; &gt; &quot; &#39;/&apos; &nbsp;` → (char, nextIndex). */
  private def decodeEntity(s: String, i: Int): (Char, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 8) return ('&', i + 1)
    s.substring(i + 1, semi) match {
      case "amp"          => ('&', semi + 1)
      case "lt"           => ('<', semi + 1)
      case "gt"           => ('>', semi + 1)
      case "quot"         => ('"', semi + 1)
      case "apos" | "#39" => ('\'', semi + 1)
      case "nbsp"         => (' ', semi + 1)
      case _              => ('&', i + 1)
    }
  }

  private def lowerTagAt(s: String, lt: Int): String = {
    var j = lt + 1
    val n = s.length
    val sb = new java.lang.StringBuilder(8)
    while (j < n && sb.length < 7) {
      val c = s.charAt(j)
      if (Character.isLetter(c)) { sb.append(Character.toLowerCase(c)); j += 1 }
      else j = n
    }
    sb.toString
  }

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length; val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var j = 0
      while (j < m && Character.toLowerCase(s.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == m) return i
      i += 1
    }
    -1
  }

  // ---------------------------------------------------------------------------
  // URL normalization: the join-key canonicalization (analog of the
  // reference's MediaWiki first-letter capitalization, `WikiProcessor.kt:114-121`)
  // ---------------------------------------------------------------------------

  /**
   * Canonicalize a url used as a graph key: lowercase scheme+host, strip
   * fragment, strip trailing slash on non-root paths, default ports removed.
   * Pure string transform — no network, no IDN.
   */
  def normalizeUrl(url: String): String = {
    if (url == null || url.isEmpty) return ""
    var u = url
    val frag = u.indexOf('#')
    if (frag >= 0) u = u.substring(0, frag)
    val schemeEnd = u.indexOf("://")
    if (schemeEnd > 0) {
      val hostStart = schemeEnd + 3
      var hostEnd = u.indexOf('/', hostStart)
      if (hostEnd < 0) hostEnd = u.length
      val scheme = u.substring(0, schemeEnd).toLowerCase
      var host = u.substring(hostStart, hostEnd).toLowerCase
      if (scheme == "http" && host.endsWith(":80")) host = host.dropRight(3)
      if (scheme == "https" && host.endsWith(":443")) host = host.dropRight(4)
      u = scheme + "://" + host + u.substring(hostEnd)
    }
    if (u.length > 1 && u.endsWith("/") && u.indexOf("://") != u.length - 3 &&
        u.count(_ == '/') > 3 - (if (u.contains("://")) 0 else 3)) {
      // strip trailing slash only when a path component exists
      val se = u.indexOf("://")
      val root = se >= 0 && u.indexOf('/', se + 3) == u.length - 1
      if (!root) u = u.dropRight(1)
    }
    u
  }

  /** Resolve an href against a base url (minimal RFC-3986 subset: absolute,
    * scheme-relative `//`, root-relative `/`, and path-relative). */
  def resolveHref(base: String, href: String): String = {
    if (href == null || href.isEmpty) return ""
    val h = href.trim
    if (h.startsWith("javascript:") || h.startsWith("mailto:") || h.startsWith("data:")) return ""
    if (h.contains("://")) return h
    val schemeEnd = base.indexOf("://")
    if (schemeEnd < 0) return h
    val scheme = base.substring(0, schemeEnd)
    if (h.startsWith("//")) return scheme + ":" + h
    val hostStart = schemeEnd + 3
    val pathStart = base.indexOf('/', hostStart)
    val origin = if (pathStart < 0) base else base.substring(0, pathStart)
    if (h.startsWith("/")) return origin + h
    if (h.startsWith("#")) return base
    // path-relative: resolve against the base's directory
    val basePath = if (pathStart < 0) "/" else base.substring(pathStart)
    val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
    origin + removeDotSegments(dir + h)
  }

  private def removeDotSegments(path: String): String = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    path.split("/", -1).foreach {
      case "" | "."  => // skip (we re-add separators below)
      case ".."      => if (out.nonEmpty) out.remove(out.length - 1)
      case seg       => out += seg
    }
    val trailing = path.endsWith("/") || path.endsWith("/.") || path.endsWith("/..")
    "/" + out.mkString("/") + (if (trailing && out.nonEmpty) "/" else "")
  }

  // ---------------------------------------------------------------------------
  // Link extraction: html bytes -> distinct normalized target urls
  // ---------------------------------------------------------------------------

  private val HrefAttr = """(?is)<a\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""".r

  /**
   * Extract `<a href>` targets, resolve against `baseUrl`, normalize,
   * drop self-links and empties, distinct preserving first-seen order
   * (mirrors per-page dedup `WikiProcessor.kt:53-55` / P5).
   */
  def extractLinks(html: Array[Byte], baseUrl: String): Seq[String] = {
    if (html == null) return Nil
    extractLinks(new String(html, StandardCharsets.UTF_8), baseUrl)
  }

  def extractLinks(html: String, baseUrl: String): Seq[String] = {
    if (html == null) return Nil
    val self = normalizeUrl(baseUrl)
    val seen = new scala.collection.mutable.LinkedHashSet[String]
    for (m <- HrefAttr.findAllMatchIn(html)) {
      val raw = Option(m.group(2)).orElse(Option(m.group(3))).orElse(Option(m.group(4))).getOrElse("")
      val u = normalizeUrl(resolveHref(baseUrl, unescapeAttr(raw)))
      if (u.nonEmpty && u != self) seen += u
    }
    seen.toVector
  }

  private def unescapeAttr(s: String): String =
    s.replace("&amp;", "&").replace("&quot;", "\"").replace("&#39;", "'")

  // ---------------------------------------------------------------------------
  // Redirect classification (P2 analog)
  // ---------------------------------------------------------------------------

  private val Canonical =
    """(?is)<link\s[^>]*?rel\s*=\s*["']?canonical["']?[^>]*?href\s*=\s*("([^"]*)"|'([^']*)')""".r
  private val CanonicalHrefFirst =
    """(?is)<link\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)')[^>]*?rel\s*=\s*["']?canonical["']?""".r
  private val MetaRefresh =
    """(?is)<meta\s[^>]*?http-equiv\s*=\s*["']?refresh["']?[^>]*?content\s*=\s*["'][^"']*?url\s*=\s*([^"'>\s]+)""".r

  /** Redirect target url (normalized) if this page is a redirect, else None. */
  def extractRedirect(html: Array[Byte], baseUrl: String): Option[String] = {
    if (html == null) return None
    extractRedirect(new String(html, StandardCharsets.UTF_8), baseUrl)
  }

  def extractRedirect(html: String, baseUrl: String): Option[String] = {
    if (html == null) return None
    val self = normalizeUrl(baseUrl)
    def norm(raw: String): Option[String] = {
      val u = normalizeUrl(resolveHref(baseUrl, unescapeAttr(raw)))
      if (u.nonEmpty && u != self) Some(u) else None
    }
    MetaRefresh.findFirstMatchIn(html).flatMap(m => norm(m.group(1)))
      .orElse(Canonical.findFirstMatchIn(html).flatMap(m =>
        norm(Option(m.group(2)).getOrElse(m.group(3)))))
      .orElse(CanonicalHrefFirst.findFirstMatchIn(html).flatMap(m =>
        norm(Option(m.group(2)).getOrElse(m.group(3)))))
  }
}
