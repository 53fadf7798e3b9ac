package graft.html

import java.nio.charset.StandardCharsets.UTF_8

/** Deterministic main-content extraction for non-PDF payloads: a DOM-lite
  * tag tokenizer plus a text-density boilerplate pass.
  *
  * The reference engine (KarmaPenny/pdfparser) has no HTML path; this is the
  * fallback required by the north rule ("HTML boilerplate strip ... DOM
  * heuristics") so every crawl row yields deterministic extracted text. The
  * algorithm below is this engine's frozen specification — goldens live in
  * HtmlExtractSpec and must never drift:
  *
  *  1. Bytes are decoded as UTF-8 (malformed sequences replaced).
  *  2. Comments, doctypes, processing instructions are skipped. The
  *     contents of script/style/noscript/template/head/svg are skipped.
  *  3. Character/entity references are decoded (named core set + numeric).
  *  4. Block-level boundaries (p, div, li, h1-h6, tr, br, ...) split the
  *     text into blocks; inline tags do not.
  *  5. Whitespace inside a block collapses to single spaces; empty blocks
  *     drop.
  *  6. Text-density pass: a block whose anchor-text ratio exceeds 2/3 and
  *     whose total length is < 80 chars is boilerplate (nav/footer link
  *     clusters) and drops.
  *  7. Blocks join with a single '\n'.
  */
object HtmlExtract {

  private val SkipContent = Set("script", "style", "noscript", "template", "head", "svg")

  private val BlockTags = Set(
    "p", "div", "section", "article", "main", "aside", "header", "footer",
    "nav", "li", "ul", "ol", "dl", "dt", "dd", "h1", "h2", "h3", "h4", "h5",
    "h6", "table", "thead", "tbody", "tr", "blockquote", "pre", "figure",
    "figcaption", "form", "fieldset", "address", "hr", "br")

  private val CellTags = Set("td", "th") // cell boundary: space, not newline

  /** Boilerplate thresholds (frozen spec, step 6). */
  private val LinkRatioMax = 2.0 / 3.0
  private val ShortBlockChars = 80

  def extract(html: Array[Byte]): String = extract(new String(html, UTF_8))

  def extract(html: String): String = {
    val out = new StringBuilder
    val block = new StringBuilder
    var blockLinkChars = 0
    var anchorDepth = 0
    val n = html.length
    var i = 0

    def flushBlock(): Unit = {
      // collapse whitespace, trim
      val collapsed = new StringBuilder
      var lastWs = true
      var j = 0
      while (j < block.length) {
        val c = block.charAt(j)
        if (c.isWhitespace || c == ' ') {
          if (!lastWs) collapsed += ' '
          lastWs = true
        } else { collapsed += c; lastWs = false }
        j += 1
      }
      val text = collapsed.toString.trim
      if (text.nonEmpty) {
        val total = block.count(c => !c.isWhitespace && c != ' ')
        val linkRatio = if (total == 0) 0.0 else blockLinkChars.toDouble / total
        val keep = !(linkRatio > LinkRatioMax && text.length < ShortBlockChars)
        if (keep) {
          if (out.nonEmpty) out += '\n'
          out ++= text
        }
      }
      block.clear()
      blockLinkChars = 0
    }

    def lowerName(start: Int): (String, Int) = {
      var j = start
      val sb = new StringBuilder
      while (j < n && (html.charAt(j).isLetterOrDigit)) {
        sb += html.charAt(j).toLower
        j += 1
      }
      (sb.toString, j)
    }

    /** skip attributes to the tag-closing '>', honoring quoted values. */
    def skipToTagEnd(start: Int): Int = {
      var j = start
      while (j < n) {
        val c = html.charAt(j)
        if (c == '"' || c == '\'') {
          val q = c
          j += 1
          while (j < n && html.charAt(j) != q) j += 1
          if (j < n) j += 1
        } else if (c == '>') return j + 1
        else j += 1
      }
      n
    }

    def decodeEntity(start: Int): (String, Int) = {
      // html.charAt(start) == '&'; bounded lookahead of 12 chars to ';'
      var j = start + 1
      val limit = math.min(n, start + 12)
      while (j < limit && html.charAt(j) != ';') j += 1
      if (j >= limit || html.charAt(j) != ';') return ("&", start + 1)
      val body = html.substring(start + 1, j)
      val decoded: Option[String] =
        if (body.startsWith("#x") || body.startsWith("#X"))
          try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16)))) catch { case _: Throwable => None }
        else if (body.startsWith("#"))
          try Some(new String(Character.toChars(Integer.parseInt(body.substring(1))))) catch { case _: Throwable => None }
        else body match {
          case "amp"  => Some("&")
          case "lt"   => Some("<")
          case "gt"   => Some(">")
          case "quot" => Some("\"")
          case "apos" => Some("'")
          case "nbsp" => Some(" ")
          case _      => None
        }
      decoded match {
        case Some(s) => (s, j + 1)
        case None    => ("&", start + 1) // unknown entity: literal ampersand
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          i = skipToTagEnd(i + 2)
        } else if (i + 1 < n && html.charAt(i + 1) == '/') {
          val (name, j) = lowerName(i + 2)
          i = skipToTagEnd(j)
          if (name == "a" && anchorDepth > 0) anchorDepth -= 1
          if (BlockTags.contains(name)) flushBlock()
          else if (CellTags.contains(name)) block += ' '
        } else if (i + 1 < n && html.charAt(i + 1).isLetter) {
          val (name, j) = lowerName(i + 1)
          i = skipToTagEnd(j)
          if (SkipContent.contains(name)) {
            // skip to the matching close tag, case-insensitive
            val close = "</" + name
            var e = i
            var found = -1
            while (found < 0 && e <= n - close.length) {
              if (html.regionMatches(true, e, close, 0, close.length)) found = e
              else e += 1
            }
            i = if (found < 0) n else skipToTagEnd(found + close.length)
          } else {
            if (name == "a") anchorDepth += 1
            if (BlockTags.contains(name)) flushBlock()
            else if (CellTags.contains(name)) block += ' '
          }
        } else {
          block += '<'
          i += 1
        }
      } else if (c == '&') {
        val (s, j) = decodeEntity(i)
        block ++= s
        if (anchorDepth > 0) blockLinkChars += s.count(ch => !ch.isWhitespace && ch != ' ')
        i = j
      } else {
        block += c
        if (anchorDepth > 0 && !c.isWhitespace && c != ' ') blockLinkChars += 1
        i += 1
      }
    }
    flushBlock()
    out.toString
  }
}
