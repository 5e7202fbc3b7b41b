package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Single-pass HTML main-content extraction — the crawl-ingestion front
  * of a training-data pipeline (generalizes the reference's plain-file
  * document loading, eval/doc_retriever.py:28-37, to the HTML form
  * every 100 TB web corpus starts from).
  *
  * One fused scan per document, no allocation beyond the output
  * buffers: tokenizes markup, drops `<script>`/`<style>` raw-text
  * subtrees and boilerplate subtrees (`head`, `nav`, `header`,
  * `footer`, `aside`), decodes the fixed entity set, accumulates the
  * surviving text into three scopes at once (whole document, inside
  * `<main>`, inside `<article>`), and returns the whitespace-collapsed
  * text of the best scope: `main` if non-blank, else `article`, else
  * the whole document. BLOCK-level tags contribute a separating space
  * at start/end/self-close; inline tags contribute nothing.
  *
  * The spec is pinned by a fixture produced by a DIFFERENT stack
  * (tools/gen_html_fixture.py: Python's event-driven html.parser), so
  * the two implementations cross-check each other byte-exactly over
  * 5000 generated pages (q197). Tokenizer behavior matches html.parser
  * on well-formed input: `<` opens markup only before a letter, `/`,
  * `!` or `?`; quoted attribute values may contain `<`/`>`; comments
  * run to `-->`; script/style content is raw text until the matching
  * close tag (optional whitespace after `</`).
  *
  * Scale: pure per-row map work — no shuffle, no UDF serialization
  * (wired as a codegen'd StaticInvoke), output bounded by input size.
  */
object GraftHtml {

  private val Block: Set[String] = Set(
    "html", "body", "title", "section", "main", "article", "nav",
    "header", "footer", "aside", "head", "p", "div", "ul", "ol", "li",
    "h1", "h2", "h3", "h4", "h5", "h6", "br", "table", "tr", "td",
    "th", "blockquote", "pre")
  private val Skip: Set[String] =
    Set("head", "nav", "header", "footer", "aside")

  def extractMain(html: UTF8String): UTF8String =
    UTF8String.fromString(extractMainString(html.toString))

  /** String-level implementation (shared by the expression and tests;
    * distinct name so StaticInvoke's reflective overload lookup is
    * unambiguous). */
  def extractMainString(s: String): String = {
    val n = s.length
    val all = new java.lang.StringBuilder
    val main = new java.lang.StringBuilder
    val art = new java.lang.StringBuilder
    var skip = 0
    var mainD = 0
    var artD = 0
    var rawMode: String = null // "script" | "style"

    def emit(t: String): Unit = if (skip == 0) {
      all.append(t)
      if (mainD > 0) main.append(t)
      if (artD > 0) art.append(t)
    }
    def emitChar(c: Char): Unit = if (skip == 0) {
      all.append(c)
      if (mainD > 0) main.append(c)
      if (artD > 0) art.append(c)
    }
    def emitCp(cp: Int): Unit = if (skip == 0) {
      all.appendCodePoint(cp)
      if (mainD > 0) main.appendCodePoint(cp)
      if (artD > 0) art.appendCodePoint(cp)
    }

    def startTag(name: String): Unit = {
      if (Block(name)) emit(" ") // before skip++ -> lands in outer scope
      if (name == "script" || name == "style") rawMode = name
      else if (Skip(name)) skip += 1
      else if (name == "main") mainD += 1
      else if (name == "article") artD += 1
    }
    def endTag(name: String): Unit = {
      if (Skip(name)) skip = math.max(0, skip - 1)
      else if (name == "main") mainD = math.max(0, mainD - 1)
      else if (name == "article") artD = math.max(0, artD - 1)
      if (Block(name)) emit(" ") // after skip-- -> lands in outer scope
    }

    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (rawMode != null) {
        // raw-text content: discard until </ \s* rawMode
        if (c == '<' && i + 1 < n && s.charAt(i + 1) == '/') {
          var j = i + 2
          while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
          if (s.regionMatches(true, j, rawMode, 0, rawMode.length)) {
            var k = j + rawMode.length
            while (k < n && s.charAt(k) != '>') k += 1
            i = if (k < n) k + 1 else n
            rawMode = null
          } else i += 1
        } else i += 1
      } else if (c == '<' && i + 1 < n &&
          (isNameStart(s.charAt(i + 1)) || s.charAt(i + 1) == '/' ||
            s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
        if (s.startsWith("<!--", i)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e >= 0) e + 3 else n
        } else if (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?') {
          val e = s.indexOf('>', i)
          i = if (e >= 0) e + 1 else n
        } else {
          var j = i + 1
          val closing = s.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && isNameChar(s.charAt(j))) j += 1
          if (j == nameStart) { // "</>" or "</ x": not a tag -> literal
            emitChar(c)
            i += 1
          } else {
            val name = s.substring(nameStart, j).toLowerCase
            // scan to '>' honoring quoted attribute values
            var q: Char = 0
            var k = j
            while (k < n && (q != 0 || s.charAt(k) != '>')) {
              val ch = s.charAt(k)
              if (q == 0 && (ch == '"' || ch == '\'')) q = ch
              else if (q != 0 && ch == q) q = 0
              k += 1
            }
            val selfClose = !closing && k - 1 >= j && s.charAt(k - 1) == '/'
            i = if (k < n) k + 1 else n
            if (closing) endTag(name)
            else if (selfClose) { if (Block(name)) emit(" ") }
            else startTag(name)
          }
        }
      } else if (c == '&') {
        // entity / charref in canonical full form; else literal '&'
        val dec = decodeRef(s, i)
        if (dec == null) { emitChar('&'); i += 1 }
        else { emitCp(dec._1); i = dec._2 }
      } else {
        emitChar(c)
        i += 1
      }
    }

    val m = collapse(main)
    if (m.nonEmpty) return m
    val a = collapse(art)
    if (a.nonEmpty) return a
    collapse(all)
  }

  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9') ||
      c == '-' || c == '.' || c == '_' || c == ':'

  /** Decodes `&name;` / `&#NN;` / `&#xHH;` at position `i` (which holds
    * '&'). Returns (codePoint, indexAfter) or null when the reference
    * is not in canonical full form (caller emits the literal '&').
    * Unknown named entities decode to nothing here — they return null
    * composed differently: the caller needs the literal "&name;" kept,
    * which is exactly what emitting '&' and continuing produces, since
    * the name and ';' then flow through as plain text. */
  private def decodeRef(s: String, i: Int): (Int, Int) = {
    val n = s.length
    var j = i + 1
    if (j >= n) return null
    if (s.charAt(j) == '#') {
      j += 1
      val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
      if (hex) j += 1
      val ds = j
      var v = 0L
      while (j < n && v <= 0x10FFFF && isDigitIn(s.charAt(j), hex)) {
        v = v * (if (hex) 16 else 10) + digitVal(s.charAt(j))
        j += 1
      }
      if (j == ds || j >= n || s.charAt(j) != ';' || v > 0x10FFFF ||
        !Character.isValidCodePoint(v.toInt)) null
      else (v.toInt, j + 1)
    } else {
      val ns = j
      while (j < n && isNameStart(s.charAt(j))) j += 1
      if (j == ns || j >= n || s.charAt(j) != ';') return null
      s.substring(ns, j) match {
        case "amp" => ('&'.toInt, j + 1)
        case "lt" => ('<'.toInt, j + 1)
        case "gt" => ('>'.toInt, j + 1)
        case "quot" => ('"'.toInt, j + 1)
        case "apos" => ('\''.toInt, j + 1)
        case "nbsp" => (' '.toInt, j + 1)
        case _ => null // unknown -> literal passthrough
      }
    }
  }
  private def isDigitIn(c: Char, hex: Boolean): Boolean =
    (c >= '0' && c <= '9') || (hex && ((c >= 'a' && c <= 'f') ||
      (c >= 'A' && c <= 'F')))
  private def digitVal(c: Char): Int =
    if (c <= '9') c - '0'
    else if (c <= 'F') c - 'A' + 10
    else c - 'a' + 10

  /** Collapse [ \t\n\r\f\v]+ runs to one space and trim — identical to
    * the fixture generator's `re.sub(r"[ \t\n\r\f\v]+", " ", s).strip()`
    * (an explicit char class on BOTH sides: Python's str.split() and
    * Scala's \s differ on NBSP and unicode spaces, so neither is used). */
  private def collapse(b: java.lang.StringBuilder): String = {
    val out = new java.lang.StringBuilder(b.length)
    var i = 0
    var pendingSpace = false
    while (i < b.length) {
      val c = b.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
        c == 0x0b) pendingSpace = out.length > 0
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }
}
