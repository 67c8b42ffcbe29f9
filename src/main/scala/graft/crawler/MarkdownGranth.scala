package graft.crawler

/** S7 markdown → Granth parser — reference
  * `backend/crawler/markdown_parser.py:40-383` re-derived as a pure Scala
  * block parser (the reference round-trips through python-markdown + HTML +
  * BeautifulSoup; the semantics below are the ones its tests pin,
  * `tests/backend/test_markdown_parser.py:38-433`):
  *
  *   - `#` (H1) sets the current adhikar for everything after it;
  *   - `##` (H2) starting with `Shlok|Gatha|Kalash|Sutra|Chhand <n>[-<m>]`
  *     (case-insensitive) opens a VERSE: its paragraphs up to the first `###`
  *     are the verse text; `###` sections must be one of Translation /
  *     Meaning / Teeka / Bhavarth / Sanskrit Teeka or `Page Number - <n>`
  *     (anything else is an error); Teeka/Bhavarth collect lists, the others
  *     join with newlines;
  *   - any other `##` opens a PROSE section: paragraphs before the first
  *     `###` are its content, `###` blocks become subsections (sequence
  *     numbers continue after the parent), `Page Number - <n>` headings set
  *     the section's page instead of creating a subsection;
  *   - text is cleaned of NBSP-family characters and space runs.
  */
object MarkdownGranth {

  case class VerseRow(seqNum: Int, verse: String, vtype: String,
      typeStartNum: Int, typeEndNum: Int, translation: String, meaning: String,
      teeka: Seq[String], bhavarth: Seq[String], pageNum: Option[Int],
      adhikar: Option[String])

  case class ProseSub(seqNum: Int, heading: String, content: Seq[String])

  case class ProseRow(seqNum: Int, heading: String, content: Seq[String],
      subsections: Seq[ProseSub], pageNum: Option[Int], adhikar: Option[String])

  /** clean_text (markdown_parser.py:20-37): NBSP-family → space/nothing,
    * collapse space runs (newlines preserved), trim.
    */
  def cleanText(t: String): String = {
    if (t == null) return t
    t.replace('\u00A0', ' ')  // non-breaking space
      .replace("\u200B", "")  // zero-width space
      .replace('\u2009', ' ') // thin space
      .replace('\u202F', ' ') // narrow no-break space
      .replace("\uFEFF", "")  // BOM / zero-width no-break space
      .replaceAll(" +", " ")
      .trim
  }

  sealed trait Block
  final case class Heading(level: Int, text: String) extends Block
  final case class Para(text: String) extends Block

  // python-markdown's HashHeaderProcessor (the reference's renderer) needs
  // NO space after the hashes, anchors them at column 0, strips TRAILING
  // hashes, then strips the header text — "##Shlok 5" and "### Teeka ###"
  // are headings there, so they must be headings here too
  private val HeadingRe = "^(#{1,6})(.*)$".r
  private def headingText(rest: String): String =
    rest.replaceFirst("#+\\s*$", "").trim

  /** Markdown → block stream: ATX headings; consecutive non-blank non-heading
    * lines form one paragraph whose soft line breaks survive as newlines
    * (python-markdown keeps them inside `<p>`, so `get_text()` sees "\n").
    */
  def blocks(content: String): Seq[Block] = {
    val out = scala.collection.mutable.ArrayBuffer[Block]()
    val cur = scala.collection.mutable.ArrayBuffer[String]()
    def flush(): Unit = {
      if (cur.nonEmpty) { out += Para(cur.mkString("\n")); cur.clear() }
    }
    content.linesIterator.foreach { line =>
      line match {
        case HeadingRe(hashes, rest) =>
          flush(); out += Heading(hashes.length, headingText(rest))
        case l if l.trim.isEmpty     => flush()
        case l                       => cur += l
      }
    }
    flush()
    out.toSeq
  }

  private val PagePat = "(?i)^Page\\s+Number\\s*-?\\s*(\\d+)$".r
  private val ValidSections =
    Set("Translation", "Meaning", "Teeka", "Bhavarth", "Sanskrit Teeka")

  private def parseVerseHeader(h: String): Option[(String, Int, Int)] =
    "(?i)^(Shlok|Gatha|Kalash|Sutra|Chhand)\\s+(\\d+)-(\\d+)".r.findPrefixMatchOf(h)
      .map(m => (m.group(1).toLowerCase(java.util.Locale.ROOT).capitalize, m.group(2).toInt, m.group(3).toInt))
      .orElse("(?i)^(Shlok|Gatha|Kalash|Sutra|Chhand)\\s+(\\d+)".r.findPrefixMatchOf(h)
        .map(m => (m.group(1).toLowerCase(java.util.Locale.ROOT).capitalize, m.group(2).toInt, m.group(2).toInt)))

  def parse(content: String): (Seq[VerseRow], Seq[ProseRow]) = {
    val bs = blocks(content)
    val verses = scala.collection.mutable.ArrayBuffer[VerseRow]()
    val proses = scala.collection.mutable.ArrayBuffer[ProseRow]()
    var adhikar: Option[String] = None
    var seq = 1
    var i = 0
    while (i < bs.length) {
      bs(i) match {
        case Heading(1, t) =>
          adhikar = Some(cleanText(t))
          i += 1
        case Heading(2, t) =>
          val h2 = cleanText(t)
          // slice of content until the next h1/h2
          var j = i + 1
          while (j < bs.length && !(bs(j) match {
            case Heading(l, _) => l <= 2
            case _             => false
          })) j += 1
          val body = bs.slice(i + 1, j)
          parseVerseHeader(h2) match {
            case Some((vtype, s0, e0)) =>
              verses += extractVerse(body, seq, vtype, s0, e0, adhikar)
              seq += 1
            case None =>
              val (prose, nextSeq) = extractProse(body, seq, h2, adhikar)
              prose.foreach(proses += _)
              seq = nextSeq
          }
          i = j
        case _ => i += 1
      }
    }
    (verses.toSeq, proses.toSeq)
  }

  private def extractVerse(body: Seq[Block], seq: Int, vtype: String,
      s0: Int, e0: Int, adhikar: Option[String]): VerseRow = {
    // verse text: paragraphs before the first h3
    val verseText = body.takeWhile {
      case Heading(3, _) => false
      case _             => true
    }.collect { case Para(p) => cleanText(p) }.filter(_.nonEmpty).mkString("\n")
    // h3 sections (validated)
    val sections = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    var current: Option[String] = None
    var acc = scala.collection.mutable.ArrayBuffer[String]()
    // a REPEATED section heading overwrites the earlier one's content —
    // deliberately: the reference does exactly this (markdown_parser.py:
    // 241-244, `sections[current_section] = current_content` on re-entry),
    // and the parity contract mirrors its quirks
    def save(): Unit = current.foreach(c => sections(c) = acc.toSeq)
    body.foreach {
      case Heading(3, t) =>
        save()
        val name = cleanText(t)
        if (!ValidSections.contains(name) && PagePat.findFirstIn(name).isEmpty)
          throw new IllegalArgumentException(
            s"Invalid section heading found: '$name'. Valid sections are: " +
              ValidSections.toSeq.sorted.mkString(", ") + " or 'Page Number - <num>'")
        current = Some(name)
        acc = scala.collection.mutable.ArrayBuffer[String]()
      case Para(p) if current.isDefined =>
        val c = cleanText(p)
        if (c.nonEmpty) acc += c
      case _ =>
    }
    save()
    def joined(name: String): String = sections.getOrElse(name, Nil).mkString("\n")
    def listed(name: String): Seq[String] = sections.getOrElse(name, Nil)
    val page = sections.keys.collectFirst { case PagePat(n) => n.toInt }
    // "Sanskrit Teeka" is a VALID section but its content is intentionally
    // dropped — the reference does exactly this: it passes validation
    // (markdown_parser.py:234) yet only Translation/Meaning/Teeka/Bhavarth
    // are read into the verse (markdown_parser.py:173-176)
    VerseRow(seq, cleanText(verseText), vtype, s0, e0,
      cleanText(joined("Translation")), cleanText(joined("Meaning")),
      listed("Teeka").map(cleanText), listed("Bhavarth").map(cleanText),
      page, adhikar)
  }

  private def extractProse(body: Seq[Block], seq: Int, heading: String,
      adhikar: Option[String]): (Option[ProseRow], Int) = {
    val paragraphs = scala.collection.mutable.ArrayBuffer[String]()
    val subsections = scala.collection.mutable.ArrayBuffer[ProseSub]()
    var pageNum: Option[Int] = None
    var curHeading: Option[String] = None
    var curParas = scala.collection.mutable.ArrayBuffer[String]()
    var subSeq = seq + 1
    def saveSub(): Unit = curHeading.foreach { h =>
      if (curParas.nonEmpty) {
        subsections += ProseSub(subSeq, h, curParas.toSeq)
        subSeq += 1
      }
    }
    body.foreach {
      case Heading(3, t) =>
        saveSub()
        val h3 = cleanText(t)
        PagePat.findFirstMatchIn(h3) match {
          case Some(m) =>
            pageNum = Some(m.group(1).toInt)
            curHeading = None // page-number headings are not subsections
          case None =>
            curHeading = Some(h3)
            curParas = scala.collection.mutable.ArrayBuffer[String]()
        }
      case Para(p) =>
        val c = cleanText(p)
        if (c.nonEmpty) {
          if (curHeading.isEmpty) paragraphs += c else curParas += c
        }
      case _ =>
    }
    saveSub()
    if (paragraphs.isEmpty && subsections.isEmpty) (None, seq + 1)
    else (Some(ProseRow(seq, heading, paragraphs.toSeq, subsections.toSeq,
      pageNum, adhikar)), subSeq)
  }
}
