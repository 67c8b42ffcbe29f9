package graft.api

import graft.crawler.MarkdownGranth
import graft.crawler.MarkdownGranth.{ProseRow, ProseSub, VerseRow}
import org.json4s._

/** Resident granth-document lookup behind the /api/granth/verse and
  * /api/granth/prose endpoints (reference search_api.py:503-646): the
  * reference match-queries `original_filename` on its granth_index (size 1)
  * and walks the nested verses[] / prose_sections[] of the one hit. Granths
  * are BOOKS — a handful of docs, each with nested structure — so the store
  * is a small resident map built from the parsed markdown corpus (S7,
  * [[MarkdownGranth.parse]]); the searchable flattened rows stay in the
  * index (granth_flatten / granth_prose_flatten, both oracled).
  */
final class GranthStore(val entries: Seq[GranthStore.Entry]) {
  private val byFile: Map[String, GranthStore.Entry] =
    entries.map(e => e.originalFilename -> e).toMap

  /** Analyzed-`match` analog of the reference's size-1 filename query:
    * exact original_filename first, then extension/case-tolerant (the
    * variations an analyzed match would absorb, search_api.py:517-519
    * "handle slight variations").
    */
  def lookup(originalFilename: String): Option[GranthStore.Entry] =
    byFile.get(originalFilename).orElse {
      val norm = originalFilename.toLowerCase(java.util.Locale.ROOT).stripSuffix(".md")
      entries.find(e =>
        e.originalFilename.toLowerCase(java.util.Locale.ROOT).stripSuffix(".md") == norm ||
          e.name.toLowerCase(java.util.Locale.ROOT) == norm)
    }

  /** /api/granth/verse payload — Right(result) or Left(404 detail),
    * reference search_api.py:503-567 (granth doc shape
    * granth_index.py:168-201).
    */
  def verseJson(originalFilename: String, verseSeqNum: Int): Either[String, JValue] =
    lookup(originalFilename) match {
      case None => Left(s"Granth document not found: $originalFilename")
      case Some(e) =>
        e.verses.find(_.seqNum == verseSeqNum) match {
          case None => Left(
            s"Verse with seq_num $verseSeqNum not found in document $originalFilename")
          case Some(v) => Right(JObject(
            "granth_id" -> JLong(e.granthId),
            "granth_name" -> JString(e.name),
            "metadata" -> metaJson(e),
            "verse" -> GranthStore.verseJson(v, e.language)))
        }
    }

  /** /api/granth/prose payload — main sections first, then subsections with
    * parent context grafted on (reference search_api.py:568-646: subsection
    * hit returns {**subsection, parent_seq_num, parent_heading}).
    */
  def proseJson(originalFilename: String, proseSeqNum: Int): Either[String, JValue] =
    lookup(originalFilename) match {
      case None => Left(s"Granth document not found: $originalFilename")
      case Some(e) =>
        val main = e.prose.find(_.seqNum == proseSeqNum).map(GranthStore.proseSectionJson)
        lazy val sub = e.prose.iterator.flatMap { sec =>
          sec.subsections.find(_.seqNum == proseSeqNum).map { s =>
            JObject(GranthStore.proseSubFields(s) ++ List(
              "parent_seq_num" -> JInt(sec.seqNum),
              "parent_heading" -> JString(sec.heading)))
          }
        }.nextOption()
        main.orElse(sub) match {
          case None => Left(
            s"Prose section with seq_num $proseSeqNum not found in document $originalFilename")
          case Some(p) => Right(JObject(
            "granth_id" -> JLong(e.granthId),
            "granth_name" -> JString(e.name),
            "metadata" -> metaJson(e),
            "prose" -> p))
        }
    }

  private def metaJson(e: GranthStore.Entry): JValue =
    JObject(e.metadata.toList.sortBy(_._1).map { case (k, v) => k -> (JString(v): JValue) })
}

object GranthStore {

  /** One granth book: identity + the reference metadata block
    * (granth_index.py:173-179: Anuyog/language/Author/Teekakar/file_url)
    * plus the parser's full verse/prose rows.
    */
  case class Entry(granthId: Long, name: String, originalFilename: String,
      language: String, metadata: Map[String, String],
      verses: Seq[VerseRow], prose: Seq[ProseRow])

  private def strArr(xs: Seq[String]): JValue = JArray(xs.toList.map(JString(_)))

  /** Reference verse dict (granth_index.py:181-194). */
  def verseJson(v: VerseRow, language: String): JValue = JObject(
    "seq_num" -> JInt(v.seqNum),
    "verse" -> JString(v.verse),
    "type" -> JString(v.vtype),
    "type_start_num" -> JInt(v.typeStartNum),
    "type_end_num" -> JInt(v.typeEndNum),
    "translation" -> JString(v.translation),
    "language" -> JString(language),
    "meaning" -> JString(v.meaning),
    "teeka" -> strArr(v.teeka),
    "bhavarth" -> strArr(v.bhavarth),
    "page_num" -> v.pageNum.map(JInt(_): JValue).getOrElse(JNull),
    "adhikar" -> v.adhikar.map(JString(_): JValue).getOrElse(JNull))

  /** Reference prose-section dict (granth_index.py:128-148). Subsection rows
    * have no page_num/adhikar of their own in the parsed model
    * ([[MarkdownGranth.ProseSub]]) — the flattened index rows inherit the
    * parent's page (granth_index.py page fallback parent → 1), so the
    * nested payload omits them rather than inventing values.
    */
  def proseSectionJson(p: ProseRow): JValue = JObject(
    "seq_num" -> JInt(p.seqNum),
    "heading" -> JString(p.heading),
    "content" -> strArr(p.content),
    "subsections" -> JArray(p.subsections.toList.map(s => JObject(proseSubFields(s)))),
    "page_num" -> p.pageNum.map(JInt(_): JValue).getOrElse(JNull),
    "adhikar" -> p.adhikar.map(JString(_): JValue).getOrElse(JNull))

  private[api] def proseSubFields(s: ProseSub): List[(String, JValue)] = List(
    "seq_num" -> JInt(s.seqNum),
    "heading" -> JString(s.heading),
    "content" -> strArr(s.content))

  /** Deterministic synthetic store THROUGH the real markdown parser — the
    * same corpus the oracled granth_flatten/granth_prose_flatten queries run
    * over ([[graft.ops.Granth.markdownFor]]).
    */
  def synthetic(n: Int): GranthStore = new GranthStore(
    (0 until n).map { g =>
      val (verses, prose) = MarkdownGranth.parse(graft.ops.Granth.markdownFor(g))
      Entry(g.toLong, s"granth$g", s"granth$g.md", "hi",
        Map(
          "Anuyog" -> s"anuyog${g % 4}",
          "language" -> "hi",
          "Author" -> s"author${g % 3}",
          "Teekakar" -> "",
          "file_url" -> s"https://example.org/granth/granth$g.md"),
        verses, prose)
    })
}
