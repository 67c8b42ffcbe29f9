package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Granth (scripture) nested-structure operators — the reference models a
  * Granth as verses[] with nested translations/teeka[]/bhavarth[] plus
  * prose_sections[]→subsections[] (backend/crawler/granth.py:57-186, nested
  * OpenSearch mapping configs/opensearch-config.yaml:172-375) and flattens
  * them to index rows (granth_index.py:215-332).
  *
  * Spark-first mapping: two-level ArrayType(StructType) columns, flattened
  * with posexplode; the date-range facet aggregation (A2,
  * backend/common/opensearch.py:369-445) becomes
  * collect_set(struct) → map_from_entries.
  */
object Granth {

  case class Verse(seqNum: Int, verse: String, vtype: String, translation: String,
      teeka: Seq[String], pageNum: Int, adhikar: String)
  case class GranthDoc(granthId: Long, name: String, author: String,
      startDate: String, endDate: String, verses: Seq[Verse])

  /** Nested prose shape (reference granth.py ProseSection/ProseSubsection,
    * serialized by `_prose_section_to_dict`, granth_index.py:126-147).
    */
  case class PSub(seqNum: Int, heading: String, content: Seq[String])
  case class PSec(seqNum: Int, heading: String, content: Seq[String],
      subsections: Seq[PSub], pageNum: Option[Int], adhikar: String)
  case class GranthProse(granthId: Long, name: String, author: String,
      proseSections: Seq[PSec])

  /** Deterministic synthetic nested corpus (no external data). */
  def synthesize(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { g =>
      val verses = (1 to 3 + g % 4).map { v =>
        Verse(v, s"verse text $g-$v", if (v % 2 == 0) "Shlok" else "Gatha",
          s"translation $g-$v", Seq(s"teeka $g-$v-1", s"teeka $g-$v-2"),
          pageNum = v * 2, adhikar = s"adhikar${v % 2}")
      }
      GranthDoc(g.toLong, s"granth$g", s"author${g % 3}",
        graft.Fmt.yearStart(2000 + g % 5), graft.Fmt.yearEnd(2000 + g % 5), verses)
    }.toDF()
  }

  /** Deterministic markdown source for granth g — same content as
    * [[synthesize]], expressed as the reference's input format so the real
    * parser (S7, [[graft.crawler.MarkdownGranth]]) produces it.
    */
  def markdownFor(g: Int): String = {
    val sb = new StringBuilder
    val nv = 3 + g % 4
    (1 to nv).foreach { v =>
      val vtype = if (v % 2 == 0) "Shlok" else "Gatha"
      sb.append(s"# adhikar${v % 2}\n\n")
      sb.append(s"## $vtype $v\n\n")
      sb.append(s"verse text $g-$v\n\n")
      sb.append(s"### Translation\n\n")
      sb.append(s"translation $g-$v\n\n")
      sb.append(s"### Teeka\n\n")
      sb.append(s"teeka $g-$v-1\n\nteeka $g-$v-2\n\n")
      sb.append(s"### Page Number - ${v * 2}\n\n")
    }
    // prose AFTER the verses (verse seq_nums stay 1..nv): a non-verse H2
    // opens a prose section — paragraphs, a page-number heading, then one
    // subsection (seq numbers continue after the parent, granth_index.py)
    sb.append(s"## Prastavana $g\n\n")
    sb.append(s"prose text $g-1\n\nprose text $g-2\n\n")
    sb.append(s"### Page Number - ${90 + g % 7}\n\n")
    sb.append(s"### Upodghat $g\n\n")
    sb.append(s"sub text $g-1\n\n")
    if (g % 2 == 0) sb.append(s"sub text $g-2\n\n")
    sb.toString
  }

  /** The synthesize() corpus built THROUGH the markdown parser: each granth's
    * markdown is parsed (H1 adhikar, H2 verse headers, H3 sections) and the
    * parsed verses re-nested — granth_flatten runs over parser output, gated
    * by the same DuckDB oracle.
    */
  def fromMarkdown(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { g =>
      val (verseRows, _) = graft.crawler.MarkdownGranth.parse(markdownFor(g))
      val verses = verseRows.map { v =>
        Verse(v.seqNum, v.verse, v.vtype, v.translation, v.teeka,
          v.pageNum.getOrElse(-1), v.adhikar.getOrElse(""))
      }
      GranthDoc(g.toLong, s"granth$g", s"author${g % 3}",
        graft.Fmt.yearStart(2000 + g % 5), graft.Fmt.yearEnd(2000 + g % 5), verses)
    }.toDF()
  }

  /** The PROSE sections of the [[markdownFor]] corpus through the real parser,
    * re-nested as the reference's granth-index dict shape
    * (granth_index.py:126-147 `_prose_section_to_dict`).
    */
  def proseFromMarkdown(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { g =>
      val (_, proseRows) = graft.crawler.MarkdownGranth.parse(markdownFor(g))
      val secs = proseRows.map { p =>
        PSec(p.seqNum, p.heading, p.content,
          p.subsections.map(s => PSub(s.seqNum, s.heading, s.content)),
          p.pageNum, p.adhikar.getOrElse(""))
      }
      GranthProse(g.toLong, s"granth$g", s"author${g % 3}", secs)
    }.toDF()
  }

  /** Flatten prose sections + subsections to one search document per content
    * PARAGRAPH — the reference's `_create_prose_document` rows
    * (granth_index.py:263-294 loop, :380-427 doc shape): chunk_id
    * `{gid}_p{seq}_content_{i}` for main prose, `{gid}_p{parent}_sub{seq}_
    * content_{i}` for subsections; page falls back parent → 1; subsection
    * rows carry the SUBSECTION's heading/seq. Spark-first: two posexplode
    * branches unioned — no per-granth loop, scales with total paragraphs.
    */
  def flattenProse(granths: DataFrame): DataFrame = {
    val ps = granths.select(col("granthId"), col("name"), col("author"),
      explode(col("proseSections")).as("ps"))
    val base = ps.select(col("granthId"), col("name"), col("author"),
      col("ps.seqNum").as("prose_seq"), col("ps.heading").as("ps_heading"),
      col("ps.adhikar").as("adhikar"),
      coalesce(col("ps.pageNum"), lit(1)).as("ps_page"),
      col("ps.content").as("ps_content"), col("ps.subsections").as("subs"))
    val main = base
      .select(col("granthId"), col("name"), col("author"), col("prose_seq"),
        col("ps_heading"), col("adhikar"), col("ps_page"),
        posexplode(col("ps_content")).as(Seq("i", "para")))
      .where(length(trim(col("para"))) > 0)
      .select(
        concat(col("granthId"), lit("_p"), col("prose_seq"), lit("_content_"), col("i"))
          .as("chunk_id"),
        col("granthId").cast("long").as("granth_id"),
        concat(lit("prose_"), col("prose_seq"), lit("_content_"), col("i"))
          .as("paragraph_id"),
        col("ps_page").cast("int").as("page_number"),
        lit("main").as("prose_content_type"),
        col("prose_seq").cast("int").as("prose_seq_num"),
        col("ps_heading").as("prose_heading"),
        col("adhikar"),
        trim(col("para")).as("content"))
    val subs = base
      .select(col("granthId"), col("prose_seq"), col("adhikar"), col("ps_page"),
        explode(col("subs")).as("sub"))
      .select(col("granthId"), col("prose_seq"), col("adhikar"), col("ps_page"),
        col("sub.seqNum").as("sub_seq"), col("sub.heading").as("sub_heading"),
        posexplode(col("sub.content")).as(Seq("i", "para")))
      .where(length(trim(col("para"))) > 0)
      .select(
        concat(col("granthId"), lit("_p"), col("prose_seq"), lit("_sub"), col("sub_seq"),
          lit("_content_"), col("i")).as("chunk_id"),
        col("granthId").cast("long").as("granth_id"),
        concat(lit("prose_"), col("sub_seq"), lit("_content_"), col("i"))
          .as("paragraph_id"),
        col("ps_page").cast("int").as("page_number"),
        lit("subsection").as("prose_content_type"),
        col("sub_seq").cast("int").as("prose_seq_num"),
        col("sub_heading").as("prose_heading"),
        col("adhikar"),
        trim(col("para")).as("content"))
    main.union(subs)
  }

  /** Flatten nested verses (and their nested teeka) to index rows — the
    * reference's chunk-building flattening (granth_index.py:215-332).
    */
  def flattenVerses(granths: DataFrame): DataFrame = {
    granths
      .select(col("granthId"), col("name"), col("author"),
        posexplode(col("verses")).as(Seq("verse_idx", "v")))
      .select(col("granthId"), col("name"), col("author"),
        col("verse_idx").cast("long").as("verse_idx"),
        col("v.seqNum").as("seq_num"), col("v.vtype").as("vtype"),
        col("v.verse").as("verse"), col("v.translation").as("translation"),
        col("v.pageNum").as("page_num"), col("v.adhikar").as("adhikar"),
        array_join(col("v.teeka"), " | ").as("teeka_joined"))
  }

  /** A2: per-Granth unique date ranges aggregated into a map facet. */
  def dateRangeFacet(granths: DataFrame): DataFrame = {
    granths
      .groupBy(col("author"))
      .agg(sort_array(collect_set(struct(col("startDate"), col("endDate"))))
        .as("ranges"))
      .select(col("author"),
        transform(col("ranges"), r =>
          concat(r.getField("startDate"), lit(".."), r.getField("endDate")))
          .as("date_ranges"))
  }
}
