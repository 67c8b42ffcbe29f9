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
        f"${2000 + g % 5}%04d-01-01", f"${2000 + g % 5}%04d-12-31", verses)
    }.toDF()
  }

  /** Deterministic markdown source for granth g — same content as
    * [[synthesize]], expressed as the reference's input format so the real
    * parser (S7, [[graft.crawler.MarkdownGranth]]) produces it.
    */
  def markdownFor(g: Int): String = {
    val sb = new StringBuilder
    (1 to 3 + g % 4).foreach { v =>
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
        f"${2000 + g % 5}%04d-01-01", f"${2000 + g % 5}%04d-12-31", verses)
    }.toDF()
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
