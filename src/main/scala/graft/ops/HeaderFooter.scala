package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** F4 header/footer rejection — reference
  * `paragraph_generator/base.py:205-232` (`_is_header_footer`):
  *
  *   1. strip the FIRST occurrence of each configured header-prefix regex;
  *   2. reject paragraph #0 when, after stripping, it is short (< 35 chars)
  *      and carries more than 2 digits (ASCII or Devanagari);
  *   3. reject any short paragraph (0 < len < 20) whose digit ratio ≥ 0.3
  *      (page numbers, dates, folio marks);
  *   4. reject anything matching a configured header regex.
  *
  * Pure Column expressions (whole-stage codegen; no UDF): at 100 TB this
  * predicate runs inside the scan stage of the paragraph pipeline, before the
  * T1 combine shuffle, so rejected headers/footers never enter the exchange.
  */
object HeaderFooter {

  private val DigitClass = "[0-9०-९]"

  /** Python `.strip()` analog used after each matched prefix strip: removes
    * leading/trailing regex whitespace. Spark's `trim` strips SPACES only, so
    * a tab/newline at the strip boundary would diverge from the reference —
    * and the same regex is used by the UDF path so the two implementations
    * are character-identical. (Python also strips some Unicode spaces that
    * `\s` doesn't; none occur at strip boundaries in this domain.)
    */
  private val WsEdge = "^\\s+|\\s+$"
  private def wsTrim(c: Column): Column = regexp_replace(c, WsEdge, "")

  /** Count of ASCII + Devanagari digits. */
  def digitCount(c: Column): Column =
    length(c) - length(regexp_replace(c, DigitClass, ""))

  /** Strip the FIRST regex match of `pattern` and trim the result when it
    * matched — the Column equivalent of the reference's per-prefix step
    * (base.py:211-213: `re.sub(prefix, '', para, count=1)` followed by
    * `.strip()`, both inside the `if match` branch). The match is located
    * with regexp_instr (exact first-MATCH-POSITION semantics — instr on the
    * extracted text would find an earlier literal occurrence of the same
    * characters); unmatched input passes through untrimmed.
    */
  def stripFirst(c: Column, pattern: String): Column = {
    val m = regexp_extract(c, pattern, 0)
    val pos = regexp_instr(c, lit(pattern)) // 1-based first-match position; 0 = no match
    when(pos === 0, c).otherwise(wsTrim(
      concat(c.substr(lit(1), pos - 1),
        c.substr(pos + length(m), length(c)))))
  }

  /** Apply every configured prefix strip in order, trimming AFTER EACH
    * matched strip (the reference strips whitespace per re.sub, so an
    * anchored second prefix can match text exposed by the first strip's
    * trim).
    *
    * Two implementations with identical semantics (spec-gated against each
    * other): up to [[MaxColumnPrefixes]] prefixes stay pure Column
    * expressions inside whole-stage codegen; longer configured lists switch
    * to ONE compiled-regex UDF — the conditional-trim Column shape references
    * its accumulator ≥2× per level, so the expression tree grows
    * exponentially in the prefix count and would blow up analysis/codegen on
    * a 10-prefix scan config (regex work per row is linear either way;
    * java.util.regex runs inside regexp_replace too).
    */
  val MaxColumnPrefixes = 3

  def stripPrefixes(c: Column, prefixes: Seq[String]): Column =
    if (prefixes.length > MaxColumnPrefixes) stripPrefixesUdf(prefixes)(c)
    else prefixes.foldLeft(c) { (acc, p) =>
      // the cheap replace-ALL branch is first-match-equivalent ONLY for a
      // fully anchored pattern: '^' can match once, so one replacement
      // happens. A pattern with alternation ("^a|b") has unanchored
      // branches that replace-all would strip at EVERY occurrence where
      // the reference's re.sub(count=1) strips one — those route to
      // stripFirst's exact first-match splice ('|' inside a char class is
      // over-conservative here, which only costs the slower exact path)
      if (p.startsWith("^") && !p.contains("|"))
        when(acc.rlike(p), wsTrim(regexp_replace(acc, p, ""))).otherwise(acc)
      else stripFirst(acc, p)
    }

  /** The reference loop verbatim (base.py:205-213): per prefix, remove the
    * first regex match (`re.sub(count=1)`) and strip — as one UDF over
    * patterns compiled once per executor.
    */
  private[ops] def stripPrefixesUdf(prefixes: Seq[String]) = {
    // compiled once at plan time, serialized to executors (Pattern is
    // Serializable) — not per row
    val compiled = prefixes.map(java.util.regex.Pattern.compile).toArray
    udf { (text: String) =>
      if (text == null) null
      else compiled.foldLeft(text) { (acc, p) =>
        val m = p.matcher(acc)
        if (m.find())
          (acc.substring(0, m.start()) + acc.substring(m.end()))
            .replaceAll("^\\s+|\\s+$", "") // same \s-trim as the Column path
        else acc
      }
    }
  }

  /** The rejection predicate over the ALREADY-STRIPPED paragraph text. */
  def isHeaderFooter(paraNum: Column, stripped: Column,
      headerRegexes: Seq[String] = Nil): Column = {
    val p = stripped
    val digits = digitCount(p)
    val para0Reject = paraNum === 0 && length(p) < 35 && digits > 2
    val digitRatioReject = length(p) > 0 && length(p) < 20 &&
      digits.cast("double") / length(p).cast("double") >= 0.3
    val regexReject = headerRegexes.map(r => p.rlike(r))
      .foldLeft(lit(false))(_ || _)
    para0Reject || digitRatioReject || regexReject
  }

  /** Filter a paragraph table (textCol + paraNumCol) down to content rows,
    * replacing the text with its prefix-stripped form — the F4 step feeding
    * the T1 paragraph combiner.
    */
  def cleanParagraphs(df: DataFrame, textCol: String, paraNumCol: String,
      prefixes: Seq[String] = Nil, headerRegexes: Seq[String] = Nil): DataFrame = {
    val stripped = stripPrefixes(col(textCol), prefixes)
    df.withColumn(textCol, stripped)
      .where(!isHeaderFooter(col(paraNumCol), col(textCol), headerRegexes))
  }
}
