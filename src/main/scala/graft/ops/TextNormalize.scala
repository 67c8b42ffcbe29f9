package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F1-F3 text-normalization projections (SURVEY §2.2), as pure Column
  * expression chains — whole-stage-codegen'd, no UDF.
  *
  *  - F1 unicode cleanup + punctuation normalization + whitespace collapse
  *    (paragraph_generator/base.py:144-194)
  *  - F2 ordered literal typo substitutions (base.py:196-199)
  *  - F3 language-specific dialogue-pattern normalization
  *    (language_meta.py:100-116, 139-155)
  */
object TextNormalize {

  /** F1 unicode-space cleanup (base.py:150-154): NBSP/thin/narrow → space;
    * zero-width space and BOM removed.
    */
  def cleanUnicode(c: Column): Column =
    regexp_replace(translate(c, "   ", "   "), "[​﻿]", "")

  /** F1 punctuation normalization (base.py:171-195): purn-viram OCR fixes
    * (| I l 1 → ।), ॥ → ।, no space after opening / before closing
    * punctuation, no space before ellipses.
    */
  def normalizePunctuation(c: Column): Column = {
    val purn = regexp_replace(c, "[|Il1]", "।")
    val danda = regexp_replace(purn, "॥", "।")
    val open = regexp_replace(danda, "([(\\[{'\"])\\s+", "$1")
    // the reference carries one more rule here — \s+(\.{2,}) → $1
    // (base.py:190-193, space-before-ellipsis) — but it is provably
    // unreachable: the close rule above already removed every whitespace
    // run before a '.', so no \s+\.\. sequence can survive to match (true
    // in the reference too — its rule is equally dead). Output is
    // byte-identical without it, and dropping it saves one full regex
    // pass per row of the corpus text column.
    regexp_replace(open, "\\s+([।.,?!:;)\\]}'\"])", "$1")
  }

  /** F2: ordered literal replacements from a per-document typo list. */
  def applyTypos(c: Column, typos: Seq[(String, String)]): Column =
    typos.foldLeft(c) { case (col, (from, to)) =>
      regexp_replace(col, java.util.regex.Pattern.quote(from),
        java.util.regex.Matcher.quoteReplacement(to))
    }

  /** F3 Hindi dialogue normalization (language_meta.py:100-116): prefix typo
    * regexes, then join lines EXCEPT before dialogue prefixes (negative
    * lookahead — Java regex, fine in Spark's codegen'd regexp_replace).
    */
  def normalizeDialogueHindi(c: Column): Column = {
    val q = regexp_replace(c, "प्रश[्न]*:", "प्रश्न:")
    val a = regexp_replace(q, "उत्त[र]*:", "उत्तर:")
    regexp_replace(a, "\\n(?!प्रश्न:|उत्तर:)", " ")
  }

  /** F3 Gujarati dialogue normalization (language_meta.py:139-155): મુમુક્ષુ
    * typo regex, then join lines except before the seven dialogue prefixes.
    */
  def normalizeDialogueGujarati(c: Column): Column = {
    val m = regexp_replace(c, "મુમુ[^:]*ષુ[^:]*:", "મુમુક્ષુ:")
    regexp_replace(m,
      "\\n(?!શ્રોતા:|પૂજ્ય ગુરુદેવશ્રી:|મુમુક્ષુ:|શંકા:|પ્રશ્ન:|સમાધાન:|ઉત્તર:)", " ")
  }

  /** F1 final whitespace collapse (base.py:167). */
  def collapseWhitespace(c: Column): Column = trim(regexp_replace(c, "\\s+", " "))

  /** The full F1(+F2) chain in reference order (base.py:144-169), minus the
    * language-dispatch F3 step (callers insert [[normalizeDialogueHindi]] or
    * a Gujarati variant between typos and collapse when lang is known).
    */
  def normalize(c: Column, typos: Seq[(String, String)] = Nil): Column =
    collapseWhitespace(applyTypos(normalizePunctuation(cleanUnicode(c)), typos))
}
