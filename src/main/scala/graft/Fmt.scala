package graft

/** Locale-free numeric formatting for load-bearing strings.
  *
  * Scala's `f` interpolator delegates to `String.format` with the JVM
  * DEFAULT locale, whose zero digit is not ASCII '0' everywhere (Arabic-
  * Indic numbering locales): under such a default, `f"$ts%013d"` would put
  * non-ASCII digits into manifest commit names, snapshot file names and
  * date-filter bounds — corrupting name-sort recency, file discovery and
  * string-range comparisons against stored ASCII dates. Bench/tool mains pin
  * `Locale.setDefault(Locale.ROOT)`, but library code cannot assume its
  * host process did; every on-disk or comparison-bearing number goes
  * through here instead.
  */
object Fmt {

  /** `v` in ASCII decimal, zero-padded to at least `width` digits.
    * Negative values keep their sign before the padding (not expected on
    * any call site, but never silently mangled).
    */
  def zpad(v: Long, width: Int): String = {
    val neg = v < 0
    // strip the sign from toString rather than abs()-ing the value:
    // math.abs(Long.MinValue) == Long.MinValue, which would double-sign it
    val digits = {
      val s = java.lang.Long.toString(v)
      if (neg) s.substring(1) else s
    }
    val pad = width - digits.length - (if (neg) 1 else 0)
    val sb = new java.lang.StringBuilder(math.max(width, digits.length + 1))
    if (neg) sb.append('-')
    var i = 0
    while (i < pad) { sb.append('0'); i += 1 }
    sb.append(digits).toString
  }

  /** First day of `year` as the ASCII "YYYY-01-01" string used by the
    * date-filter comparisons (and the matching year end). */
  def yearStart(y: Int): String = zpad(y.toLong, 4) + "-01-01"
  def yearEnd(y: Int): String = zpad(y.toLong, 4) + "-12-31"
}
