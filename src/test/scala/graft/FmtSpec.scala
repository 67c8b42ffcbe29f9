package graft

import org.scalatest.funsuite.AnyFunSuite

class FmtSpec extends AnyFunSuite {

  test("zpad: ASCII zero-padded decimals regardless of default locale") {
    assert(Fmt.zpad(0L, 4) == "0000")
    assert(Fmt.zpad(7L, 1) == "7")
    assert(Fmt.zpad(7L, 4) == "0007")
    assert(Fmt.zpad(12345L, 4) == "12345") // wider than width: no truncation
    assert(Fmt.zpad(1787082286596L, 13) == "1787082286596")
    assert(Fmt.zpad(-42L, 6) == "-00042") // sign before padding
    assert(Fmt.zpad(Long.MinValue, 4) == "-9223372036854775808") // no double sign
    // locale-independence: same output under a non-ASCII-digit locale
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(
        java.util.Locale.forLanguageTag("ar-SA-u-nu-arab"))
      assert(Fmt.zpad(907L, 6) == "000907")
      assert(Fmt.yearStart(1978) == "1978-01-01")
      assert(Fmt.yearEnd(905) == "0905-12-31")
    } finally java.util.Locale.setDefault(saved)
  }
}
