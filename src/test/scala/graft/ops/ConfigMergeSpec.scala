package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.SparkTestSession

/** J2 config-merge anchoring — reference `scan_config.py:75-143`:
  * `scan_config_data` is kept from the LAST scan_config.json read along the
  * path, regardless of whether that file defines a "default" section, so the
  * file-specific layer binds to the deepest config FILE, not the deepest
  * default section.
  */
class ConfigMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(docs: Seq[(Long, String)], cfg: Seq[(String, String, String, String, Int, String)]) = {
    import spark.implicits._
    val d = docs.toDF("doc_id", "path")
    val c = cfg.toDF("cfg_dir", "scope", "kind", "key", "ord", "value")
    ConfigMerge.effectiveConfigs(d, c)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getString(2)).toMap
  }

  test("file-specific layer binds to the deepest config FILE (even without a default section)") {
    val out = run(
      docs = Seq((40L, "base/a/40.pdf"), (41L, "base/a/41.pdf")),
      cfg = Seq(
        ("base", "default", "scalar", "psm", 0, "3"),
        ("base", "default", "list", "header_prefix", 0, "^Page"),
        // deepest config file has ONLY a stem-scoped section
        ("base/a", "40", "scalar", "psm", 0, "99"),
        ("base/a", "40", "list", "header_prefix", 0, "^Doc40")))
    assert(out((40L, "psm")) == "99") // file layer applies from base/a
    assert(out((40L, "header_prefix")) == "^Page,^Doc40") // lists extend, file layer last
    assert(out((41L, "psm")) == "3") // other stems unaffected
    assert(out((41L, "header_prefix")) == "^Page")
  }

  test("an empty deeper config file (sentinel) blocks a shallower file's stem rows") {
    val out = run(
      docs = Seq((43L, "base/b/43.pdf")),
      cfg = Seq(
        ("base", "default", "scalar", "psm", 0, "3"),
        ("base", "43", "scalar", "psm", 0, "77"), // shallower file-specific row
        ("base/b", "default", "sentinel", "", 0, ""))) // base/b has a config file
    // scan_config_data = base/b's file → file_config for stem 43 is empty
    assert(out((43L, "psm")) == "3")
    assert(!out.contains((43L, ""))) // sentinel contributes no keys
  }

  test("a file whose stem is literally 'default' gets the section twice (reference get(stem) quirk)") {
    // scan_config.py's file layer is config.get(stem): for default.pdf that
    // returns the SAME dict as the default section, so the reference extends
    // list keys twice (default layer + file layer) — pre-fix our scope
    // encoding collapsed both into one layer-0 application
    val out = run(
      docs = Seq((50L, "base/default.pdf"), (51L, "base/51.pdf")),
      cfg = Seq(
        ("base", "default", "list", "header_prefix", 0, "^X"),
        ("base", "default", "scalar", "psm", 0, "3")))
    assert(out((50L, "header_prefix")) == "^X,^X") // applied as BOTH layers
    assert(out((50L, "psm")) == "3") // scalar: same value either layer
    assert(out((51L, "header_prefix")) == "^X") // other stems: once
  }

  test("scalar precedence: deepest default wins below the file layer") {
    val out = run(
      docs = Seq((7L, "base/x/y/7.pdf")),
      cfg = Seq(
        ("base", "default", "scalar", "psm", 0, "3"),
        ("base/x", "default", "scalar", "psm", 0, "6"),
        ("base/x/y", "default", "list", "typo_list", 0, "a=>b")))
    assert(out((7L, "psm")) == "6")
    assert(out((7L, "typo_list")) == "a=>b")
  }
}
