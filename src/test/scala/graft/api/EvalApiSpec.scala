package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods.{parse, compact, render}
import graft.corpus.SparkTestSession

/** The offline evaluation surface vs the reference's eval router
  * (`reference/eval/api.py`, `eval/ocr.py`, `eval/scan_config.py`):
  * extraction parity with the pipeline ops, the two hierarchical config
  * merges (including the last-file-read quirk), the batch-job lifecycle
  * (progress, zip, cancel, retention), the scripture parse, and the HTTP
  * mounting through [[SearchHttpServer]].
  */
class EvalApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private implicit val formats: Formats = DefaultFormats

  private def tempBase(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("evalapi").toFile
    d.deleteOnExit()
    d
  }

  private def writeFile(dir: java.io.File, name: String, content: String): java.io.File = {
    dir.mkdirs()
    val f = new java.io.File(dir, name)
    java.nio.file.Files.write(f.toPath,
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    f
  }

  private def mkApi(base: java.io.File, now: () => Long = () => System.currentTimeMillis(),
      retentionMs: Long = 3600000L): EvalApi =
    new EvalApi(spark, basePdfPath = base.getPath, baseTextPath = s"${base.getPath}/text",
      baseOcrPath = s"${base.getPath}/ocr", nowMs = now, retentionMs = retentionMs)

  // ------------------------------------------------------------------
  // /eval/paths + /eval/cost
  // ------------------------------------------------------------------

  test("paths returns the three configured roots (api.py:127-142)") {
    val base = tempBase()
    val j = mkApi(base).paths
    assert((j \ "base_pdf_path").extract[String] == base.getPath)
    assert((j \ "base_text_path").extract[String] == s"${base.getPath}/text")
    assert((j \ "base_ocr_path").extract[String] == s"${base.getPath}/ocr")
  }

  test("cost: ₹0.13/page for google OCR, free otherwise (ocr.py:384-401)") {
    val ev = mkApi(tempBase())
    val g = ev.cost(parse("""{"total_pages": 100, "use_google_ocr": true}"""))
    assert((g \ "cost").extract[String] == "13.00")
    assert((g \ "pages").extract[Int] == 100)
    assert((g \ "currency").extract[String] == "₹")
    val t = ev.cost(parse("""{"total_pages": 100}"""))
    assert((t \ "cost").extract[String] == "0.00")
    intercept[IllegalArgumentException](ev.cost(parse("""{"use_google_ocr": true}""")))
  }

  // ------------------------------------------------------------------
  // /eval/scan-config (scan_config.py:51-143)
  // ------------------------------------------------------------------

  private def scanTree(): (java.io.File, EvalApi) = {
    val base = tempBase()
    writeFile(base, "scan_config.json",
      """{"default": {"header_prefix": ["top"], "psm": 6, "crop": {"top": 5}}}""")
    val sub = new java.io.File(base, "sub")
    writeFile(sub, "scan_config.json",
      """{"default": {"header_prefix": ["mid"], "psm": 3, "crop": {"bottom": 7}},
        | "mybook": {"typo_list": [["teh", "the"]], "file_url": "http://x",
        |            "start_page": 2, "end_page": 9, "psm": 11}}""".stripMargin)
    writeFile(sub, "mybook.pdf", "x")
    writeFile(sub, "nostanza.pdf", "x")
    (base, mkApi(base))
  }

  test("scan-config: lists extend base-first, scalars deepest-wins, crop per-axis") {
    val (_, ev) = scanTree()
    val j = ev.scanConfig("sub/mybook.pdf").toOption.get
    assert((j \ "header_prefix").extract[Seq[String]] == Seq("top", "mid"))
    assert((j \ "crop" \ "top").extract[Int] == 5)     // base axis survives
    assert((j \ "crop" \ "bottom").extract[Int] == 7)  // deeper axis added
    assert((j \ "psm").extract[Int] == 11)             // file layer wins over both defaults
    assert((j \ "typo_list").extract[Seq[Seq[String]]] == Seq(Seq("teh", "the")))
    assert((j \ "file_url").extract[String] == "http://x")
    assert((j \ "start_page").extract[Int] == 2 && (j \ "end_page").extract[Int] == 9)
  }

  test("scan-config quirk: file layer comes from the LAST config read only") {
    val base = tempBase()
    // base config HAS an entry for the stem, but a deeper config exists and
    // lacks it → the file-specific layer is skipped entirely
    // (scan_config.py keeps only the last scan_config_data read)
    writeFile(base, "scan_config.json",
      """{"default": {"psm": 6}, "other": {"file_url": "http://ignored"}}""")
    val sub = new java.io.File(base, "sub2")
    writeFile(sub, "scan_config.json", """{"default": {"psm": 4}}""")
    writeFile(sub, "other.pdf", "x")
    val j = mkApi(base).scanConfig("sub2/other.pdf").toOption.get
    assert((j \ "psm").extract[Int] == 4)
    assert((j \ "file_url") == JNothing) // base's stem entry was NOT consulted
  }

  test("path traversal: relative paths escaping the base 404, never read outside") {
    val parent = tempBase()
    val base = new java.io.File(parent, "root")
    writeFile(base, "scan_config.json", """{"default": {"psm": 6}}""")
    // a real file OUTSIDE the base — traversal must not see it
    writeFile(parent, "secret.pdf", "x")
    writeFile(parent, "secret.md", "# T\n\n## Gatha 1\n\nx\n")
    // and a SIBLING dir sharing the base's name prefix must not leak configs
    writeFile(new java.io.File(parent, "root2"), "scan_config.json",
      """{"default": {"psm": 99}}""")
    writeFile(new java.io.File(parent, "root2"), "inroot2.pdf", "x")
    val ev = mkApi(base)
    assert(ev.scanConfig("../secret.pdf") == Left((404, "File not found: ../secret.pdf")))
    assert(ev.scanConfig("sub/../../secret.pdf").isLeft)
    assert(ev.scripture("../secret.md").isLeft)
    assert(ev.mergedConfig("../secret.md", base) == Map.empty)
    assert(ev.scanConfig("../root2/inroot2.pdf").isLeft) // sibling-prefix guard
  }

  test("scan-config: missing file 404s; partial page range omitted; corrupt json skipped") {
    val (base, ev) = scanTree()
    assert(ev.scanConfig("sub/nope.pdf") == Left((404, "File not found: sub/nope.pdf")))
    // only start_page → neither end emitted (scan_config.py:121-126)
    val sub3 = new java.io.File(base, "sub3")
    writeFile(sub3, "scan_config.json",
      """{"default": {}, "half": {"start_page": 3}}""")
    writeFile(sub3, "half.pdf", "x")
    val j = ev.scanConfig("sub3/half.pdf").toOption.get
    assert((j \ "start_page") == JNothing && (j \ "end_page") == JNothing)
    assert((j \ "file_url").extract[String] == "") // but file_url always present
    // corrupt deeper config is skipped, not fatal (scan_config.py:108-110)
    val sub4 = new java.io.File(base, "sub4")
    writeFile(sub4, "scan_config.json", "{not json")
    writeFile(sub4, "doc.pdf", "x")
    val j4 = ev.scanConfig("sub4/doc.pdf").toOption.get
    assert((j4 \ "psm").extract[Int] == 6) // base default still applied
  }

  // ------------------------------------------------------------------
  // /eval/extract — parity with the pipeline ops (api.py:176-353)
  // ------------------------------------------------------------------

  private val hindiLines: Seq[(String, Int, Int, Int)] = Seq(
    // (text, conf, xStart, xEnd)
    ("प्रस्तावना", 95, 35, 65),                     // centered heading
    ("यह पहली पंक्ति है और वाक्य", 92, 0, 100),
    ("यहाँ समाप्त होता है।", 91, 0, 70),
    ("garbage", 5, 0, 100),                          // dropped: conf <= 10
    ("दूसरा अनुच्छेद शुरू होता है", 88, 10, 100),
    ("और यह भी पूरा होता है।", 90, 0, 60))

  private def linesJson(ls: Seq[(String, Int, Int, Int)]): String =
    ls.map { case (t, c, xs, xe) =>
      s"""{"text": ${compact(render(JString(t)))}, "conf": $c, "x_start": $xs, "x_end": $xe}"""
    }.mkString("[", ",", "]")

  test("extract mode=advanced == confidenceFilter + AdvancedParagraphs.generate") {
    import spark.implicits._
    import graft.ops.AdvancedParagraphs
    val ev = mkApi(tempBase())
    val j = ev.extract(parse(
      s"""{"lines": ${linesJson(hindiLines)}, "language": "hin", "mode": "advanced"}"""))
    // direct pipeline with the same line numbering (index over ALL lines)
    val direct = AdvancedParagraphs.generate(spark,
      hindiLines.zipWithIndex.collect { case ((t, c, xs, xe), i) if c > 10 && t != null =>
        AdvancedParagraphs.OcrLine(0L, 1, i, t, xs, xe)
      }.toDS(), AdvancedParagraphs.Hindi)
      .collect().sortBy(_.paraId).map(_.text).toSeq
    assert(direct.nonEmpty)
    val paras = (j \ "paragraphs").extract[Seq[JObject]].map(p => (p \ "text").extract[String])
    assert(paras == direct)
    assert((j \ "text").extract[String] == direct.mkString("\n\n----\n\n"))
    assert((j \ "language").extract[String] == "hin")
  }

  test("extract mode=psm6 == Paragraphs.combineLines over conf-filtered lines") {
    import spark.implicits._
    import graft.ops.Paragraphs
    val ev = mkApi(tempBase())
    val j = ev.extract(parse(
      s"""{"lines": ${linesJson(hindiLines)}, "language": "hin", "mode": "psm6"}"""))
    val direct = Paragraphs.combineLines(spark,
      hindiLines.filter(l => l._1 != null && l._2 > 10).zipWithIndex.map {
        case ((t, _, _, _), i) => Paragraphs.Line(0L, i, t)
      }.toDS()).collect().sortBy(_.paraNum).map(_.text).toSeq
    assert(direct.nonEmpty)
    val paras = (j \ "paragraphs").extract[Seq[JObject]].map(p => (p \ "text").extract[String])
    assert(paras == direct)
  }

  test("extract: page_text convenience form, crop drops line fractions, validation") {
    val ev = mkApi(tempBase())
    // 10 lines, crop 20/20 → round(10*.2)=2 dropped each end
    val text = (1 to 10).map(i => s"पंक्ति संख्या $i है।").mkString("\\n")
    val j = ev.extract(parse(
      s"""{"page_text": "$text", "mode": "psm6", "crop_top": 20, "crop_bottom": 20}"""))
    val out = (j \ "text").extract[String]
    assert(!out.contains("संख्या 2 है") && !out.contains("संख्या 9 है"))
    assert(out.contains("संख्या 3 है") && out.contains("संख्या 8 है"))
    intercept[IllegalArgumentException](ev.extract(parse(
      s"""{"page_text": "x", "crop_top": 51}""")))       // api.py:206-207
    intercept[IllegalArgumentException](ev.extract(parse(
      """{"page_text": "x", "mode": "fancy"}""")))
    intercept[IllegalArgumentException](ev.extract(parse("""{"language": "hin"}""")))
  }

  // ------------------------------------------------------------------
  // Batch lifecycle (api.py:362-468 + ocr.py:38-417)
  // ------------------------------------------------------------------

  private def awaitStatus(ev: EvalApi, id: String, want: Set[String],
      timeoutMs: Long = 60000): JValue = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var j = ev.batchStatus(id).toOption.get
    while (!want.contains((j \ "status").extract[String]) &&
        System.currentTimeMillis() < deadline) {
      Thread.sleep(50)
      j = ev.batchStatus(id).toOption.get
    }
    j
  }

  test("batch: full lifecycle — progress, zip naming/content, download") {
    val clock = new java.util.concurrent.atomic.AtomicLong(1000000L)
    val ev = mkApi(tempBase(), now = () => clock.get())
    val pages = Seq("पहला पृष्ठ है।", "दूसरा पृष्ठ है।\\nदूसरी पंक्ति भी।", "तीसरा पृष्ठ है।")
    val start = ev.startBatch(parse(
      s"""{"pages": [${pages.map(p => s""""$p"""").mkString(",")}],
         | "language": "hin", "mode": "psm6"}""".stripMargin))
    val id = (start \ "job_id").extract[String]
    clock.addAndGet(2500) // elapsed_time ticks off the injected clock
    val done = awaitStatus(ev, id, Set("completed", "failed"))
    assert((done \ "status").extract[String] == "completed",
      (done \ "error").extract[Option[String]].getOrElse(""))
    assert((done \ "progress").extract[Int] == 3)
    assert((done \ "total_pages").extract[Int] == 3)
    assert((done \ "zip_filename").extract[String] == s"extracted_text_$id.zip")
    assert((done \ "elapsed_time").extract[Double] == 2.5)
    assert((done \ "elapsed_time_formatted").extract[String] == "2.5s")
    val (fn, bytes) = ev.downloadBatch(id).toOption.get
    assert(fn == s"extracted_text_$id.zip")
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    val entries = Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map { e =>
      e.getName -> new String(zin.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    }.toMap
    assert(entries.keySet == Set("page_0001.txt", "page_0002.txt", "page_0003.txt"))
    // each page file == the single-page extract of the same input (ocr.py:273)
    pages.zipWithIndex.foreach { case (p, i) =>
      val single = ev.extract(parse(s"""{"page_text": "$p", "mode": "psm6"}"""))
      assert(entries(f"page_${i + 1}%04d.txt") == (single \ "text").extract[String], s"page $i")
    }
    ev.shutdown()
  }

  test("batch: unknown id 404s; completed job cannot be cancelled; bad body rejected") {
    val ev = mkApi(tempBase())
    assert(ev.batchStatus("nope") == Left((404, "Job not found")))
    assert(ev.downloadBatch("nope").isLeft)
    intercept[IllegalArgumentException](ev.startBatch(parse("""{"pages": []}""")))
    intercept[IllegalArgumentException](ev.startBatch(parse(
      """{"pages": ["x"], "mode": "bogus"}""")))
    val id = (ev.startBatch(parse("""{"pages": ["एक पंक्ति।"], "mode": "psm6"}"""))
      \ "job_id").extract[String]
    awaitStatus(ev, id, Set("completed", "failed"))
    assert(ev.cancelBatch(id) == Left((404, "Job not found or cannot be cancelled")))
    ev.shutdown()
  }

  test("batch: cancelling a PROCESSING job reports canceled, never failed") {
    // pre-fix, the mid-loop cancel check used a `return` inside the
    // grouped(...).foreach closure — a thrown NonLocalReturnControl the
    // catch-Throwable intercepted, flipping the just-set "canceled" to
    // "failed" with a bogus error. Enough pages for several groups so the
    // between-groups check is what observes the cancel.
    val ev = mkApi(tempBase())
    val id = (ev.startBatch(parse(
      s"""{"pages": [${Seq.fill(40)(""""कुछ पाठ है।"""").mkString(",")}], "mode": "psm6"}"""))
      \ "job_id").extract[String]
    awaitStatus(ev, id, Set("processing", "completed", "failed"))
    ev.cancelBatch(id) // 404 when already terminal — the assert below still holds
    val st = awaitStatus(ev, id, Set("canceled", "completed", "failed"))
    assert((st \ "status").extract[String] != "failed",
      s"cancel mid-processing must never read as failure: $st")
    ev.shutdown()
  }

  test("batch: a queued job behind a saturated pool cancels before it runs") {
    val ev = mkApi(tempBase())
    // two slow-ish jobs occupy both workers (ocr.py:44 max_workers analog)
    def slow() = (ev.startBatch(parse(
      s"""{"pages": [${Seq.fill(12)(""""कुछ पाठ है।"""").mkString(",")}], "mode": "psm6"}"""))
      \ "job_id").extract[String]
    val (a, b) = (slow(), slow())
    val queued = (ev.startBatch(parse("""{"pages": ["रद्द होने वाला।"], "mode": "psm6"}"""))
      \ "job_id").extract[String]
    val c = ev.cancelBatch(queued)
    assert(c.isRight)
    val st = awaitStatus(ev, queued, Set("canceled", "completed", "failed"))
    assert((st \ "status").extract[String] == "canceled")
    Seq(a, b).foreach(awaitStatus(ev, _, Set("completed", "failed")))
    ev.shutdown()
  }

  test("batch retention: old completed jobs + their dirs are dropped (ocr.py:403-417)") {
    val clock = new java.util.concurrent.atomic.AtomicLong(5000000L)
    val ev = mkApi(tempBase(), now = () => clock.get(), retentionMs = 1000L)
    val id = (ev.startBatch(parse("""{"pages": ["एक पंक्ति।"], "mode": "psm6"}"""))
      \ "job_id").extract[String]
    awaitStatus(ev, id, Set("completed", "failed"))
    val (_, bytes) = ev.downloadBatch(id).toOption.get
    assert(bytes.nonEmpty)
    clock.addAndGet(5000) // past retention
    ev.cleanupOldJobs()
    assert(ev.batchStatus(id) == Left((404, "Job not found")))
    assert(ev.downloadBatch(id).isLeft)
    ev.shutdown()
  }

  // ------------------------------------------------------------------
  // /eval/scripture (api.py:501-538)
  // ------------------------------------------------------------------

  private val granthMd =
    """# Pratham Adhikar
      |
      |## Gatha 1
      |
      |गाथा पाठ
      |
      |### Translation
      |
      |the translation
      |
      |## Intro Prose
      |
      |intro para
      |""".stripMargin

  test("scripture: markdown parse + hierarchical config.json metadata merge") {
    val base = tempBase()
    writeFile(base, "config.json", """{"name": "Root Name", "Author": "Base Author"}""")
    val sub = new java.io.File(base, "granths")
    writeFile(sub, "config.json",
      """{"name": "Samaysar", "language": "Gujarati", "Anuyog": "Dravya"}""")
    writeFile(sub, "kalash_config.json", """{"Teekakar": "Amritchandra"}""")
    writeFile(sub, "kalash.md", granthMd)
    val ev = mkApi(base)
    val j = ev.scripture("granths/kalash.md").toOption.get
    assert((j \ "name").extract[String] == "Samaysar")           // deeper config wins
    assert((j \ "original_filename").extract[String] == "granths/kalash.md")
    val meta = j \ "metadata"
    assert((meta \ "author").extract[String] == "Base Author")   // inherited from base
    assert((meta \ "teekakar").extract[String] == "Amritchandra") // <stem>_config last
    assert((meta \ "anuyog").extract[String] == "Dravya")
    assert((meta \ "language").extract[String] == "gu")          // gujarati → gu
    val (verses, proses) = graft.crawler.MarkdownGranth.parse(granthMd)
    assert((j \ "verses").extract[Seq[JValue]].size == verses.size && verses.size == 1)
    assert((j \ "prose_sections").extract[Seq[JValue]].size == proses.size && proses.size == 1)
    assert(((j \ "verses").extract[Seq[JValue]].head \ "language").extract[String] == "gu")
    // guards
    assert(ev.scripture("granths/missing.md").isLeft)
    writeFile(sub, "notmd.txt", "x")
    assert(ev.scripture("granths/notmd.txt") == Left((400, "File must be a markdown (.md) file")))
  }

  // ------------------------------------------------------------------
  // /eval/bookmarks/extract (api.py:540-594, base.py:30-108)
  // ------------------------------------------------------------------

  test("bookmark title parse: pravachan numbers + DD-MM-YYYY normalization") {
    import EvalApi.parseTitle
    // Devanagari digits are ASCII-normalized before capture (base.py prompt
    // normalizes too — the LLM returns ASCII)
    assert(parseTitle("प्रवचन नं. १२३, 26th Sep 1978") == (Some("123"), Some("26-09-1978")))
    assert(parseTitle("Pravachan No. 45 - 3/1/78") == (Some("45"), Some("03-01-1978")))
    assert(parseTitle("7) गाथा 26.09.1978") == (Some("7"), Some("26-09-1978")))
    assert(parseTitle("plain chapter heading") == (None, None))
    // full month name + 2-digit day, no ordinal suffix
    assert(parseTitle("2 January 2001")._2.contains("02-01-2001"))
    // a LEADING date's day is not a pravachan number (date-only titles)
    assert(parseTitle("26.09.1978") == (None, Some("26-09-1978")))
    assert(parseTitle("26-09-1978 व्याख्यान") == (None, Some("26-09-1978")))
    // but an explicit pravachan prefix is never date-shadowed
    assert(parseTitle("प्रवचन 26.09.1978") == (Some("26"), Some("26-09-1978")))
    // an earlier NON-date that merely fits the regex shape must not shadow a
    // real date later in the title (pre-fix, first-match-only parsing
    // dropped the genuine date in both families)
    assert(parseTitle("15 minutes 1990 recording - 26 Sep 1978")._2
      .contains("26-09-1978")) // "min" is no month; keep scanning
    assert(parseTitle("version 3/25/2020 scan, pravachan 26-09-1978")._2
      .contains("26-09-1978")) // month 25 is invalid; keep scanning
  }

  test("extractBookmarks echoes outline rows with parsed fields") {
    val ev = mkApi(tempBase())
    val j = ev.extractBookmarks(parse(
      """{"pdf_path": "a/b.pdf", "bookmarks": [
        |  {"page": 3, "level": 1, "title": "प्रवचन नं. 12, 26th Sep 1978"},
        |  {"page": 9, "level": 2, "title": "untitled section"}]}""".stripMargin)).toOption.get
    assert((j \ "total").extract[Int] == 2)
    assert((j \ "pdf_path").extract[String] == "a/b.pdf")
    val rows = (j \ "bookmarks").extract[Seq[JObject]]
    assert((rows(0) \ "pravachan_no").extract[String] == "12")
    assert((rows(0) \ "date").extract[String] == "26-09-1978")
    assert((rows(1) \ "pravachan_no") == JNull && (rows(1) \ "date") == JNull)
    assert(ev.extractBookmarks(parse("""{"bookmarks": "nope"}""")).isLeft)
  }

  // ------------------------------------------------------------------
  // HTTP mounting through SearchHttpServer
  // ------------------------------------------------------------------

  private lazy val mem = {
    val dir = "/tmp/gidx-evalapi"
    graft.index.TableIO.deleteRecursive(dir)
    graft.index.IndexBuild.build(spark,
      graft.corpus.Webtext.synthesize(spark, 120).toDF(), dir, numChunks = 1)
    graft.query.InMemoryIndex.load(spark, graft.query.IndexHandle.load(dir))
  }

  private val client = java.net.http.HttpClient.newHttpClient()
  private def httpGet(port: Int, path: String): (Int, String, java.net.http.HttpHeaders) = {
    val r = client.send(java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body(), r.headers())
  }
  private def httpPost(port: Int, path: String, body: String): (Int, String) = {
    val r = client.send(java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"http://127.0.0.1:$port$path"))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("HTTP: /eval routes mount, validate, stream the zip, and 404 when absent") {
    val base = scanTree()._1
    val ev = mkApi(base)
    val server = new SearchHttpServer(mem, evalApi = Some(ev))
    server.start()
    try {
      val port = server.boundPort
      val (pc, pb, _) = httpGet(port, "/eval/paths")
      assert(pc == 200 && (parse(pb) \ "base_pdf_path").extract[String] == base.getPath)
      // scan-config via query param + its validation error
      val (sc, sb, _) = httpGet(port, "/eval/scan-config?relative_path=sub/mybook.pdf")
      assert(sc == 200 && (parse(sb) \ "psm").extract[Int] == 11)
      assert(httpGet(port, "/eval/scan-config")._1 == 400)
      assert(httpGet(port, "/eval/paths2")._1 == 404)     // exactPath guard
      assert(httpPost(port, "/eval/paths", "{}")._1 == 405)
      assert(httpGet(port, "/eval/extract")._1 == 405)
      // extract parity over the wire
      val (ec, eb) = httpPost(port, "/eval/extract",
        s"""{"lines": ${linesJson(hindiLines)}, "mode": "psm6"}""")
      assert(ec == 200)
      val direct = ev.extract(parse(s"""{"lines": ${linesJson(hindiLines)}, "mode": "psm6"}"""))
      assert((parse(eb) \ "text") == (direct \ "text"))
      // FastAPI-style validation error shape (endpoint catch → 400)
      val (vc, vb) = httpPost(port, "/eval/extract", """{"page_text": "x", "crop_top": 99}""")
      assert(vc == 400 && vb.contains("Validation error"))
      // malformed JSON is the client's fault too (422 analog), not a 500
      val (mc, mb) = httpPost(port, "/eval/extract", "{not json")
      assert(mc == 400 && mb.contains("Validation error"))
      // traversal over the wire (query param form)
      assert(httpGet(port, "/eval/scan-config?relative_path=../../etc/passwd")._1 == 404)
      // batch over the wire: start → status → download with zip headers
      val (bc, bb) = httpPost(port, "/eval/batch",
        """{"pages": ["एक पंक्ति है।"], "mode": "psm6"}""")
      assert(bc == 200)
      val id = (parse(bb) \ "job_id").extract[String]
      awaitStatus(ev, id, Set("completed", "failed"))
      val (stc, stb, _) = httpGet(port, s"/eval/batch/status/$id")
      assert(stc == 200 && (parse(stb) \ "status").extract[String] == "completed")
      val (dc, db, dh) = httpGet(port, s"/eval/batch/download/$id")
      assert(dc == 200 && db.nonEmpty)
      assert(dh.firstValue("Content-Type").get == "application/zip")
      assert(dh.firstValue("Content-Disposition").get ==
        s"""attachment; filename="extracted_text_$id.zip"""")
      assert(httpPost(port, s"/eval/batch/cancel/$id", "")._1 == 404) // already done
      assert(httpGet(port, "/eval/batch/status/unknown")._1 == 404)
      // scripture + cost + bookmarks routes
      writeFile(new java.io.File(base, "g"), "config.json", """{"name": "G"}""")
      writeFile(new java.io.File(base, "g"), "one.md", granthMd)
      val (gc, gb) = httpPost(port, "/eval/scripture", """{"relative_path": "g/one.md"}""")
      assert(gc == 200 && (parse(gb) \ "name").extract[String] == "G")
      assert(httpPost(port, "/eval/scripture", "{}")._1 == 400)
      val (cc, cb) = httpPost(port, "/eval/cost", """{"total_pages": 2, "use_google_ocr": true}""")
      assert(cc == 200 && (parse(cb) \ "cost").extract[String] == "0.26")
      val (kc, kb) = httpPost(port, "/eval/bookmarks/extract",
        """{"bookmarks": [{"page": 1, "level": 1, "title": "Pravachan No. 9, 1.2.1980"}]}""")
      assert(kc == 200 &&
        ((parse(kb) \ "bookmarks").extract[Seq[JValue]].head \ "date")
          .extract[String] == "01-02-1980")
    } finally { server.stop(); ev.shutdown() }

    // without an EvalApi the routes simply don't exist (deployment w/o router)
    val bare = new SearchHttpServer(mem)
    bare.start()
    try assert(httpGet(bare.boundPort, "/eval/paths")._1 == 404)
    finally bare.stop()
  }

  test("HTTP: a chunk-subset fleet shard refuses /eval like the public surface") {
    val ev = mkApi(tempBase())
    val server = new SearchHttpServer(mem, evalApi = Some(ev), internalOnly = true)
    server.start()
    try {
      val (c, b, _) = httpGet(server.boundPort, "/eval/paths")
      assert(c == 503 && b.contains("chunk subset"))
      assert(httpPost(server.boundPort, "/eval/extract", """{"page_text": "x"}""")._1 == 503)
    } finally { server.stop(); ev.shutdown() }
  }

  test("orphan eval_batch_* dirs from a dead JVM are swept once aged; fresh/foreign dirs survive") {
    val ev = mkApi(tempBase())
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    // an aged dir no instance tracks — the crashed-JVM leftover shape
    val orphan = new java.io.File(tmp, s"eval_batch_orphan_${System.nanoTime()}")
    assert(orphan.mkdir())
    writeFile(orphan, "page_0001.txt", "stale")
    assert(orphan.setLastModified(System.currentTimeMillis() - 2 * 3600 * 1000L))
    // a FRESH untracked dir — could belong to a concurrent instance in this
    // JVM; the age floor must protect it even under short retention
    val fresh = new java.io.File(tmp, s"eval_batch_fresh_${System.nanoTime()}")
    assert(fresh.mkdir())
    try {
      ev.sweepOrphanDirs()
      assert(!orphan.exists(), "aged orphan dir must be swept")
      assert(fresh.exists(), "fresh dir must survive the sweep")
    } finally {
      fresh.delete()
      scala.reflect.io.Directory(orphan).deleteRecursively()
      ev.shutdown()
    }
  }
}
