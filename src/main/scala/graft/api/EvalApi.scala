package graft.api

import org.apache.spark.sql.SparkSession
import org.json4s._
import graft.crawler.MarkdownGranth
import graft.ops.{AdvancedParagraphs, Paragraphs}

/** The reference's evaluation surface (`reference/eval/api.py`,
  * `reference/eval/ocr.py`) — the offline debugging API operators use to
  * inspect extraction quality before an index build. Re-expressed at this
  * engine's declared model boundary: the reference's per-request work is
  * tesseract OCR over page images; ours is the same downstream pipeline
  * (confidence filter → classify → FSM → combine) over the OCR line table
  * the codec would produce, so every decode-independent stage is exercised
  * for real. Endpoints (mounted under `/eval` by [[SearchHttpServer]]):
  *
  *   - GET  /eval/paths                      (api.py:127-142)
  *   - GET  /eval/scan-config?relative_path= (api.py:144-174, scan_config.py:51-143)
  *   - POST /eval/extract                    (api.py:176-353 — `/eval/ocr`;
  *     body carries OCR LINES instead of an image: the tesseract call is the
  *     one model-dependent stage, SURVEY §7.0)
  *   - POST /eval/batch + GET /eval/batch/status/{id} +
  *     POST /eval/batch/cancel/{id} + GET /eval/batch/download/{id}
  *                                           (api.py:362-468, ocr.py:38-417)
  *   - POST /eval/scripture                  (api.py:501-538)
  *   - POST /eval/cost                       (api.py:470-483, ocr.py:384-401)
  *
  * Not carried: `/eval/pdf/proxy` (api.py:596-641) proxies arbitrary
  * external URLs — a CORS workaround for a browser UI, not an engine
  * operator, and this engine's deployments have no egress assumption.
  *
  * Eval endpoints run a small LOCAL Spark job per request by design: they
  * are offline debugging tools (the reference's own `/eval/ocr` runs
  * seconds of tesseract per request), not the serving hot path — the
  * serving endpoints stay on resident structures.
  */
final class EvalApi(
    spark: SparkSession,
    /** reference Config.BASE_PDF_PATH — here the corpus/scan-config root */
    basePdfPath: String,
    /** reference Config.BASE_TEXT_PATH */
    baseTextPath: String,
    /** reference Config.BASE_OCR_PATH */
    baseOcrPath: String,
    /** reference BASE_MARKDOWN_PATH, falling back to the PDF path
      * (api.py:512) */
    granthBasePath: Option[String] = None,
    nowMs: () => Long = () => System.currentTimeMillis(),
    /** job retention after completion (ocr.py:403 `max_age_hours=1`) */
    retentionMs: Long = 3600L * 1000L) {

  private implicit val formats: Formats = DefaultFormats

  // ---- GET /eval/paths (api.py:127-142) ----
  def paths: JValue = JObject(
    "base_pdf_path" -> JString(basePdfPath),
    "base_text_path" -> JString(baseTextPath),
    "base_ocr_path" -> JString(baseOcrPath))

  // ------------------------------------------------------------------
  // Hierarchical config merges — the serving-side (single-file, local
  // filesystem) twin of the table-side op [[graft.ops.ConfigMerge]]; the
  // semantics are pinned by the same reference lines.
  // ------------------------------------------------------------------

  private def parseJsonFile(f: java.io.File): Option[JObject] =
    if (!f.isFile) None
    else try {
      org.json4s.jackson.JsonMethods.parse(
        new String(java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.charset.StandardCharsets.UTF_8)) match {
        case o: JObject => Some(o)
        case _ => None
      }
    } catch {
      // unreadable/corrupt config files are warned and skipped, never fatal
      // (scan_config.py:108-110, utils.py:60-61)
      case e: Exception =>
        System.err.println(s"[eval] WARN could not parse ${f.getPath}: ${e.getMessage}")
        None
    }

  /** Resolve a client-supplied relative path under `base`, refusing
    * escapes: `..` segments (or symlinks) that leave the configured root
    * resolve to None — the eval surface must never read outside its roots,
    * even behind a proxy.
    */
  private def resolveUnder(base: java.io.File, relativePath: String): Option[java.io.File] = {
    val f = new java.io.File(base, relativePath)
    val baseCanon = base.getCanonicalPath + java.io.File.separator
    if ((f.getCanonicalPath + java.io.File.separator).startsWith(baseCanon)) Some(f)
    else None
  }

  /** Base-first directory chain from `base` down to the file's own dir. */
  private def folderChain(file: java.io.File, base: java.io.File): Seq[java.io.File] = {
    val chain = scala.collection.mutable.ArrayBuffer[java.io.File]()
    var cur = file.getParentFile
    val baseCanon = base.getCanonicalPath
    // separator-suffixed prefix so a sibling like <base>2 never matches
    val baseCanonSlash = baseCanon + java.io.File.separator
    while (cur != null && (cur.getCanonicalPath == baseCanon ||
        cur.getCanonicalPath.startsWith(baseCanonSlash))) {
      chain.prepend(cur)
      if (cur.getCanonicalPath == baseCanon) cur = null else cur = cur.getParentFile
    }
    chain.toSeq
  }

  /** `get_scan_config` (scan_config.py:51-143): list keys EXTEND base-first,
    * scalar keys OVERRIDE deepest-wins, crop maps update per-axis; the
    * file-specific layer comes from the LAST scan_config.json read — i.e.
    * the deepest dir that has one at all, even if that file has no entry for
    * this stem (the reference quirk [[graft.ops.ConfigMerge]] also pins).
    */
  def scanConfig(relativePath: String): Either[(Int, String), JValue] = {
    val base = new java.io.File(basePdfPath)
    val file = resolveUnder(base, relativePath) match {
      case Some(f) if f.exists() => f
      case _ => return Left((404, s"File not found: $relativePath"))
    }
    val listKeys = Seq("header_prefix", "header_regex", "page_list",
      "typo_list", "question_prefix", "answer_prefix")
    val lists = scala.collection.mutable.LinkedHashMap[String, List[JValue]](
      listKeys.map(_ -> List.empty[JValue]): _*)
    var crop = scala.collection.mutable.LinkedHashMap[String, JValue]()
    val scalars = scala.collection.mutable.LinkedHashMap[String, JValue]()
    var lastRead: Option[JObject] = None // scan_config_data after the folder loop
    def applyLayer(layer: JObject, fileSpecific: Boolean): Unit = {
      val m = layer.obj.toMap
      listKeys.foreach { k =>
        m.get(k).foreach { case JArray(vs) => lists(k) = lists(k) ++ vs; case _ => () }
      }
      m.get("crop").foreach { case JObject(fs) => fs.foreach { case (k, v) => crop(k) = v }; case _ => () }
      Seq("psm", "chunk_strategy", "ignore_bookmarks").foreach { k =>
        m.get(k).foreach(v => scalars(k) = v)
      }
      if (fileSpecific) {
        // file-only keys (scan_config.py:119-126): file_url always, page
        // range only when BOTH ends are present
        scalars("file_url") = m.getOrElse("file_url", JString(""))
        (m.get("start_page"), m.get("end_page")) match {
          case (Some(s), Some(e)) if s != JNull && e != JNull =>
            scalars("start_page") = s; scalars("end_page") = e
          case _ => ()
        }
      }
    }
    folderChain(file, base).foreach { dir =>
      parseJsonFile(new java.io.File(dir, "scan_config.json")).foreach { cfg =>
        lastRead = Some(cfg)
        cfg.obj.toMap.get("default").foreach {
          case o: JObject => applyLayer(o, fileSpecific = false)
          case _ => ()
        }
      }
    }
    val stem = file.getName.replaceAll("\\.[^.]*$", "")
    lastRead.flatMap(_.obj.toMap.get(stem)).foreach {
      case o: JObject => applyLayer(o, fileSpecific = true)
      case _ => ()
    }
    Right(JObject(
      lists.toList.map { case (k, vs) => k -> (JArray(vs): JValue) } ++
        List("crop" -> (JObject(crop.toList): JValue)) ++
        scalars.toList))
  }

  /** `get_merged_config` (utils.py:12-75): flat `config.json` dict.update
    * base-first, then `<stem>_config.json` last — no list extension here,
    * every key overrides.
    */
  def mergedConfig(relativePath: String, base: java.io.File): Map[String, JValue] = {
    val file = resolveUnder(base, relativePath).getOrElse(return Map.empty)
    val out = scala.collection.mutable.LinkedHashMap[String, JValue]()
    folderChain(file, base).foreach { dir =>
      parseJsonFile(new java.io.File(dir, "config.json"))
        .foreach(_.obj.foreach { case (k, v) => out(k) = v })
    }
    val stem = file.getName.replaceAll("\\.[^.]*$", "")
    parseJsonFile(new java.io.File(file.getParentFile, s"${stem}_config.json"))
      .foreach(_.obj.foreach { case (k, v) => out(k) = v })
    out.toMap
  }

  // ------------------------------------------------------------------
  // POST /eval/extract — the `/eval/ocr` analog (api.py:176-353)
  // ------------------------------------------------------------------

  /** api.py:33-36 language map. */
  private def pipelineLang(apiLanguage: String): String =
    Map("hin" -> "hi", "guj" -> "gu", "eng" -> "en").getOrElse(apiLanguage, "hi")

  private def cfgFor(lang: String): AdvancedParagraphs.Config =
    if (lang == "gu") AdvancedParagraphs.Gujarati else AdvancedParagraphs.Hindi

  private case class LineIn(text: String, conf: Int, xStart: Int, xEnd: Int)

  private def parseLines(j: JValue): Seq[LineIn] = (j \ "lines") match {
    case JArray(vs) => vs.map { v =>
      LineIn((v \ "text").extractOrElse[String](null),
        (v \ "conf").extractOrElse[Int](100),
        (v \ "x_start").extractOrElse[Int](0),
        (v \ "x_end").extractOrElse[Int](100))
    }
    case _ => (j \ "page_text") match {
      // plain-text convenience form: one OCR line per text line, margins
      // unknown → full-width, confidence certain
      case JString(t) => t.linesIterator.map(LineIn(_, 100, 0, 100)).toSeq
      case _ => throw new IllegalArgumentException(
        "Either provide 'lines' OR 'page_text'") // api.py:201-202 intent
    }
  }

  /** Run the extraction pipeline on one page of OCR lines. Modes mirror
    * OCRMode (api.py:38-42): "advanced" = the para_gen path (classify + FSM +
    * combine, [[AdvancedParagraphs]]); "psm6"/"psm3" = the legacy path (T1
    * line combiner, [[Paragraphs]] — psm only parameterizes tesseract, which
    * sits behind the model boundary, so both map to the same downstream).
    * crop_top/crop_bottom (0-50, api.py:206-207) drop that percentage of
    * LINES from each end — the line-table analog of image cropping.
    */
  def extract(body: JValue): JValue = {
    val language = (body \ "language").extractOrElse[String]("hin")
    val mode = (body \ "mode").extractOrElse[String]("psm6")
    if (!Set("psm6", "psm3", "advanced").contains(mode))
      throw new IllegalArgumentException(s"unknown mode: $mode")
    val cropTop = (body \ "crop_top").extractOrElse[Int](0)
    val cropBottom = (body \ "crop_bottom").extractOrElse[Int](0)
    if (cropTop < 0 || cropTop > 50 || cropBottom < 0 || cropBottom > 50)
      throw new IllegalArgumentException(
        "Crop percentages must be between 0 and 50") // api.py:206-207
    val all = parseLines(body)
    val kept = all.slice(
      math.round(all.size * cropTop / 100.0).toInt,
      all.size - math.round(all.size * cropBottom / 100.0).toInt)
    val paras = extractParagraphs(kept, pipelineLang(language), mode)
    JObject(
      // api.py:326,344: paragraphs joined with the ---- separator
      "text" -> JString(paras.mkString("\n\n----\n\n")),
      "boxes" -> JArray(Nil),
      "paragraphs" -> JArray(paras.toList.map(p =>
        JObject("text" -> JString(p), "boxes" -> JArray(Nil)))),
      "language" -> JString(language))
  }

  private def extractParagraphs(lines: Seq[LineIn], lang: String, mode: String): Seq[String] =
    extractParagraphsBatch(Seq(lines), lang, mode).head

  /** Run the extraction pipeline over MANY pages as ONE local Spark job —
    * each page becomes a distinct docId, so classification + FSM + combine
    * parallelize across pages inside the job (the reference's per-page
    * thread pool, ocr.py:276-310, expressed as task parallelism). Returns
    * per-page paragraph lists in input order.
    */
  private def extractParagraphsBatch(pages: Seq[Seq[LineIn]], lang: String,
      mode: String): Seq[Seq[String]] = {
    import spark.implicits._
    val nonEmpty = pages.zipWithIndex.filter(_._1.nonEmpty)
    val byPage: Map[Long, Seq[String]] =
      if (nonEmpty.isEmpty) Map.empty
      else if (mode == "advanced") {
        val ocr = nonEmpty.flatMap { case (lines, p) =>
          lines.zipWithIndex.map { case (l, i) =>
            AdvancedParagraphs.OcrLine(p.toLong, 1, i, l.text, l.xStart, l.xEnd)
          }
        }
        val confs = nonEmpty.flatMap { case (lines, p) =>
          lines.zipWithIndex.map { case (l, i) => (p.toLong, i, l.conf) }
        }
        val filtered = AdvancedParagraphs.confidenceFilter(
          confs.toDF("docId", "lineNum", "conf")
            .join(ocr.toDS().toDF(), Seq("docId", "lineNum")))
          .select("docId", "page", "lineNum", "text", "xStart", "xEnd")
          .as[AdvancedParagraphs.OcrLine]
        AdvancedParagraphs.generate(spark, filtered, cfgFor(lang))
          .collect().groupBy(_.docId)
          .view.mapValues(_.sortBy(_.paraId).map(_.text).toSeq).toMap
      } else {
        val ls = nonEmpty.flatMap { case (lines, p) =>
          lines.filter(l => l.text != null && l.conf > 10)
            .zipWithIndex.map { case (l, i) => Paragraphs.Line(p.toLong, i, l.text) }
        }
        if (ls.isEmpty) Map.empty
        else Paragraphs.combineLines(spark, ls.toDS())
          .collect().groupBy(_.docId)
          .view.mapValues(_.sortBy(_.paraNum).map(_.text).toSeq).toMap
      }
    pages.indices.map(i => byPage.getOrElse(i.toLong, Nil))
  }

  // ------------------------------------------------------------------
  // Batch jobs (ocr.py:38-417)
  // ------------------------------------------------------------------

  /** One batch job's mutable state (ocr.py:46-66). All field access under
    * [[jobsLock]].
    */
  private final class Job(val id: String, val createdAt: Long) {
    var status: String = "queued"
    var progress: Int = 0
    var totalPages: Int = 0
    var outputDir: Option[java.io.File] = None
    var zipFilename: Option[String] = None
    var error: Option[String] = None
    var cancelRequested: Boolean = false
    var completionTime: Option[Long] = None
  }

  private val jobsLock = new Object
  private val jobs = scala.collection.mutable.LinkedHashMap[String, Job]()
  // 2 concurrent jobs (ocr.py:44,130) — queued jobs wait for a worker
  private val executor = java.util.concurrent.Executors.newFixedThreadPool(2,
    (r: Runnable) => { val t = new Thread(r, "eval-batch"); t.setDaemon(true); t })

  // Retention must not depend on the NEXT batch arriving: with cleanup
  // triggered only from startBatch, an idle server retains its last
  // batches' page files and zips forever, and a JVM restart orphans its
  // eval_batch_* temp dirs permanently (nothing else ever deletes them).
  // A daemon tick reclaims terminal jobs and sweeps aged orphan dirs — the
  // reference runs the same loop as a module-load + background task
  // (api.py:486-499). Both passes are cheap: a jobs-map filter plus one
  // tmpdir listing.
  private val janitor = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
    (r: Runnable) => { val t = new Thread(r, "eval-janitor"); t.setDaemon(true); t })
  janitor.scheduleWithFixedDelay(() => {
    // Throwable: an Error escaping a tick would kill the schedule silently
    try { cleanupOldJobs(); sweepOrphanDirs() }
    catch { case t: Throwable =>
      System.err.println(s"[eval] WARN janitor tick failed: ${t.getMessage}") }
  }, math.max(retentionMs / 4, 60000L), math.max(retentionMs / 4, 60000L),
    java.util.concurrent.TimeUnit.MILLISECONDS)

  /** Delete aged `eval_batch_*` temp dirs this instance no longer tracks —
    * crashed-JVM leftovers and failed per-job deletes. Wall-clock mtime (not
    * the injectable [[nowMs]]): the dirs are real filesystem state, and the
    * age floor keeps a short-retention test instance from sweeping a
    * CONCURRENT instance's fresh dirs in the same JVM.
    */
  private[api] def sweepOrphanDirs(): Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val live: Set[String] = jobsLock.synchronized {
      jobs.values.flatMap(_.outputDir).map(_.getAbsolutePath).toSet
    }
    val minAgeMs = math.max(retentionMs, 600000L)
    val now = System.currentTimeMillis()
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("eval_batch_") &&
        !live.contains(d.getAbsolutePath) && now - d.lastModified() > minAgeMs)
      .foreach { d =>
        try scala.reflect.io.Directory(d).deleteRecursively()
        catch { case e: Exception =>
          System.err.println(s"[eval] WARN orphan sweep failed for ${d.getPath}: ${e.getMessage}") }
      }
  }

  /** POST /eval/batch (api.py:362-393 + ocr.py:168-183): body
    * `{pages: [pageSpec...], language, mode}` where each pageSpec is either a
    * string (page_text form) or `{lines:[...]}` — the PDF upload becomes a
    * page array because page rasterization+OCR is the model boundary.
    * Returns the job id immediately; processing runs on the bounded pool.
    */
  def startBatch(body: JValue): JValue = {
    val pages = (body \ "pages") match {
      case JArray(vs) if vs.nonEmpty => vs
      case _ => throw new IllegalArgumentException("'pages' must be a non-empty array")
    }
    val language = (body \ "language").extractOrElse[String]("hin")
    val mode = (body \ "mode").extractOrElse[String]("psm6")
    if (!Set("psm6", "psm3", "advanced").contains(mode))
      throw new IllegalArgumentException(s"unknown mode: $mode")
    val pageLines = pages.map {
      case JString(t) => t.linesIterator.map(LineIn(_, 100, 0, 100)).toSeq
      case o => parseLines(o)
    }
    cleanupOldJobs()
    val job = new Job(java.util.UUID.randomUUID().toString, nowMs())
    jobsLock.synchronized { jobs(job.id) = job }
    executor.submit(new Runnable {
      def run(): Unit = processBatch(job, pageLines, pipelineLang(language), mode)
    })
    JObject("job_id" -> JString(job.id))
  }

  private def cancelled(job: Job): Boolean =
    jobsLock.synchronized { job.cancelRequested }

  private def setStatus(job: Job, status: String): Unit =
    jobsLock.synchronized { job.status = status }

  private def processBatch(job: Job, pages: Seq[Seq[LineIn]], lang: String, mode: String): Unit = {
    try {
      if (cancelled(job)) { setStatus(job, "canceled"); return }
      setStatus(job, "preparing") // ocr.py:196
      val outDir = java.nio.file.Files.createTempDirectory(s"eval_batch_${job.id}_").toFile
      jobsLock.synchronized {
        job.outputDir = Some(outDir)
        job.totalPages = pages.size
        job.status = "processing" // ocr.py:244-247
      }
      // pages are processed in bounded groups — each group IS one local Spark
      // job over all its pages' lines (pages keyed by docId parallelize
      // inside the job) — with a cancellation check and a progress bump
      // between groups
      val groupSize = math.max(1, math.min(16, pages.size / 8))
      // a while loop, NOT grouped(...).foreach with a `return` inside the
      // closure: a non-local return from a lambda is a thrown
      // NonLocalReturnControl, which the catch-Throwable below would
      // intercept — flipping a just-set "canceled" status to "failed" with
      // a bogus error (the client would see a failure for a successful
      // cancellation)
      val groups = pages.zipWithIndex.grouped(groupSize)
      var wasCancelled = false
      while (!wasCancelled && groups.hasNext) {
        val group = groups.next()
        if (cancelled(job)) { setStatus(job, "canceled"); wasCancelled = true }
        else {
          val texts = extractParagraphsBatch(group.map(_._1), lang, mode)
          group.zip(texts).foreach { case ((_, idx), paras) =>
            val pageText = paras.mkString("\n\n----\n\n") // ocr.py:273
            java.nio.file.Files.write(
              new java.io.File(outDir, EvalApi.fmt("page_%04d.txt", Int.box(idx + 1))).toPath, // ocr.py:300
              pageText.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
          jobsLock.synchronized { job.progress += group.size }
        }
      }
      if (wasCancelled) return
      if (cancelled(job)) { setStatus(job, "canceled"); return }
      // zip the page files (ocr.py:317-326)
      val zipName = s"extracted_text_${job.id}.zip"
      val zip = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(new java.io.File(outDir, zipName)))
      try {
        // numeric page order, not lexicographic: %04d widens past 9999, and
        // page_10000.txt would sort between page_1000 and page_1001 by name
        // (only page_<n>.txt files exist in outDir at this point)
        outDir.listFiles().filter(_.getName.endsWith(".txt"))
          .sortBy(f => f.getName.filter(_.isDigit).toLong).foreach { f =>
          zip.putNextEntry(new java.util.zip.ZipEntry(f.getName))
          zip.write(java.nio.file.Files.readAllBytes(f.toPath))
          zip.closeEntry()
        }
      } finally zip.close()
      jobsLock.synchronized {
        job.zipFilename = Some(zipName)
        job.completionTime = Some(nowMs())
        job.status = "completed"
      }
    } catch {
      // Throwable, not Exception: an Error (OOM in the per-group collect,
      // StackOverflow) must still move the job out of "processing", or the
      // jobs-map entry and its eval_batch_* temp dir leak forever (status
      // polls report "processing" indefinitely and cleanupOldJobs only
      // collects terminal states)
      case t: Throwable =>
        jobsLock.synchronized {
          job.error = Some(Option(t.getMessage).getOrElse(t.getClass.getName))
          job.status = "failed"
        }
    }
  }

  /** GET /eval/batch/status/{id} (api.py:395-421 + ocr.py:350-369). */
  def batchStatus(jobId: String): Either[(Int, String), JValue] =
    jobsLock.synchronized {
      jobs.get(jobId) match {
        case None => Left((404, "Job not found"))
        case Some(j) =>
          val elapsedSec = (nowMs() - j.createdAt) / 1000.0
          val formatted = // ocr.py:360-367
            if (elapsedSec < 60) EvalApi.fmt("%.1fs", Double.box(elapsedSec))
            else if (elapsedSec < 3600) EvalApi.fmt("%.1fm", Double.box(elapsedSec / 60))
            else EvalApi.fmt("%.1fh", Double.box(elapsedSec / 3600))
          Right(JObject(
            "status" -> JString(j.status),
            "progress" -> JInt(j.progress),
            "total_pages" -> JInt(j.totalPages),
            "zip_filename" -> j.zipFilename.map(JString(_): JValue).getOrElse(JNull),
            "error" -> j.error.map(JString(_): JValue).getOrElse(JNull),
            "elapsed_time" -> JDouble(elapsedSec),
            "elapsed_time_formatted" -> JString(formatted)))
      }
    }

  /** POST /eval/batch/cancel/{id} (api.py:423-441 + ocr.py:92-99): only
    * queued/processing (and our intermediate `preparing`) can be cancelled.
    */
  def cancelBatch(jobId: String): Either[(Int, String), JValue] =
    jobsLock.synchronized {
      jobs.get(jobId) match {
        case Some(j) if Set("queued", "preparing", "processing").contains(j.status) =>
          j.cancelRequested = true
          Right(JObject("message" -> JString("Job cancellation requested")))
        case _ => Left((404, "Job not found or cannot be cancelled"))
      }
    }

  /** GET /eval/batch/download/{id} (api.py:443-468 + ocr.py:375-382):
    * the zip's bytes + filename, or 404 until completed.
    */
  def downloadBatch(jobId: String): Either[(Int, String), (String, Array[Byte])] = {
    val path = jobsLock.synchronized {
      jobs.get(jobId).filter(_.status == "completed").flatMap(j =>
        j.zipFilename.flatMap(zn => j.outputDir.map(d => (zn, new java.io.File(d, zn)))))
    }
    path match {
      case Some((zn, f)) =>
        // the read races retention cleanup (which deletes outside the lock);
        // a vanished file is the designed 404, not a server fault
        try Right((zn, java.nio.file.Files.readAllBytes(f.toPath)))
        catch { case _: java.io.IOException => Left((404,
          "Download not available. Job may not be completed or file may have been cleaned up.")) }
      case _ => Left((404,
        "Download not available. Job may not be completed or file may have been cleaned up."))
    }
  }

  /** ocr.py:403-417 — drop completed/failed/canceled jobs older than the
    * retention window and delete their output dirs. Called from
    * [[startBatch]] and from the janitor tick (the reference triggers it
    * from module load + background task, api.py:486-499).
    */
  def cleanupOldJobs(): Unit = {
    val now = nowMs()
    val stale = jobsLock.synchronized {
      val s = jobs.values.filter(j =>
        Set("completed", "failed", "canceled").contains(j.status) &&
          now - j.completionTime.getOrElse(j.createdAt) > retentionMs).toSeq
      s.foreach(j => jobs.remove(j.id))
      s
    }
    stale.foreach(_.outputDir.foreach { d =>
      try scala.reflect.io.Directory(d).deleteRecursively()
      catch { case e: Exception =>
        System.err.println(s"[eval] WARN cleanup failed for ${d.getPath}: ${e.getMessage}") }
    })
  }

  // ------------------------------------------------------------------
  // POST /eval/scripture (api.py:501-538)
  // ------------------------------------------------------------------

  /** Parse a markdown granth file and return the full Granth HTTP shape
    * (granth.py Granth.get_http_response: name, original_filename, metadata,
    * verses, prose_sections). Metadata comes from the hierarchical
    * `config.json` merge, exactly like MarkdownParser(base_folder)
    * (markdown_parser.py:79-99 + utils.py:12-75).
    */
  def scripture(relativePath: String): Either[(Int, String), JValue] = {
    val base = new java.io.File(granthBasePath.getOrElse(basePdfPath))
    val file = resolveUnder(base, relativePath) match {
      case Some(f) if f.isFile => f
      case _ => return Left((404, s"Markdown file not found: $relativePath"))
    }
    if (!file.getName.toLowerCase(java.util.Locale.ROOT).endsWith(".md"))
      return Left((400, "File must be a markdown (.md) file"))
    val content = new String(java.nio.file.Files.readAllBytes(file.toPath),
      java.nio.charset.StandardCharsets.UTF_8)
    val (verses, proses) =
      try MarkdownGranth.parse(content)
      catch { case e: IllegalArgumentException => return Left((500,
        s"Error processing scripture file: ${e.getMessage}")) }
    val cfg = mergedConfig(relativePath, base)
    def str(k: String, default: String): String =
      cfg.get(k).collect { case JString(s) => s }.getOrElse(default)
    val language = Langs.code(str("language", "hindi"))
    Right(JObject(
      "name" -> JString(str("name", "Unknown")), // markdown_parser.py:89
      "original_filename" -> JString(relativePath),
      "metadata" -> JObject( // granth.py GranthMetadata.get_http_response
        "anuyog" -> JString(str("Anuyog", "")),
        "language" -> JString(language),
        "author" -> JString(str("Author", "Unknown")),
        "teekakar" -> JString(str("Teekakar", "Unknown")),
        "file_url" -> JString(str("file_url", ""))),
      "verses" -> JArray(verses.toList.map(v => GranthStore.verseJson(v, language))),
      "prose_sections" -> JArray(proses.toList.map(GranthStore.proseSectionJson))))
  }

  // ------------------------------------------------------------------
  // POST /eval/cost (api.py:470-483 + ocr.py:384-401)
  // ------------------------------------------------------------------

  def cost(body: JValue): JValue = {
    val totalPages = (body \ "total_pages").extractOrElse[Int](
      throw new IllegalArgumentException("total_pages is required"))
    val useGoogle = (body \ "use_google_ocr").extractOrElse[Boolean](false)
    val cost = if (useGoogle) totalPages * 0.13 else 0.0 // ocr.py:388,396
    JObject(
      "cost" -> JString(EvalApi.fmt("%.2f", Double.box(cost))),
      "pages" -> JInt(totalPages),
      "currency" -> JString("₹"))
  }

  // ------------------------------------------------------------------
  // POST /eval/bookmarks/extract (api.py:540-594)
  // ------------------------------------------------------------------

  /** The reference sends bookmark titles to an LLM to pull out
    * `pravachan_no` and a DD-MM-YYYY date (bookmark_extractor/base.py:
    * 30-43 prompt, 46-108 batch loop). The LLM call is a declared model
    * boundary (SURVEY §7.0); this deterministic parser implements the same
    * task contract for the title shapes the prompt describes — swap point:
    * replace [[parseTitle]] with a `call_llm` batch. Input carries the
    * outline directly (`{bookmarks: [{page, level, title}]}`) because PDF
    * outline extraction sits behind the same codec boundary as page images.
    */
  def extractBookmarks(body: JValue): Either[(Int, String), JValue] = {
    val bms = (body \ "bookmarks") match {
      case JArray(vs) => vs
      case _ => return Left((400, "'bookmarks' must be an array of {page, level, title}"))
    }
    val out = bms.map { b =>
      val title = (b \ "title").extractOrElse[String]("")
      val (no, date) = EvalApi.parseTitle(title)
      JObject(
        "page" -> JInt((b \ "page").extractOrElse[Int](0)),
        "level" -> JInt((b \ "level").extractOrElse[Int](1)),
        "title" -> JString(title),
        "pravachan_no" -> no.map(JString(_): JValue).getOrElse(JNull),
        "date" -> date.map(JString(_): JValue).getOrElse(JNull))
    }
    Right(JObject(
      "bookmarks" -> JArray(out.toList),
      "total" -> JInt(out.size),
      "pdf_path" -> JString((body \ "pdf_path").extractOrElse[String](""))))
  }

  /** Release the batch worker pool and the retention janitor (tests). */
  def shutdown(): Unit = { executor.shutdownNow(); janitor.shutdownNow() }
}

object EvalApi {

  /** Locale-pinned formatter: the `f` interpolator uses the JVM default
    * locale, so on a comma-decimal or non-ASCII-digit locale (`-Duser
    * .language=de`, Arabic numbering) `f"$cost%.2f"` would emit "13,00" and
    * %0Nd could emit non-ASCII digits — diverging from the reference's
    * ASCII wire shapes and file names. Every numeric format in this API
    * goes through here.
    */
  private[api] def fmt(pattern: String, args: Any*): String =
    String.format(java.util.Locale.ROOT, pattern,
      args.map(_.asInstanceOf[AnyRef]): _*)

  private val MonthNums: Map[String, Int] = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)

  // "प्रवचन नं. 123" / "Pravachan No. 123" / a trailing standalone number
  private val NoPats = Seq(
    "(?iu)(?:प्रवचन|pravachan)\\s*(?:नं|न|no|num|number)?[.\\s]*([0-9०-९]+)".r,
    "(?u)^\\s*([0-9०-९]+)\\s*[.)-]".r)
  // "26th Sep 1978" | "26 September 1978"
  private val DateWords = "(?i)\\b(\\d{1,2})(?:st|nd|rd|th)?[\\s,.-]+([a-z]{3,9})[\\s,.-]+(\\d{2,4})\\b".r
  // 26-09-1978 / 26.9.78 / 26/09/1978
  private val DateNums = "\\b(\\d{1,2})[./-](\\d{1,2})[./-](\\d{2,4})\\b".r

  private def devToAscii(s: String): String =
    s.map(c => if (c >= '०' && c <= '९') ('0' + (c - '०')).toChar else c)

  private def year4(y: Int): Int = if (y < 100) 1900 + y else y // corpus era

  /** Deterministic stand-in for the LLM title parse: pravachan number +
    * normalized DD-MM-YYYY date (base.py:40-42 "Convert dates from formats
    * like '26th Sep 1978' to DD-MM-YYYY"), None when absent.
    */
  def parseTitle(title: String): (Option[String], Option[String]) = {
    val t = devToAscii(title)
    // first RESOLVABLE match, not first match: an earlier non-date that
    // merely fits the shape ("15 minutes 1990" — "min" is no month;
    // "3/25/2020" — month 25) must not shadow a real date later in the
    // title, or the genuine "26 Sep 1978" would be dropped entirely
    val wordDate = DateWords.findAllMatchIn(t).flatMap { m =>
      MonthNums.get(m.group(2).toLowerCase(java.util.Locale.ROOT).take(3)).map(mo =>
        (m, fmt("%02d-%02d-%04d", Int.box(m.group(1).toInt), Int.box(mo),
          Int.box(year4(m.group(3).toInt)))))
    }.nextOption()
    val numDate = DateNums.findAllMatchIn(t).collect {
      case m if m.group(2).toInt >= 1 && m.group(2).toInt <= 12 =>
        (m, fmt("%02d-%02d-%04d", Int.box(m.group(1).toInt),
          Int.box(m.group(2).toInt), Int.box(year4(m.group(3).toInt))))
    }.nextOption()
    val date = wordDate.orElse(numDate)
    // the anchored bare-number pattern must not mistake a LEADING DATE's day
    // for a pravachan number ("26.09.1978" → no number, date only); the
    // explicit प्रवचन/pravachan-prefixed pattern is never date-shadowed
    val dateSpan = date.map { case (m, _) => (m.start, m.end) }
    def insideDate(m: scala.util.matching.Regex.Match): Boolean =
      dateSpan.exists { case (s, e) => m.start(1) >= s && m.start(1) < e }
    val no = NoPats.head.findFirstMatchIn(t)
      .orElse(NoPats(1).findFirstMatchIn(t).filterNot(insideDate))
      .map(_.group(1))
    (no, date.map(_._2))
  }
}
