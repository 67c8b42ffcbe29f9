package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.index.TableIO

/** Iceberg-style snapshot table — the thin table-format layer SURVEY §7
  * promised for this sandbox (no Iceberg runtime jar, offline coursier):
  * immutable data files + immutable snapshot manifests, giving the three
  * properties the north rule's ingestion story needs:
  *
  *   - **atomic append**: a commit stages new data files under a
  *     writer-unique `data/u-<nonce>/` dir (commit-independent by design —
  *     see the multi-writer rebase below) and then writes ONE snapshot
  *     manifest listing parent files + new files; a reader either sees the
  *     whole commit or none of it,
  *   - **time travel**: `read(asOf = id)` resolves any historical snapshot's
  *     exact file list,
  *   - **incremental consume**: `appendedSince(id)` is the file-set diff two
  *     snapshots — what an indexer needs to process ONLY new partitions
  *     (the Iceberg "incremental append scan").
  *
  * Layout (all paths via Hadoop [[TableIO]], so HDFS/S3A work unchanged):
  * {{{
  *   <table>/data/u-<nonce>/part-*.parquet immutable data files, one dir per
  *                                         writer attempt (name is commit-
  *                                         independent, Iceberg-style)
  *   <table>/snapshots/snap-<id 12d>.json  {"id":N,"parent":N-1,"files":[...]}
  * }}}
  * MULTI-WRITER SAFE (optimistic concurrency, the Iceberg commit protocol):
  * data files are staged once under a writer-unique dir — invisible until a
  * manifest references them — and the snapshot manifest is written with a
  * CONDITIONAL create ([[TableIO.writeStringIfAbsent]]). A writer that loses
  * the race for snapshot id rebases (re-reads the new current file list) and
  * retries with the next id; its staged data never moves or rewrites.
  * Crashed writers leave unreferenced staging dirs; [[removeOrphans]] is the
  * `remove_orphan_files` analog. A real Iceberg deployment swaps this object
  * for the Iceberg catalog — the call sites ([[SnapshotIngest]]) only use
  * the properties above.
  */
object SnapshotTable {

  final case class Snapshot(id: Long, parent: Long, files: Seq[String])

  /** A snapshot manifest that is ABSENT — the concurrent-expireSnapshots
    * race [[append]]'s rebase loop is allowed to retry on. Kept distinct
    * from the unparseable-manifest error deliberately: a PRESENT-but-corrupt
    * head manifest is permanent, so treating it as a rebase condition would
    * exhaust the retry budget, delete the freshly staged data, and report a
    * bogus "commit conflict" instead of the corruption.
    */
  final class MissingSnapshot(msg: String) extends RuntimeException(msg)

  private def snapDir(tableDir: String) = s"$tableDir/snapshots"

  private def snapPath(tableDir: String, id: Long) =
    // zpad, not f"%012d": snapshot names must stay ASCII under any default
    // locale — currentId parses them back with toLongOption
    s"${snapDir(tableDir)}/snap-${graft.Fmt.zpad(id, 12)}.json"

  def currentId(tableDir: String): Option[Long] = {
    val ids = TableIO.listFiles(snapDir(tableDir), "snap-")
      .flatMap(n => n.stripPrefix("snap-").stripSuffix(".json").toLongOption)
    if (ids.isEmpty) None else Some(ids.max)
  }

  def snapshot(tableDir: String, id: Long): Snapshot = {
    val txt = TableIO.readString(snapPath(tableDir, id))
      .getOrElse(throw new MissingSnapshot(s"no snapshot $id under $tableDir"))
    val parent = "\"parent\":(-?\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
      .getOrElse(sys.error(s"unparseable snapshot $id"))
    val files = "\"files\":\\[([^\\]]*)\\]".r.findFirstMatchIn(txt).map(_.group(1))
      .getOrElse(sys.error(s"unparseable snapshot $id"))
      .split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)
    Snapshot(id, parent, files)
  }

  /** Append `df` as one atomic commit; returns the new snapshot id.
    * Data files land first under a writer-unique staging dir (invisible to
    * readers — no manifest references them yet); the CONDITIONAL snapshot
    * manifest write is the commit point. Losing the race for an id costs
    * one manifest rebase, never a data rewrite; a crash before the manifest
    * write leaves an unreferenced staging dir ([[removeOrphans]] reclaims
    * it, and nothing ever reads it).
    */
  def append(spark: SparkSession, tableDir: String, df: DataFrame,
      maxRebases: Int = 20): Long = {
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val dataRel = s"data/u-$nonce"
    df.write.parquet(s"$tableDir/$dataRel")
    val newFiles = TableIO.listFiles(s"$tableDir/$dataRel", "part-")
      .sorted.map(n => s"$dataRel/$n")
    if (newFiles.isEmpty) {
      // an empty input (0-partition DataFrame writes no part files) commits
      // nothing: a manifest with "files":[] would make read(asOf) throw on
      // schema inference forever after — no-op instead. On a still-empty
      // table this returns 0L, the GENESIS id: legal for appendedSince
      // (= "everything since the beginning"), never a readable snapshot
      TableIO.deleteRecursive(s"$tableDir/$dataRel")
      return currentId(tableDir).getOrElse(0L)
    }
    var attempt = 0
    while (attempt < maxRebases) {
      val parent = currentId(tableDir)
      val id = parent.getOrElse(0L) + 1
      // a concurrent expireSnapshots can delete the parent manifest between
      // currentId and this read — that is a rebase condition (a fresh
      // currentId sees a retained head), not a crash that leaks the staged
      // dir until orphan GC. ONLY the missing-manifest case rebases: an
      // unparseable (corrupt) manifest propagates immediately with the
      // staged dir intact, so the data survives for a retry after repair
      val parentFilesOpt =
        try Some(parent.map(p => snapshot(tableDir, p).files).getOrElse(Nil))
        catch { case _: MissingSnapshot => None }
      parentFilesOpt.foreach { parentFiles =>
        val all = (parentFiles ++ newFiles).map(f => s""""$f"""").mkString(",")
        if (TableIO.writeStringIfAbsent(snapPath(tableDir, id),
            s"""{"id":$id,"parent":${id - 1},"files":[$all]}"""))
          return id
      }
      attempt += 1 // a concurrent commit claimed this id — rebase and retry
    }
    // the writer is alive and KNOWS the commit failed — reclaim the staged
    // data now instead of leaving it for the orphan-GC grace window
    TableIO.deleteRecursive(s"$tableDir/$dataRel")
    sys.error(s"snapshot commit conflict under $tableDir: " +
      s"gave up after $maxRebases rebases")
  }

  /** Delete data dirs no snapshot references — crashed writers' staging
    * dirs — once older than `graceMs` (the window protects writers that
    * staged data but have not committed yet). The current snapshot's file
    * set is a superset of every ancestor's (append-only table), so "not in
    * the current snapshot" == "referenced by no snapshot". Returns the
    * deleted dir names (`remove_orphan_files` analog).
    */
  def removeOrphans(tableDir: String, graceMs: Long = 24L * 3600 * 1000): Seq[String] = {
    val referenced: Set[String] = currentId(tableDir) match {
      case Some(id) => snapshot(tableDir, id).files
        .map(_.stripPrefix("data/").takeWhile(_ != '/')).toSet
      case None => Set.empty
    }
    val now = System.currentTimeMillis()
    TableIO.listDirs(s"$tableDir/data")
      .filterNot(referenced)
      .filter(d => TableIO.modificationTime(s"$tableDir/data/$d")
        .exists(now - _ >= graceMs))
      .map { d => TableIO.deleteRecursive(s"$tableDir/data/$d"); d }
  }

  /** Time-travel retention: drop all snapshot manifests except the newest
    * `keepLast` (the `expire_snapshots` analog). Data files stay — the
    * table is append-only, so every file is referenced by the survivors.
    * Reading or diffing AT an expired snapshot id then fails fast ("no
    * snapshot") instead of silently answering from a widened scan;
    * consumers resume from a retained snapshot. Returns the expired ids.
    */
  def expireSnapshots(tableDir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val ids = TableIO.listFiles(snapDir(tableDir), "snap-")
      .flatMap(n => n.stripPrefix("snap-").stripSuffix(".json").toLongOption)
      .sorted
    val drop = ids.dropRight(keepLast)
    drop.foreach(id => TableIO.deleteRecursive(snapPath(tableDir, id)))
    drop
  }

  /** Read the table at a snapshot (default: current). Exactly the manifest's
    * file list is scanned — files of later commits are invisible even though
    * they share the directory tree.
    */
  def read(spark: SparkSession, tableDir: String, asOf: Option[Long] = None): DataFrame = {
    val id = asOf.orElse(currentId(tableDir))
      .getOrElse(sys.error(s"no snapshots under $tableDir"))
    val files = snapshot(tableDir, id).files.map(f => s"$tableDir/$f")
    spark.read.parquet(files: _*)
  }

  /** Rows appended after snapshot `afterId`, up to `upTo` (default: the
    * current snapshot) — the incremental-scan diff (append-only tables: the
    * file sets are strictly growing, so the diff is exactly the new
    * commits' files). None when nothing was appended. Consumers should pin
    * `upTo` to the snapshot they resolved at the start of their run, so a
    * concurrent append can't widen the scan past what they record.
    */
  def appendedSince(spark: SparkSession, tableDir: String,
      afterId: Long, upTo: Option[Long] = None): Option[DataFrame] = {
    val cur = upTo.orElse(currentId(tableDir)).getOrElse(return None)
    if (cur <= afterId) return None
    // afterId 0 is the GENESIS reference (what append returns on an empty
    // no-op): no snap-0 manifest exists — the prior file set is empty
    val before =
      if (afterId == 0L) Set.empty[String]
      else snapshot(tableDir, afterId).files.toSet
    val fresh = snapshot(tableDir, cur).files.filterNot(before)
    if (fresh.isEmpty) None
    else Some(spark.read.parquet(fresh.map(f => s"$tableDir/$f"): _*))
  }
}

/** Snapshot-incremental indexing — the BATCH ingestion path of SURVEY §2.9:
  * the index tracks the last table snapshot it consumed and each `consume`
  * call processes ONLY rows appended since (Iceberg incremental append
  * scan), MERGEing them through [[graft.index.IndexBuild.reindexDocs]]
  * (delete-matching + partition overwrite of only the affected chunks). The
  * resulting index is postings-identical to a fresh build over the full
  * table (SnapshotTableSpec), and a crash between the chunk rewrite and the
  * marker write is safe: re-consuming the same rows is idempotent (same
  * docIds, same content → same chunk contents).
  *
  * Identity caveat for RECRAWLED rows: the fresh-build equivalence above
  * holds when doc identities don't repeat across snapshots. For url-keyed
  * tables (docId derived from url), a url recrawled in a LATER snapshot is
  * merged last-consumed-wins — correct for an append-in-time crawl log, but
  * a fresh full build would instead keep the row with the max `warc_ts`
  * regardless of snapshot order, so an out-of-order late capture (older
  * warc_ts appended in a newer snapshot) diverges: incremental serves the
  * late append, fresh build the newer capture. For tables WITH a doc_id
  * column, recrawls merge incrementally but a fresh build over the full
  * table would see duplicate doc_ids — dedup upstream before a rebuild.
  *
  * This is the engine analog of the reference's 6-hourly re-crawl daemon
  * (scripts/discovery_cli.py:141-180) for table-native inputs, and the
  * streaming twin of [[graft.streaming.IncrementalIndex]].
  */
object SnapshotIngest {

  private def markerPath(outDir: String) = s"$outDir/source_snapshot.json"

  /** Last table snapshot this index consumed (None before the first run). */
  def consumedSnapshot(outDir: String): Option[Long] =
    TableIO.readString(markerPath(outDir))
      .flatMap(s => "\"snapshot\":(\\d+)".r.findFirstMatchIn(s).map(_.group(1).toLong))

  /** Consume the table into the index: full build on first call, appended
    * rows only afterwards. Returns (fromSnapshot or -1, toSnapshot,
    * rowsProcessed).
    */
  def consume(spark: SparkSession, tableDir: String, outDir: String,
      numChunks: Int = 4, saltTargetPostings: Int = 8192): (Long, Long, Long) = {
    val cur = SnapshotTable.currentId(tableDir)
      .getOrElse(sys.error(s"no snapshots under $tableDir"))
    // the marker records WHICH table the index consumed — refuse an outDir
    // that was fed from a different table (otherwise the prev/cur snapshot
    // ids compare across unrelated tables and silently mis-index: a stale
    // prev >= cur no-ops forever; a smaller prev diffs wrong snapshots)
    TableIO.readString(markerPath(outDir))
      .flatMap(s => "\"table\":\"(.*?)\",\"snapshot\"".r
        .findFirstMatchIn(s).map(_.group(1)))
      .foreach(recorded => require(recorded == tableDir,
        s"index at $outDir was consumed from table '$recorded' — refusing " +
          s"to continue it from '$tableDir' (delete the index to rebuild)"))
    val commit: Long => Unit = id => TableIO.writeStringAtomic(markerPath(outDir),
      s"""{"table":"$tableDir","snapshot":$id}""")
    // every read below is PINNED to `cur`: a commit landing mid-consume must
    // not widen the scan past the snapshot the marker will record
    consumedSnapshot(outDir) match {
      case None =>
        // persist: the count and the build share one scan of the input
        val df = SnapshotTable.read(spark, tableDir, asOf = Some(cur)).persist()
        try {
          val n = df.count()
          graft.index.IndexBuild.build(spark, df, outDir,
            numChunks = numChunks, saltTargetPostings = saltTargetPostings)
          commit(cur)
          (-1L, cur, n)
        } finally df.unpersist()
      case Some(prev) if prev >= cur => (prev, cur, 0L)
      case Some(prev) =>
        SnapshotTable.appendedSince(spark, tableDir, prev, upTo = Some(cur)) match {
          case None => commit(cur); (prev, cur, 0L)
          case Some(fresh0) =>
            val fresh = fresh0.persist()
            try {
              val n = fresh.count()
              graft.index.IndexBuild.reindexDocs(spark, outDir, fresh)
              commit(cur)
              (prev, cur, n)
            } finally fresh.unpersist()
        }
    }
  }
}
