package graft.index

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}

/** Index backup/restore — the engine analog of the reference's snapshot
  * scripts (scripts/create_snapshots.sh / restore_snapshots.sh, which drive
  * OpenSearch's snapshot API into a local dir and re-register it on
  * restore).
  *
  * A backup is a plain copy of the index's artifact tree into
  * `<backupRoot>/<name>/` via Hadoop FS (so index on HDFS → backup on S3
  * works unchanged), plus a `BACKUP_DONE` marker written LAST — a backup
  * without the marker is incomplete (crashed mid-copy) and restore refuses
  * it. Restore copies into a FRESH index dir (refuses to overwrite), after
  * which the restored index serves byte-identical results.
  *
  * Consistency: like the reference scripts, back up a quiesced index (no
  * concurrent mutation) — the copy is not a point-in-time snapshot of a
  * moving tree. [[graft.table.SnapshotTable]] is the layer that provides
  * true point-in-time semantics on the INPUT side.
  */
object IndexBackup {

  private def conf(): Configuration = TableIO.conf()

  private def marker(dir: String) = s"$dir/BACKUP_DONE"

  /** Copy the whole index tree to `<backupRoot>/<name>`; returns the backup
    * dir. Fails if the target already exists (backups are immutable).
    */
  def backup(indexDir: String, backupRoot: String, name: String): String = {
    val dst = s"$backupRoot/$name"
    require(!TableIO.exists(dst), s"backup $dst already exists (immutable)")
    require(TableIO.exists(s"$indexDir/stats.json"),
      s"$indexDir is not a finalized index (no stats.json)")
    val c = conf()
    val srcPath = new Path(indexDir)
    val dstPath = new Path(dst)
    val srcFs = srcPath.getFileSystem(c)
    val dstFs = dstPath.getFileSystem(c)
    dstFs.mkdirs(dstPath.getParent)
    // FileUtil.copy can report failure via `false` without throwing — a
    // failed copy must never earn the completeness marker. And a FAILED
    // copy's partial tree must not survive: the immutability require above
    // would treat it as an existing backup and block every retry under
    // this name (list()/restore() ignore it, but nothing else ever cleans
    // backup roots)
    try {
      require(FileUtil.copy(srcFs, srcPath, dstFs, dstPath, false, c),
        s"copy $indexDir -> $dst reported failure")
    } catch {
      case t: Throwable => TableIO.deleteRecursive(dst); throw t
    }
    TableIO.writeStringAtomic(marker(dst),
      s"""{"source":"$indexDir","name":"$name"}""")
    dst
  }

  /** Restore a completed backup into a fresh index dir. */
  def restore(backupDir: String, indexDir: String): Unit = {
    require(TableIO.exists(marker(backupDir)),
      s"$backupDir has no BACKUP_DONE marker — incomplete backup, refusing")
    require(!TableIO.exists(indexDir),
      s"restore target $indexDir already exists, refusing to overwrite")
    val c = conf()
    val srcPath = new Path(backupDir)
    val dstPath = new Path(indexDir)
    // same partial-tree discipline as backup(): a failed restore must not
    // leave a half-copied index dir that blocks the retry's !exists require
    // (and could even LOOK servable if the copy got past stats.json)
    try {
      require(FileUtil.copy(srcPath.getFileSystem(c), srcPath,
        dstPath.getFileSystem(c), dstPath, false, c),
        s"copy $backupDir -> $indexDir reported failure")
    } catch {
      case t: Throwable => TableIO.deleteRecursive(indexDir); throw t
    }
    // the marker is backup metadata, not an index artifact
    TableIO.deleteRecursive(s"$indexDir/BACKUP_DONE")
  }

  /** Completed backups under a root, lexicographically name-sorted (use
    * sortable names like `b-2025-01-01`; for arbitrary names order by the
    * marker's [[TableIO.modificationTime]] instead).
    */
  def list(backupRoot: String): Seq[String] =
    TableIO.listDirs(backupRoot)
      .filter(n => TableIO.exists(marker(s"$backupRoot/$n")))
      .sorted
}
