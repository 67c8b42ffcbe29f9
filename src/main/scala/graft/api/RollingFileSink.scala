package graft.api

/** Line-oriented rolling file sink for the serving node's metrics/feedback
  * exporters — the reference deployment's `metrics.log` that
  * `scripts/metrics_exporter` tails (search_api.py:337-376 writes it via
  * log_handle.metrics). One live file plus one rolled predecessor
  * (`<path>.1`), rotated by size: bounded disk like the in-memory buffers
  * are bounded, and the offline parser ([[graft.ops.Metrics.parse]], driven
  * by [[graft.tools.MetricsCli]]) reads both.
  *
  * Thread-safe; the writer stays open across lines (an open/close per
  * request would put filesystem metadata ops on the serving hot path) and
  * flushes per line so a crash loses at most the OS buffer.
  */
final class RollingFileSink(path: String, maxBytes: Long = 16L << 20)
    extends (String => Unit) {

  private[this] var out: java.io.Writer = _
  private[this] var written: Long = 0L
  private[this] var closed = false

  private def open(): Unit = {
    val f = new java.io.File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    written = if (f.exists()) f.length() else 0L
    out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(f, true), java.nio.charset.StandardCharsets.UTF_8))
  }

  def apply(line: String): Unit = synchronized {
    // close() is TERMINAL: a straggler handler outliving the server's stop
    // must not resurrect the writer by reopening the just-closed (possibly
    // archived) file — the late line is dropped, like the bounded in-memory
    // sinks drop under pressure
    if (closed) return
    if (out == null) open()
    out.write(line)
    out.write('\n')
    out.flush()
    written += line.getBytes(java.nio.charset.StandardCharsets.UTF_8).length + 1
    if (written > maxBytes) {
      out.close(); out = null
      val f = new java.io.File(path)
      val rolled = new java.io.File(path + ".1")
      if (rolled.exists()) rolled.delete()
      if (!f.renameTo(rolled)) {
        // rename can fail (permissions, filesystem semantics); the bounded-
        // disk contract wins over this generation's lines — truncate IN
        // PLACE rather than delete(): a directory that permits writing the
        // file but not unlinking it would fail the delete too, and the
        // reopened writer would inherit the over-limit length and retry
        // rotation (with a warn line) on every subsequent append
        System.err.println(s"[sink] WARN rotate rename failed for $path — truncating in place")
        try new java.io.FileOutputStream(f, false).close()
        catch {
          case e: java.io.IOException =>
            System.err.println(s"[sink] WARN truncate failed for $path: ${e.getMessage}")
        }
      }
      written = 0L // next apply() reopens and re-reads the (now small) length
    }
  }

  def close(): Unit = synchronized {
    closed = true
    if (out != null) { out.close(); out = null }
  }
}
