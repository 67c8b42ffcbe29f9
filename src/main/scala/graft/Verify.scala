package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // parity artifacts must not depend on the host locale (digit glyphs,
    // decimal separators) — same pin as Bench and the tools mains
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    require(args.length == 2,
      s"usage: graft.Verify <sfDir> <outDir> (got ${args.length} args: ${args.mkString(" ")})")
    val Array(sfDir, outDir) = args
    // 32 like every tool (only the v0 stub said 4): the dump is correctness-
    // gating either way, but a 4-core default quietly quadruples its wall
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // GRAFT_VERIFY_ONLY="a,b" restricts the dump for fast local iteration on
    // one oracle; unset OR EMPTY (e.g. an unset shell substitution exporting
    // "") runs everything — Set("") would silently match no query
    val only = sys.env.get("GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        // delete any output for this name — a PREVIOUS run's parquet (or
        // this run's partial overwrite) surviving here would make the
        // positional DuckDB compare score a broken query green
        val dir = new java.io.File(s"$outDir/$name")
        if (dir.exists()) {
          graft.tools.CpuProbe.rmDir(dir.getAbsolutePath) // the one shared recursive delete
          if (dir.exists()) {
            // a delete can fail WITHOUT throwing (open handle on a part
            // file) — and stale parquet here is exactly what scores a
            // broken query green. Move it out of the compare's
            // <name>/*.parquet glob; if even the rename fails, crash
            // loudly rather than publish a lie.
            val aside = new java.io.File(s"$outDir/$name.failed")
            graft.tools.CpuProbe.rmDir(aside.getAbsolutePath)
            if (!dir.renameTo(aside))
              throw new IllegalStateException(
                s"verify: cannot remove or move stale output $dir — " +
                  "refusing to let a broken query score green")
          }
        }
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    if (failed.nonEmpty)
      System.err.println(s"[verify] ${failed.size} queries FAILED (outputs " +
        s"removed so the compare reports them): ${failed.mkString(", ")}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
