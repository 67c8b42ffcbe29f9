package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev timer for one named [[graft.SparkEntry.queries]] entry: runs it N
  * times against a sf dir and prints per-attempt wall seconds + the CPU
  * probe, so a single operator's cost can be attributed without the full
  * Bench run. Usage:
  * {{{
  *   run_main.sh graft.tools.TimeQuery <queryName> [attempts]
  *   env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32)
  * }}}
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: TimeQuery <queryName> [attempts]"))
    val attempts = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // pid-stamped under the shared graft-spark- prefix: a clean exit removes
    // it below, and graft.Bench's startup sweep reclaims dead-pid leftovers —
    // a killed run must not strand shuffle state in RAM-backed tmpfs
    val localDir = s"/dev/shm/graft-spark-${ProcessHandle.current().pid()}-timeq"
    val spark = SparkSession.builder()
      .appName(s"graft-time-$name")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    for (a <- 1 to attempts) {
      val probe = CpuProbe.efficiency(cpus.toInt)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[timeq] $name attempt=$a wall=$wall%.2f s rows=$n probe=$probe%.2f")
    }
    spark.stop()
    CpuProbe.rmDir(localDir) // tmpfs hygiene
  }
}
