package graft.tools

/** Measures how much parallel CPU capacity the machine actually delivers at
  * k threads, as T_1 / T_k for identical pure-compute spin work (ideal 1.0).
  *
  * Why: this sandbox is a VM on a shared host; /proc/stat steal explains some
  * interference, but the host can also cap effective parallel throughput in
  * ways steal% does not show (observed: 32 identical busy loops finishing at
  * only ~63% of linear while steal read <3%). Benches report this number so
  * a reader can separate engine scaling from machine capacity at measurement
  * time — on a real cluster each executor owns its cores and this is ~1.0.
  */
object CpuProbe {

  /** (total jiffies, steal jiffies) from /proc/stat — the ONE copy of the
    * steal accounting shared by every bench/ladder tool. First 8 fields only
    * (user..steal): guest/guest_nice are already counted inside user/nice;
    * including them double-counts the denominator and understates steal% on
    * guest-running hosts.
    */
  def cpuStat(): (Long, Long) = {
    val src = scala.io.Source.fromFile("/proc/stat")
    try {
      val f = src.getLines().next().split("\\s+")
      val vals = f.drop(1).take(8).map(_.toLong)
      (vals.sum, vals(7))
    } finally src.close()
  }

  /** Recursive local delete shared by the bench/ladder tools. */
  def rmDir(p: String): Unit = {
    val d = new java.io.File(p)
    if (d.exists()) scala.reflect.io.Directory(d).deleteRecursively()
  }

  /** CLI: print delivered parallel efficiency at k threads (default 32, 8). */
  def main(args: Array[String]): Unit = {
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(32, 8)
    ks.foreach(k => println(f"probe[$k%2d threads] = ${efficiency(k)}%.3f"))
  }

  @volatile private var sink: Long = 0L

  private def spin(n: Long): Unit = {
    var i = 0L
    var x = 0L
    while (i < n) { x ^= i * 0x9E3779B97F4A7C15L; i += 1 }
    sink ^= x
  }

  /** Delivered-parallelism efficiency at k threads (1.0 = linear). */
  def efficiency(k: Int, n: Long = 800000000L): Double = {
    spin(n / 8) // JIT warmup
    val t0 = System.nanoTime()
    spin(n)
    val t1 = System.nanoTime() - t0
    val threads = (1 to k).map(_ => new Thread(() => spin(n)))
    val tp0 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val tk = System.nanoTime() - tp0
    t1.toDouble / tk
  }
}
