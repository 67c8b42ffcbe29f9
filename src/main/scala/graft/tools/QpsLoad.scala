package graft.tools

import graft.query.{QuerySpec, SearchNode}

/** The ONE mixed-shape concurrent query load used by every throughput
  * measurement (Bench serve_qps/fleet sections, FleetLadder steps). Shared
  * so the tools cannot drift into measuring different loads — the
  * pool-shutdown-in-finally fix had already landed in one copy and not the
  * other when this was extracted.
  */
object QpsLoad {

  /** Same five shapes as the serve p50 metrics: and / any / phrase /
    * head-term any / category-filtered.
    */
  def mix(lang: String = "hi"): IndexedSeq[QuerySpec] = {
    val phrase = graft.corpus.Webtext.GoldenPhrase(lang).mkString(" ")
    IndexedSeq(
      QuerySpec(lang, phrase),
      QuerySpec(lang, phrase, mode = "any"),
      QuerySpec(lang, phrase, phrase = true),
      QuerySpec(lang, graft.corpus.Webtext.word(lang, 0), mode = "any"),
      QuerySpec(lang, phrase, metaFilters = Map("category" -> Seq("Pravachan"))))
  }

  /** Drain `queries` queries through `node` on `threads` workers; returns
    * queries/second. The pool is shut down in a finally: a failed query must
    * fail the measurement loudly, not leave non-daemon pool threads parked
    * so the JVM never exits.
    */
  def run(node: SearchNode, threads: Int, queries: Int,
      shapes: IndexedSeq[QuerySpec]): Double = {
    val next = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val futs = (1 to threads).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var i = next.getAndIncrement()
          while (i < queries) {
            node.search(shapes(i % shapes.length))
            i = next.getAndIncrement()
          }
        }
      })
    }
    try futs.foreach(_.get())
    finally pool.shutdown()
    queries / ((System.nanoTime() - t0) / 1e9)
  }
}
