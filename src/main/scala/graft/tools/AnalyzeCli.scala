package graft.tools

import graft.analysis.Analyzer
import graft.index.{PostingListWriter, PostingListReader}

/** Dev/debug CLI: analyze text with the engine's analyzer chain and show the
  * posting-codec roundtrip — the library's smallest runnable surface.
  *
  * usage: runMain graft.tools.AnalyzeCli <lang> <text...>
  */
object AnalyzeCli {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: AnalyzeCli <lang> <text...>")
      sys.exit(2)
    }
    val lang = args(0)
    val text = args.drop(1).mkString(" ")
    val toks = Analyzer.analyze(text, lang)
    println(s"lang=$lang text=${text}")
    toks.foreach { t =>
      println(f"  pos=${t.pos}%-3d [${t.startOffset}%3d,${t.endOffset}%3d) term=${t.term}")
    }
    // posting codec smoke: index the analyzed terms of this one doc
    val byTerm = toks.groupBy(_.term).toSeq.sortBy(_._1)
    println(s"postings (docId=7, dl=${toks.length}):")
    byTerm.foreach { case (term, occ) =>
      val w = new PostingListWriter
      w.add(7L, occ.length, toks.length, occ.map(_.pos))
      val (blob, posBlob, df, cf) = w.finish()
      val r = new PostingListReader(blob, posBlob)
      val it = r.iterator(withPositions = true)
      it.start()
      println(s"  term=$term df=$df cf=$cf bytes=${blob.length}+${posBlob.length} " +
        s"decoded: doc=${it.docId} tf=${it.tf} pos=[${it.positions.mkString(",")}]")
    }
  }
}
