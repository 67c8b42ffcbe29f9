package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.corpus.Webtext.mix64

/** Text-analysis operators for a training-data pipeline: language-ID,
  * quality scoring, token counting, document fingerprinting. The per-doc
  * measures are expressed as built-in column expressions wherever possible
  * (codegen'd, whole-stage) — only the rolling-hash fingerprints need Scala.
  */
object TextAnalysis {

  /** Script-ratio + stopword-marker language-ID heuristic. On Devanagari /
    * Gujarati script the script ratio decides; on Latin script, 'en'.
    * Returns column expr usable directly in select (pure built-ins).
    */
  def langIdExpr(text: Column): Column = {
    val len = greatest(length(text), lit(1))
    val deva = length(regexp_replace(text, "[^\\u0900-\\u097F]", ""))
    val guj = length(regexp_replace(text, "[^\\u0A80-\\u0AFF]", ""))
    val latin = length(regexp_replace(text, "[^A-Za-z]", ""))
    when(deva / len > 0.3, lit("hi"))
      .when(guj / len > 0.3, lit("gu"))
      .when(latin / len > 0.3, lit("en"))
      .otherwise(lit("und"))
  }

  /** Quality measures (length / punctuation / stopword ratios) + a composite
    * score in [0,1]. All built-in expressions; stopRatio uses a small
    * broadcast list baked into the regex.
    */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val words = split(trim(text), "\\s+")
    val nTokens = when(length(trim(text)) === 0, 0).otherwise(size(words))
    val avgTokLen = when(nTokens === 0, 0.0)
      .otherwise(length(regexp_replace(text, "\\s+", "")) / nTokens.cast("double"))
    val punct = length(regexp_replace(text, "[^.,;:!?।॥'\"()\\[\\]-]", ""))
    val punctRatio = punct / greatest(nChars, lit(1)).cast("double")
    val digits = length(regexp_replace(text, "[^0-9]", ""))
    val digitRatio = digits / greatest(nChars, lit(1)).cast("double")
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "और", "की", "के", "અને", "છે")
    // case-insensitive: sentence-initial "The"/"A"/"In" are the same
    // stopwords. Lowercase the already-split `words` elements rather than
    // re-splitting lower(text) — same count (lower() never creates or
    // removes \s+ boundaries), one regex-split scan of the text instead of
    // two on this scoring path
    val stopHits = size(filter(words, w => lower(w).isin(stop.map(lit(_)): _*)))
    val stopRatio = when(nTokens === 0, 0.0).otherwise(stopHits / nTokens.cast("double"))
    val lengthOk = nTokens.between(20, 10000).cast("double")
    val score = round(
      lit(0.4) * lengthOk +
        lit(0.3) * (lit(1.0) - least(punctRatio * 5, lit(1.0))) +
        lit(0.3) * (lit(1.0) - least(digitRatio * 5, lit(1.0))), 6)
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTokens,
      "avg_token_len" -> round(avgTokLen, 6),
      "punct_ratio" -> round(punctRatio, 6),
      "digit_ratio" -> round(digitRatio, 6),
      "stopword_ratio" -> round(stopRatio, 6),
      "quality_score" -> score)
  }

  /** Token counts: whitespace tokens and a BPE-ish pre-tokenizer count
    * (runs of letters per script, runs of digits, single punctuation marks —
    * the classic GPT-2-style pre-tokenization shape, without the merges).
    * RE2-compatible alternation (no lookarounds) so the same pattern runs in
    * the DuckDB oracle.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[\\u0900-\\u097F\\u0A80-\\u0AFF]+|[^A-Za-z0-9\\u0900-\\u097F\\u0A80-\\u0AFF\\s]"

  def tokenCountColumns(text: Column): Seq[(String, Column)] = {
    val ws = when(length(trim(text)) === 0, 0).otherwise(size(split(trim(text), "\\s+")))
    val bpeish = size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))
    Seq("ws_tokens" -> ws, "bpeish_tokens" -> bpeish)
  }

  /** Content fingerprint: md5 of whitespace/case-normalized text (exact-dup
    * detection robust to spacing), plus a winnowing fingerprint set.
    */
  def md5Fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "\\s+", " "))

  /** Winnowing (Schleimer et al. 2003): k-gram Rabin-style rolling hashes,
    * minimum per sliding window w → a small set of position-robust
    * fingerprints for near-dup/plagiarism-style matching.
    */
  def winnow(text: String, k: Int = 8, w: Int = 16): Array[Long] = {
    val s = text.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ")
    if (s.length < k) return Array.empty
    val B = 257L
    var pow = 1L
    for (_ <- 1 until k) pow *= B
    val n = s.length - k + 1
    val hs = new Array[Long](n)
    var h = 0L
    for (i <- 0 until k) h = h * B + s.charAt(i)
    hs(0) = mix64(h)
    var i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      hs(i) = mix64(h)
      i += 1
    }
    if (n <= w) return Array(hs.min)
    val out = scala.collection.mutable.LinkedHashSet[Long]()
    var start = 0
    while (start + w <= n) {
      var m = hs(start)
      var j = start + 1
      while (j < start + w) { if (hs(j) < m) m = hs(j); j += 1 }
      out += m
      start += 1
    }
    out.toArray
  }

  val winnowUdf =
    udf((text: String) => if (text == null) Seq.empty[Long] else winnow(text).toSeq)

  /** Split each document into overlapping fixed-token training windows —
    * the standard sequence-prep op before packing/tokenizing a pre-training
    * batch. Windows start every `maxTokens - overlap` tokens; a start whose
    * window would be fully contained in the previous one is not emitted
    * (final short tails are kept only when they add uncovered tokens).
    * Whitespace tokens (the ws variant of [[tokenCountColumns]]).
    *
    * Scale shape: pure per-row built-ins (sequence/transform/slice — no
    * UDF, stays in codegen) + one posexplode; no shuffle at all. Empty
    * docs emit no windows.
    *
    * @return (doc_id, chunk_id, n_tokens, chunk_text)
    */
  def chunkByTokens(docs: DataFrame, maxTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got $overlap / $maxTokens")
    val step = maxTokens - overlap
    val words = filter(split(col("text"), "\\s+"), w => w =!= "")
    val n = size(words)
    // windows = 1 + floor((n - overlap - 1) / step) when n > overlap; 1 when
    // 0 < n <= overlap; 0 when the doc is empty
    val nWindows = when(n <= 0, lit(0))
      .when(n <= overlap, lit(1))
      .otherwise(lit(1) + floor((n - overlap - 1) / step).cast("int"))
    // sequence(0, -1, 1) throws — empty docs take the empty-array branch
    // (posexplode then emits no rows)
    val starts = when(nWindows > 0, sequence(lit(0), nWindows - 1, lit(1)))
      .otherwise(array().cast("array<int>"))
    docs
      .withColumn("ws", words)
      .select(col("doc_id"),
        posexplode(transform(starts, i => slice(col("ws"), i * step + 1, lit(maxTokens))))
          .as(Seq("chunk_id", "chunk")))
      .select(
        col("doc_id"),
        col("chunk_id"),
        size(col("chunk")).as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Pack chunk rows into fixed-token-budget training sequences — the
    * padding-minimizing step after [[chunkByTokens]]. GPT-style streaming
    * packing: within a shard, chunks concatenate in deterministic
    * (doc_id, chunk_id) order and a new pack starts whenever the running
    * token count would pass `budget` (each chunk belongs to the pack its
    * first token falls in). Sharding (doc_id mod nShards) keeps the window
    * partitioned — packing is embarrassingly parallel across shards, the
    * way a 1000-executor job would run it; a global single-partition window
    * would be the scale-killer Spark warns about.
    *
    * Input needs (doc_id, chunk_id, n_tokens);
    * output adds (shard, pack_id) — aggregate by (shard, pack_id) for
    * sequence-level stats.
    */
  def packChunks(chunks: DataFrame, budget: Int, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id", "chunk_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    chunks
      .withColumn("shard", pmod(col("doc_id"), lit(nShards)).cast("int"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("pack_id", floor(col("cum_before") / budget).cast("int"))
      .drop("cum_before")
  }

  /** Assemble the full per-doc analysis frame. */
  def analyzeDocs(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val withQ = (qualityColumns(t) ++ tokenCountColumns(t) ++
      Seq("lang_pred" -> langIdExpr(t), "fingerprint_md5" -> md5Fingerprint(t)))
      .foldLeft(docs) { case (d, (name, c)) => d.withColumn(name, c) }
    withQ
  }
}
