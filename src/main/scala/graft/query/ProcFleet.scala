package graft.query

import org.json4s._
import org.json4s.jackson.JsonMethods.{compact, parse, render}

/** Wire codec for the fleet's internal scatter RPC — the payloads a real
  * multi-process fleet moves over sockets. Queries and bounded partial heaps
  * only; payload text never crosses nodes (the coordinator point-reads the
  * ≤ pageSize winners from the shared docstore, same as the in-process
  * [[ShardedServe.Fleet]]).
  *
  * Scores travel as raw IEEE-754 bits (one long), not decimal text: partial
  * merge order is (score desc, docId asc), so the socket hop must be
  * BIT-EXACT for a process fleet to return byte-identical pages to a single
  * node — gated by ProcFleetSpec.
  */
object Wire {

  def encodeQuery(q: QuerySpec): String = compact(render(JObject(
    "lang" -> JString(q.lang),
    "query" -> JString(q.query),
    "mode" -> JString(q.mode),
    "phrase" -> JBool(q.phrase),
    "excludeWords" -> JArray(q.excludeWords.toList.map(JString(_))),
    "metaFilters" -> JObject(q.metaFilters.toList.map { case (k, vs) =>
      k -> (JArray(vs.toList.map(JString(_))): JValue) }),
    "yearRange" -> q.yearRange.map { case (a, b) =>
      JArray(List(JInt(a), JInt(b))): JValue }.getOrElse(JNull),
    "dateRange" -> q.dateRange.map { case (s, e) =>
      JObject(
        "start" -> s.map(JInt(_): JValue).getOrElse(JNull),
        "end" -> e.map(JInt(_): JValue).getOrElse(JNull)): JValue
    }.getOrElse(JNull),
    "pageSize" -> JInt(q.pageSize),
    "from" -> JInt(q.from),
    "trackTotalHits" -> JLong(q.trackTotalHits))))

  def decodeQuery(s: String): QuerySpec = {
    val j = parse(s)
    def str(f: String): String = (j \ f) match { case JString(v) => v; case _ => "" }
    def optInt(v: JValue): Option[Int] = v match {
      case JInt(n) => Some(n.toInt); case JLong(n) => Some(n.toInt); case _ => None }
    QuerySpec(
      lang = str("lang"),
      query = str("query"),
      // a MISSING mode falls back to QuerySpec's default "all", like every
      // other field — the old "" default silently flipped AND queries to
      // WAND any-mode on wire-format skew. An explicit JString("") still
      // round-trips verbatim.
      mode = (j \ "mode") match { case JString(v) => v; case _ => "all" },
      phrase = (j \ "phrase") == JBool(true),
      excludeWords = (j \ "excludeWords") match {
        case JArray(vs) => vs.collect { case JString(v) => v }; case _ => Nil },
      metaFilters = (j \ "metaFilters") match {
        case JObject(fs) => fs.map { case (k, v) => k -> (v match {
          case JArray(vs) => vs.collect { case JString(x) => x }: Seq[String]
          case _ => Nil }) }.toMap
        case _ => Map.empty },
      yearRange = (j \ "yearRange") match {
        case JArray(List(a, b)) => for (x <- optInt(a); y <- optInt(b)) yield (x, y)
        case _ => None },
      dateRange = (j \ "dateRange") match {
        case o: JObject => Some((optInt(o \ "start"), optInt(o \ "end")))
        case _ => None },
      pageSize = optInt(j \ "pageSize").getOrElse(20),
      from = optInt(j \ "from").getOrElse(0),
      trackTotalHits = (j \ "trackTotalHits") match {
        case JInt(n) => n.toLong; case JLong(n) => n; case _ => 1000L })
  }

  def encodePartials(parts: Array[SegmentResult]): String = compact(render(JObject(
    "partials" -> JArray(parts.toList.map { p =>
      JObject(
        "top" -> JArray(p.top.toList.map(d => JArray(List(
          JLong(d.docId),
          JLong(java.lang.Double.doubleToRawLongBits(d.score)))))),
        "hits" -> JLong(p.hitCount),
        "capped" -> JBool(p.capped)): JValue
    }))))

  def decodePartials(s: String): Array[SegmentResult] = (parse(s) \ "partials") match {
    case JArray(ps) => ps.map { p =>
      val top = (p \ "top") match {
        case JArray(ds) => ds.map {
          case JArray(List(id, bits)) => ScoredDoc(asLong(id),
            java.lang.Double.longBitsToDouble(asLong(bits)))
          case other => sys.error(s"bad wire doc: $other")
        }.toArray
        case other => sys.error(s"bad wire partial top: $other")
      }
      SegmentResult(top, asLong(p \ "hits"), (p \ "capped") == JBool(true))
    }.toArray
    // a 200 with valid JSON but no "partials" key is a WRONG peer (wrong
    // service on the port, wire-format skew) — silently treating it as an
    // empty shard would drop a corpus slice from every page with no signal
    case other => sys.error(s"peer response is not a partials payload: ${s.take(120)}")
  }

  def encodeFacetMeta(m: Map[String, Map[String, Seq[String]]]): String =
    compact(render(JObject(m.toList.sortBy(_._1).map { case (ct, inner) =>
      ct -> (JObject(inner.toList.sortBy(_._1).map { case (k, vs) =>
        k -> (JArray(vs.toList.map(JString(_))): JValue) }): JValue) })))

  def decodeFacetMeta(s: String): Map[String, Map[String, Seq[String]]] =
    parse(s) match {
      case JObject(cts) => cts.map { case (ct, inner) =>
        ct -> (inner match {
          case JObject(ks) => ks.map { case (k, v) => k -> (v match {
            case JArray(vs) => vs.collect { case JString(x) => x }: Seq[String]
            case _ => Nil }) }.toMap
          case _ => Map.empty[String, Seq[String]] })
      }.toMap
      case other => sys.error(s"peer response is not a facet payload: ${s.take(120)}")
    }

  def encodeNeighborReq(lang: String, docId: Long, meta: Map[String, String]): String =
    compact(render(JObject(
      "lang" -> JString(lang),
      "docId" -> JLong(docId),
      "meta" -> JObject(meta.toList.sortBy(_._1).map { case (k, v) =>
        k -> (JString(v): JValue) }))))

  def decodeNeighborReq(s: String): (String, Long, Map[String, String]) = {
    val j = parse(s)
    val lang = (j \ "lang") match { case JString(v) => v; case _ => "" }
    val meta = (j \ "meta") match {
      case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String] }
    (lang, asLong(j \ "docId"), meta)
  }

  def encodeNeighbors(prev: Option[Long], next: Option[Long]): String =
    compact(render(JObject(
      "prev" -> prev.map(JLong(_): JValue).getOrElse(JNull),
      "next" -> next.map(JLong(_): JValue).getOrElse(JNull))))

  def decodeNeighbors(s: String): (Option[Long], Option[Long]) = {
    val j = parse(s)
    def opt(v: JValue): Option[Long] = v match {
      case JInt(n) => Some(n.toLong); case JLong(n) => Some(n); case _ => None }
    (opt(j \ "prev"), opt(j \ "next"))
  }

  def encodeChunks(chunks: Option[Set[Int]]): String = compact(render(JObject(
    "chunks" -> chunks.map(cs =>
      JArray(cs.toList.sorted.map(c => JInt(c): JValue)): JValue)
      .getOrElse(JString("all")))))

  def decodeChunks(s: String): Option[Set[Int]] = (parse(s) \ "chunks") match {
    case JString("all") => None
    case JArray(vs) => Some(vs.map(v => asLong(v).toInt).toSet)
    case other => sys.error(s"peer response is not a chunks payload: ${s.take(120)}")
  }

  // ---- similar-documents scatter (FleetSimilar) ----
  // vectors travel as raw IEEE-754 float bits (ints) and similarities as raw
  // double bits, same bit-exactness contract as the partial heaps: the
  // fleet's merge order (sim desc, id asc) must match a single node's

  def encodeVecReq(docId: Long): String =
    compact(render(JObject("docId" -> JLong(docId))))

  def decodeVecReq(s: String): Long = asLong(parse(s) \ "docId")

  def encodeVec(v: Option[Array[Float]]): String = compact(render(JObject(
    "vec" -> v.map(a => JArray(a.toList.map(f =>
      JInt(java.lang.Float.floatToRawIntBits(f)): JValue)): JValue).getOrElse(JNull))))

  def decodeVec(s: String): Option[Array[Float]] = (parse(s) \ "vec") match {
    case JArray(vs) =>
      Some(vs.map(v => java.lang.Float.intBitsToFloat(asLong(v).toInt)).toArray)
    case JNull => None
    case other => sys.error(s"peer response is not a vec payload: ${s.take(120)}")
  }

  def encodeSimilarReq(v: Array[Float], size: Int, excludeId: Long): String =
    compact(render(JObject(
      "vec" -> JArray(v.toList.map(f =>
        JInt(java.lang.Float.floatToRawIntBits(f)): JValue)),
      "size" -> JInt(size),
      "exclude" -> JLong(excludeId))))

  def decodeSimilarReq(s: String): (Array[Float], Int, Long) = {
    val j = parse(s)
    val vec = (j \ "vec") match {
      case JArray(vs) => vs.map(v => java.lang.Float.intBitsToFloat(asLong(v).toInt)).toArray
      case other => sys.error(s"bad similar request vec: $other")
    }
    (vec, asLong(j \ "size").toInt, asLong(j \ "exclude"))
  }

  def encodeSimilarHits(hits: Seq[(Long, Double)]): String = compact(render(JObject(
    "hits" -> JArray(hits.toList.map { case (id, sim) =>
      JArray(List(JLong(id),
        JLong(java.lang.Double.doubleToRawLongBits(sim)))): JValue
    }))))

  def decodeSimilarHits(s: String): Seq[(Long, Double)] = (parse(s) \ "hits") match {
    case JArray(hs) => hs.map {
      case JArray(List(id, bits)) =>
        (asLong(id), java.lang.Double.longBitsToDouble(asLong(bits)))
      case other => sys.error(s"bad wire similar hit: $other")
    }
    case other => sys.error(s"peer response is not a similar payload: ${s.take(120)}")
  }

  private def asLong(v: JValue): Long = v match {
    case JInt(n) => n.toLong
    case JLong(n) => n
    case other => sys.error(s"expected integer, got $other")
  }
}

/** Multi-PROCESS fleet coordinator: the in-process [[ShardedServe.Fleet]]
  * promoted to real scatter — each doc shard is a separate JVM
  * ([[graft.tools.ServeCli]] with GRAFT_SERVE_CHUNKS) exposing its bounded
  * partials over HTTP (/api/internal/partials), and the coordinator runs the
  * HEAD shard in-process (one fewer hop per query, same as the thread
  * fleet's head-on-calling-thread) while tail shards answer over sockets
  * with JSON-serialized heaps.
  *
  * Identical results to a single full node for the same reasons as the
  * thread fleet (global-df idf, disjoint doc shards, pure interleave merge)
  * PLUS bit-exact score transport ([[Wire]]) — gated end-to-end over real
  * sockets by ProcFleetSpec.
  */
/** @param localRef supplier of the coordinator's own (chunk-subset) head
  *   shard — a FUNCTION so a hot-reloading deployment ([[ReloadingNode]])
  *   can atomically swap the resident node under the fleet when the on-disk
  *   index mutates; a static deployment passes `() => node`.
  * @param numChunks the index's chunk count — coverage is verified BY
  *   CONSTRUCTION on first search (see [[verifyCoverage]]), so a ProcFleet
  *   built by any caller refuses to serve with overlapping or missing
  *   shards instead of relying on caller discipline.
  */
/** @param allowDegraded partial-failure policy for `search`: when false
  *   (default) a shard that stays unreachable after one bounded retry FAILS
  *   the query (500 to the client — correct but brutal); when true the
  *   coordinator serves the page from the shards that answered and flags it
  *   `coverageDegraded` — degraded is never silent, and every non-search
  *   surface (facets, context, coverage handshake) still fails hard.
  */
final class ProcFleet(localRef: () => InMemoryIndex, peers: Seq[String],
    numChunks: Int, allowDegraded: Boolean = false) extends SearchNode {

  private def local: InMemoryIndex = localRef()

  // bounded timeouts on every peer hop (see PeerRpc): a scatter that cannot
  // complete must FAIL (500 to the client), not wedge the node
  private def postAsync(url: String, body: String)
      : java.util.concurrent.CompletableFuture[String] =
    PeerRpc.postAsync(url, body)

  /** Coverage handshake: assert that this coordinator's shard plus every
    * peer's shard form a DISJOINT, COMPLETE cover of the index's chunks.
    * A mis-launched fleet (wrong GRAFT_SERVE_CHUNKS on one node) would
    * otherwise serve 200s silently missing a corpus slice — the failure
    * mode is invisible to every per-query check.
    */
  // Coverage is an invariant, not an optional check: the first search runs
  // the handshake (memoized on success; a failure is NOT memoized, so a
  // fleet whose peers come up late retries on the next query rather than
  // staying permanently broken). verifyCoverage stays public for boot-time
  // fail-fast callers (ServeCli verifies before announcing readiness).
  private val coverageOk = new java.util.concurrent.atomic.AtomicBoolean(false)
  private def ensureCoverage(): Unit =
    if (!coverageOk.get()) synchronized {
      if (!coverageOk.get()) { verifyCoverage(numChunks); coverageOk.set(true) }
    }

  def verifyCoverage(expectChunks: Int = numChunks): Unit = {
    doVerifyCoverage(expectChunks)
    // a successful boot-time handshake at the constructor's chunk count
    // satisfies the lazy first-search check — don't repeat the fleet-wide
    // RPC barrier on the first query
    if (expectChunks == numChunks) coverageOk.set(true)
  }

  private def doVerifyCoverage(expectChunks: Int): Unit = {
    val numChunks = expectChunks
    val localSet = local.servedChunks.getOrElse(
      sys.error("ProcFleet coordinator must serve a chunk SUBSET " +
        "(a full-node coordinator double-counts peer docs)"))
    val peerSets = peers.map { p =>
      val url = s"$p/api/internal/chunks"
      p -> Wire.decodeChunks(
          PeerRpc.joinRetry(url, "{}", postAsync(url, "{}")))
        .getOrElse(sys.error(s"peer $p serves the FULL index — overlaps the coordinator"))
    }
    val all = localSet +: peerSets.map(_._2)
    val union = all.reduce(_ ++ _)
    val totalClaimed = all.map(_.size).sum
    require(totalClaimed == union.size,
      s"fleet shards overlap: local=$localSet peers=${peerSets.map(t => t._1 -> t._2)}")
    val expected = (0 until numChunks).toSet
    require(union == expected,
      s"fleet does not cover the index: served=${union.toSeq.sorted} " +
        s"expected=${expected.toSeq.sorted} — fix GRAFT_SERVE_CHUNKS assignments")
  }

  def search(q: QuerySpec): SearchResult = {
    ensureCoverage()
    // pin ONE node for the whole query: a hot-reload swap between partial
    // and materialize would otherwise merge partials from one index version
    // with payloads/suggestions from another
    val node = local
    val body = Wire.encodeQuery(q)
    // scatter to tail shards first, then run the head shard while they work
    val futs = peers.map(p => postAsync(s"$p/api/internal/partials", body))
    val localPart = node.searchPartial(q)
    var degraded = false
    val remote = peers.zip(futs).flatMap { case (p, f) =>
      // TRANSPORT failures (connect/read timeout, reset, non-200 from a
      // restarting shard) are retried once and may degrade; a 200 whose BODY
      // fails Wire.decodePartials is wire-format skew — a deterministic
      // deployment bug (mixed builds, wrong service on the port) that a
      // retry re-manufactures and a degraded response would hide as an
      // availability event, silently dropping that shard's corpus slice from
      // every page. Decode stays OUTSIDE the retry/degraded policy so it
      // always fails the query loudly.
      // The join-then-retry itself is PeerRpc.joinRetry — the ONE copy of
      // the retry policy (a per-class inline copy is how the round-4
      // fleet-wedging bug happened); only the degraded DECISION lives here.
      def fetch(fut: java.util.concurrent.CompletableFuture[String]): Option[String] =
        try Some(PeerRpc.joinRetry(s"$p/api/internal/partials", body, fut))
        catch {
          case e: Exception =>
            if (!allowDegraded) throw e
            System.err.println(s"[fleet] WARN shard $p down after retry " +
              s"(${e.getMessage}) — serving degraded")
            degraded = true
            None
        }
      fetch(f) match {
        case Some(bodyStr) => Wire.decodePartials(bodyStr)
        case None => Array.empty[SegmentResult]
      }
    }
    node.materialize(q, localPart ++ remote.toArray)
      .copy(coverageDegraded = degraded)
  }

  def facetMetadata(fields: Set[String],
      contentKey: String): Map[String, Map[String, Seq[String]]] = {
    ensureCoverage()
    val req = compact(render(JObject(
      "fields" -> JArray(fields.toList.sorted.map(JString(_))),
      "contentKey" -> JString(contentKey))))
    // same one-retry join as the partials scatter (PeerRpc owns the policy);
    // decode stays outside it — wire skew fails loudly here too
    val futs = peers.map { p =>
      val url = s"$p/api/internal/facets"
      (url, postAsync(url, req))
    }
    val localMeta = local.facetMetadata(fields, contentKey)
    ShardedServe.unionFacetMeta(localMeta +: futs.map { case (url, f) =>
      Wire.decodeFacetMeta(PeerRpc.joinRetry(url, req, f)) })
  }

  def docPayloads(ids: Seq[Long]): Map[Long, DocPayload] = local.docPayloads(ids)

  def context(chunkId: Long): Option[(DocPayload, Option[DocPayload], Option[DocPayload])] = {
    ensureCoverage()
    // pin ONE node for the whole lookup (the same invariant search() pins
    // `val node = local` for): with a hot-reloading supplier, a swap landing
    // between the neighbor choice and the payload fetch would pair a
    // neighbor docId chosen on the pre-mutation index with post-mutation
    // payload state — silently dropping a prev/next paragraph
    val node = local
    node.docPayloads(Seq(chunkId)).get(chunkId).map { cur =>
      val req = Wire.encodeNeighborReq(cur.lang, cur.docId, cur.meta)
      val futs = peers.map { p =>
        val url = s"$p/api/internal/neighbors"
        (url, postAsync(url, req))
      }
      val (prev, next) = ShardedServe.mergeNeighbors(
        node.neighborIds(cur.lang, cur.docId, cur.meta) +:
          futs.map { case (url, f) =>
            Wire.decodeNeighbors(PeerRpc.joinRetry(url, req, f)) })
      val fetched = node.docPayloads(prev.toSeq ++ next.toSeq)
      (cur, prev.flatMap(fetched.get), next.flatMap(fetched.get))
    }
  }
}
