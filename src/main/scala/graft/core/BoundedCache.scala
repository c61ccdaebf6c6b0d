package graft.core

/** Size-capped, access-ordered (LRU) memo for per-source-dir build artifacts:
  * temp parquet layouts, prebuilt ANN/dedup indexes, replayed ledger frames.
  * The per-dir caches exist so Verify's dump and Bench's warm+timed repeats
  * serve from one build instead of rebuilding per call; an unbounded TrieMap
  * does that too, but a long-lived session iterating many source dirs grows
  * it forever. Eviction drops only the MEMO: an evicted temp layout stays on
  * disk until its shutdown hook runs (disk is the bounded-by-/tmp resource a
  * re-request can also rebuild), and a re-requested key simply rebuilds.
  *
  * The map lock is held only for lookup/insert; the BUILD runs outside it
  * behind a per-key latch. Two racing callers of one key still build exactly
  * once (the builders write multi-file layouts — racing writers into one
  * directory tree would interleave), but unrelated keys build CONCURRENTLY:
  * one slow lake build no longer serializes every other gate's build in a
  * shared-JVM session, and a nested build of a DIFFERENT key from inside a
  * builder's lambda cannot deadlock. A failed build clears its latch, so a
  * later call retries instead of caching the failure. */
final class BoundedCache[K, V](maxEntries: Int = 64) {
  require(maxEntries >= 1, "cache needs at least one slot")
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > maxEntries
  }
  /** In-flight build latch: the FutureTask plus the thread running it, so a
    * builder that transitively re-requests its OWN key fails loudly instead
    * of parking forever on its own latch. */
  private final class Build(mk: () => V) {
    @volatile var owner: Thread = _
    val task = new java.util.concurrent.FutureTask[V](() => {
      owner = Thread.currentThread(); mk()
    })
  }
  private val inflight =
    new java.util.concurrent.ConcurrentHashMap[K, Build]()

  def getOrElseUpdate(k: K)(mk: => V): V = {
    val cached = synchronized(m.get(k))
    if (cached != null) return cached
    val b = inflight.computeIfAbsent(k, _ => new Build(() => mk))
    if (b.owner eq Thread.currentThread())
      throw new IllegalStateException(
        s"BoundedCache builder for key $k re-requested its own key — " +
          "self-referential build")
    b.task.run() // idempotent: only the latch-winning caller executes the builder
    try {
      val v = b.task.get()
      synchronized(m.put(k, v))
      v
    } catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    } finally inflight.remove(k, b)
  }
  def size: Int = synchronized(m.size())
}
