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
  * `getOrElseUpdate` holds the lock across the build, deliberately: the
  * builders behind it write multi-file layouts, and two racing builders for
  * one key would interleave writes into one directory tree. Callers are the
  * sequential Verify/Bench mains; a concurrent session serializes builds and
  * that is the safe behavior. */
final class BoundedCache[K, V](maxEntries: Int = 64) {
  require(maxEntries >= 1, "cache needs at least one slot")
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      size() > maxEntries
  }
  def getOrElseUpdate(k: K)(mk: => V): V = synchronized {
    val cur = m.get(k)
    if (cur != null) cur
    else { val v = mk; m.put(k, v); v }
  }
  def size: Int = synchronized(m.size())
}
