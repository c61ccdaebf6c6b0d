package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core.BoundedCache

class BoundedCacheSpec extends AnyFunSuite {

  test("memoizes: the builder runs once per key") {
    val c = new BoundedCache[String, String](4)
    var builds = 0
    def get(k: String) = c.getOrElseUpdate(k) { builds += 1; k.toUpperCase }
    assert(get("a") == "A" && get("a") == "A" && builds == 1)
    assert(get("b") == "B" && builds == 2)
  }

  test("caps at maxEntries, evicting least-recently-USED (access order)") {
    val c = new BoundedCache[Int, Int](3)
    var builds = 0
    def get(k: Int) = c.getOrElseUpdate(k) { builds += 1; k * 10 }
    (1 to 3).foreach(get) // 1,2,3 cached
    get(1)                // touch 1 — now 2 is eldest
    get(4)                // evicts 2
    assert(c.size == 3 && builds == 4)
    get(1); get(3); get(4)
    assert(builds == 4, "1/3/4 must still be cached")
    get(2)
    assert(builds == 5, "2 was evicted and rebuilds")
  }

  test("a rebuilt evicted key is served again afterwards") {
    val c = new BoundedCache[Int, String](1)
    var builds = 0
    def get(k: Int) = c.getOrElseUpdate(k) { builds += 1; s"v$k" }
    assert(get(1) == "v1" && get(2) == "v2" && get(1) == "v1" && builds == 3)
    assert(get(1) == "v1" && builds == 3)
  }
}
