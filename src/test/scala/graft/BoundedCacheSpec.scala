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

  test("racing callers of ONE key build once; DIFFERENT keys build concurrently") {
    val c = new BoundedCache[String, String](8)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    // same key from 8 threads: exactly one build, all see its value
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val same = (1 to 8).map(_ => pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = c.getOrElseUpdate("k") {
          builds.incrementAndGet(); Thread.sleep(50); "V"
        }
      }))
      assert(same.map(_.get()).toSet == Set("V"))
      assert(builds.get() == 1)
      // one key's SLOW build must not serialize another key's build: start a
      // build that blocks until the second key's build completes — under the
      // old hold-the-lock-across-builds scheme this deadlocks
      val gate = new java.util.concurrent.CountDownLatch(1)
      val slow = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = c.getOrElseUpdate("slow") {
          assert(gate.await(10, java.util.concurrent.TimeUnit.SECONDS),
            "independent key's build never ran — builds are serialized")
          "S"
        }
      })
      val fast = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = c.getOrElseUpdate("fast") { gate.countDown(); "F" }
      })
      assert(fast.get(10, java.util.concurrent.TimeUnit.SECONDS) == "F")
      assert(slow.get(10, java.util.concurrent.TimeUnit.SECONDS) == "S")
    } finally pool.shutdownNow()
  }

  test("a self-referential build fails loudly instead of deadlocking on its own latch") {
    val c = new BoundedCache[String, Int](4)
    val e = intercept[IllegalStateException](
      c.getOrElseUpdate("k") { c.getOrElseUpdate("k")(1) + 1 })
    assert(e.getMessage.contains("re-requested its own key"))
    // and the latch cleared: a sane later build succeeds
    assert(c.getOrElseUpdate("k")(7) == 7)
  }

  test("a failed build clears its latch: the next call retries") {
    val c = new BoundedCache[String, Int](4)
    var attempts = 0
    def get() = c.getOrElseUpdate("k") {
      attempts += 1
      if (attempts == 1) sys.error("boom")
      42
    }
    val e = intercept[RuntimeException](get())
    assert(e.getMessage == "boom")
    assert(get() == 42 && attempts == 2)
  }
}
