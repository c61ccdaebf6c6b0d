package graft.core

/** The per-source-dir temp-layout memo every lake/index GATE builder shares:
  * one parquet-backed root per (prefix, source dir), built exactly once per
  * session by the caller's lambda, removed recursively by a JVM shutdown
  * hook. Centralizing it keeps the recursive-delete hook in one place (it
  * was hand-retyped at each gate before) and gives every gate the same
  * [[BoundedCache]] semantics: Verify's dump and Bench's warm+timed repeats
  * serve from one build, an evicted memo entry just rebuilds, and racing
  * builders of ONE root build exactly once behind a per-key latch (the
  * builders write multi-file layouts — racing writers into one tree would
  * interleave) while different roots build concurrently. */
object TempLayouts {
  private val roots = new BoundedCache[String, String]()

  /** Root directory for (`prefix`, `dir`), running `build(root)` on first
    * request. `prefix` is also the temp-directory name prefix. */
  def rootFor(prefix: String, dir: String)(build: String => Unit): String =
    roots.getOrElseUpdate(s"$prefix|$dir") {
      val r = java.nio.file.Files.createTempDirectory(prefix).toString
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        import java.nio.file.{Files, Path}
        val p = Path.of(r)
        if (Files.exists(p))
          Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
            .forEach(f => Files.deleteIfExists(f))
      }))
      build(r)
      r
    }
}
