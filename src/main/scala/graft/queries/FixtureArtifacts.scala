package graft.queries

/** JVM-lifetime cache for the on-the-fly artifacts the gate queries build
  * (TermIndex fixtures, IVF indexes, the IVM base view, wire-format
  * copies). Every artifact is a pure function of the source data dir, so
  * one build per (kind, dataDir) serves every later invocation — the gate
  * runs some of these twice (d_search_bm25 + s_search_served), and the
  * determinism/stress probes multiply invocations; without the cache each
  * run leaked a fresh temp directory and re-paid the build. Cached paths
  * are removed by a shutdown hook, so a long-lived JVM no longer
  * accumulates orphaned `graft-*` temp dirs. Not a library surface: real
  * deployments build their index ONCE at a caller-chosen path
  * (TermIndex.build / IvfIndex.build); this cache exists for the fixture
  * queries that must be self-contained over a read-only data dir.
  */
private[graft] object FixtureArtifacts {

  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val hooked = new java.util.concurrent.atomic.AtomicBoolean(false)

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  /** Path of the `kind` artifact for `dataDir`, building it on first use.
    * `build` receives the artifact path (inside a fresh temp dir) and must
    * fully materialize it before returning; a failed build caches nothing.
    */
  def cached(kind: String, dataDir: String)(build: String => Unit): String = {
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        dirs.values().forEach(p =>
          deleteRecursively(new java.io.File(p).getParentFile))))
    val key = kind + "|" + new java.io.File(dataDir).getCanonicalPath
    dirs.computeIfAbsent(key, _ => {
      val art = java.nio.file.Files.createTempDirectory(s"graft-$kind")
        .toString + "/art"
      build(art)
      art
    })
  }
}
