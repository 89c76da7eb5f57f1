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
    *
    * The cache key assumes the data dir is IMMUTABLE for the JVM's life —
    * true for the driver's read-only sf dirs this cache exists for. The key
    * therefore includes a cheap content fingerprint (documents.parquet's
    * file sizes + mtimes) so a dir rewritten in place misses the cache
    * instead of silently serving a stale index. Builds run OUTSIDE the
    * map's lock (first-build-wins publication): a multi-minute Spark build
    * inside computeIfAbsent would block every unrelated cached() call on
    * the same hash bin.
    */
  def cached(kind: String, dataDir: String)(build: String => Unit): String = {
    if (hooked.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        dirs.values().forEach(p =>
          deleteRecursively(new java.io.File(p).getParentFile))))
    val canon = new java.io.File(dataDir).getCanonicalFile
    val docs = new java.io.File(canon, "documents.parquet")
    val fp =
      if (!docs.exists()) 0L
      else Option(docs.listFiles()).getOrElse(Array(docs))
        .foldLeft(0L)((h, f) =>
          h * 1000003L + f.getName.hashCode + f.length + f.lastModified)
    val key = s"$kind|$canon|$fp"
    val existing = dirs.get(key)
    if (existing != null) return existing
    val art = java.nio.file.Files.createTempDirectory(s"graft-$kind")
      .toString + "/art"
    build(art) // outside the lock; concurrent duplicate builds race benignly
    val prior = dirs.putIfAbsent(key, art)
    if (prior != null) { // lost the race: drop this copy, serve the winner
      deleteRecursively(new java.io.File(art).getParentFile)
      prior
    } else art
  }
}
