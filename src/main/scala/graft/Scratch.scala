package graft

import java.nio.file.{Files, Path, Paths}

/** Deterministic scratch-directory naming + lifecycle for operators
  * that stage data under java.io.tmpdir (the persisted ANN index, the
  * disk-level streaming oracle).
  *
  * Why not `String.hashCode`: 32 bits collide across sf dirs, and two
  * JVMs (Bench and Verify on the same sf) racing a mode-overwrite
  * reset can read back a mixed or mid-reset directory. Names here are
  * the sanitized basename (human-debuggable) plus 64 bits of SHA-256
  * of the full key; per-JVM variants append the PID so concurrent
  * JVMs never share a mutable root.
  */
object Scratch {

  /** Stable cross-JVM scratch path for `key` (e.g. an sf dir):
    * `<tmp>/<prefix>_<basename>_<sha16>`. Callers that REUSE content
    * across JVMs must make their own publication atomic
    * (build-into-tmp + atomic rename — see the persisted ANN index).
    */
  def sharedDir(prefix: String, key: String): Path = {
    val base = Paths.get(key).getFileName.toString
      .replaceAll("[^A-Za-z0-9._-]", "_")
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(key.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    Paths.get(System.getProperty("java.io.tmpdir"), s"${prefix}_${base}_$sha")
  }

  /** Per-JVM scratch path (sharedDir + `_pid<pid>`), deleted on JVM
    * exit: repeated calls within one JVM reuse (and may reset) the
    * same directory, concurrent JVMs never collide, and nothing leaks
    * past the process.
    */
  def jvmDir(prefix: String, key: String): Path = {
    val p = Paths.get(sharedDir(prefix, key).toString +
      "_pid" + ProcessHandle.current().pid())
    cleanupOnExit(p)
    p
  }

  /** Fresh random temp dir (parallel invocations never collide),
    * deleted on JVM exit — the drop-in for bare
    * `Files.createTempDirectory` call sites that used to leak one
    * directory per run.
    */
  def tempDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    cleanupOnExit(p)
    p
  }

  /** Recursively delete `p` if present (idempotent). */
  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => { Files.deleteIfExists(f); () })
    }

  private val exitHooks =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Path]()
  private val hookInstalled = new java.util.concurrent.atomic.AtomicBoolean

  private def cleanupOnExit(p: Path): Unit = {
    if (hookInstalled.compareAndSet(false, true))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        exitHooks.forEach { d =>
          try deleteRecursively(d) catch { case _: Throwable => () }
        }))
    exitHooks.add(p)
    ()
  }
}
