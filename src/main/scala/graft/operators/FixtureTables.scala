package graft.operators

import org.apache.spark.sql.SparkSession

/** ONE implementation of the repo's memoized TEMP-TABLE fixture
  * lifecycle (the manifest-backed tables the declared faces build from
  * the parquet fixtures): an entry per (session, data dir), built once
  * into a fresh temp directory, a racing builder's losing copy deleted,
  * a JVM shutdown hook as the crash backstop, and [[release]] as the
  * documented teardown every module's `releaseCaches()` calls — the
  * [[PlanMemo]] discipline applied to on-disk tables instead of
  * persisted frames. `T` is the builder's handle (path + whatever
  * bounds/versions the queries need); its PATH must be `pathOf(t)` so
  * release and the loser-delete can find the directory. */
private[operators] final class FixtureTables[T](prefix: String)(
    pathOf: T => String) {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), T]()

  /** Memoized fixture for (session, dir); `build` receives the fresh
    * temp directory path. Runs OUTSIDE the map (the PlanMemo
    * compute-then-putIfAbsent rule): two concurrent first callers both
    * build, the loser deletes its copy and returns the winner's. */
  def apply(s: SparkSession, dir: String)(build: String => T): T = {
    val key = (s, dir)
    Option(m.get(key)).getOrElse {
      val path = java.nio.file.Files.createTempDirectory(prefix).toString
      // releaseCaches() is the documented teardown; the hook covers a
      // crashed or lifecycle-skipping driver so temp tables never leak
      // past the JVM (deleteQuietly: no-op when already released)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(path)): Unit))
      val built = build(path)
      Option(m.putIfAbsent(key, built)).map { prev =>
        delete(s, pathOf(built)); prev // racing builder lost: drop dup
      }.getOrElse(built)
    }
  }

  private def delete(s: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    try { p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(p, true); () }
    catch { case _: java.io.IOException => () }
  }

  /** Drop every fixture directory and forget it (drain by key — the
    * [[PlanMemo.release]] rule: whichever side removes the mapping
    * owns the delete). Like PlanMemo, release is a DRAIN, not a
    * close: a build racing the shutdown release can re-insert a live
    * entry (freed by the next release, backstopped by the shutdown
    * hook) — never forgotten-but-undeleted. */
  def release(): Unit = {
    val keys = m.keySet().iterator()
    while (keys.hasNext) {
      val k = keys.next()
      val v = m.remove(k)
      if (v != null) delete(k._1, pathOf(v))
    }
  }
}
