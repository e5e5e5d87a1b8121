package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session hygiene for long-lived harness JVMs.
  *
  * The driver runs the entire query suite in ONE SparkSession; an operator
  * that persists an intermediate frame and never unpersists it leaks a
  * MEMORY_AND_DISK cache for the JVM's lifetime. Across 50+ queries those
  * leaks accumulate and strangle whatever runs last (round 2's wiki-ETL
  * regression: 64.6k lines/s in a fresh JVM vs 5.5k after the full suite).
  *
  * Operators therefore persist through [[stage]], and harness loops
  * (Bench, Verify) call [[releaseAll]] between queries. `releaseAll` also
  * sweeps `sparkContext.getPersistentRDDs` as a safety net, so even a
  * persist that bypassed the registry is dropped.
  *
  * Temp directories created for planted-duplicate streaming sources and
  * file sinks register via [[newTempDir]]; they are deleted on JVM exit,
  * and callers that know a dir is dead sooner call [[deleteNow]].
  */
object Caches {

  private val staged = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val tempDirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  // thread-local scope stack: frames staged inside a [[scoped]] block are
  // tracked per scope instead of globally, so the scope's cleanup cannot
  // unpersist a CONCURRENT query's staged caches (a foreachBatch loop
  // calling the global release() would strip a bench or second stream
  // running in the same session of its caches mid-flight)
  private val scopes = new ThreadLocal[java.util.ArrayDeque[java.util.ArrayList[DataFrame]]] {
    override def initialValue() = new java.util.ArrayDeque[java.util.ArrayList[DataFrame]]()
  }

  /** Persist `df` and register it for release: with the calling thread
    * inside a [[scoped]] block, at that scope's exit; otherwise at the
    * next harness sweep.
    */
  def stage(df: DataFrame,
            level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    val s = scopes.get()
    if (!s.isEmpty) s.peek().add(p) else staged.add(p)
    p
  }

  /** Run `body` with a thread-local staging scope: every frame staged BY
    * THIS THREAD inside `body` is unpersisted when it completes — and
    * only those. The per-micro-batch cleanup a streaming foreachBatch
    * loop needs (its staging is batch-lived) without touching other
    * queries' caches. Scopes nest; frames staged by other threads keep
    * their global harness-sweep registration.
    */
  def scoped[T](body: => T): T = {
    val s = scopes.get()
    s.push(new java.util.ArrayList[DataFrame]())
    try body
    finally {
      s.pop().forEach { df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
    }
  }

  /** Unpersist every staged frame. Safe to call with queries in flight
    * only for frames whose consuming action has finished (the harness
    * calls this between queries, after each action returns).
    */
  def release(): Unit = {
    var df = staged.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () }
      df = staged.poll()
    }
  }

  /** Release staged frames AND sweep the whole session: SQL cache plus any
    * persisted RDD that bypassed the registry. Harness loops call this
    * between queries; nothing in this engine relies on a cache surviving
    * across two top-level queries.
    *
    * CONTRACT: results must be FULLY MATERIALIZED before this sweep. The
    * sweep also drops localCheckpoint blocks (e.g. the frame returned by
    * `Dedup.connectedComponents`), and a localCheckpointed frame whose
    * blocks are gone is unrecoverable by design — its lineage was
    * truncated. They are deliberately NOT skipped here: skipping would
    * let iterative operators' blocks accumulate across a harness loop and
    * defeat the `leakedRddCount` == 0 assertion the benches rely on.
    */
  def releaseAll(spark: SparkSession): Unit = {
    release()
    try spark.sharedState.cacheManager.clearCache()
    catch { case _: Throwable => () }
    spark.sparkContext.getPersistentRDDs.values.foreach { rdd =>
      try rdd.unpersist(blocking = false)
      catch { case _: Throwable => () }
    }
  }

  /** Number of RDD blocks still persisted — the leak-check assertion. */
  def leakedRddCount(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size

  /** Create a temp directory cleaned up at JVM exit (or via deleteNow). */
  def newTempDir(prefix: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    tempDirs.add(p)
    p
  }

  /** Recursively delete a directory now (idempotent, error-tolerant). */
  def deleteNow(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    try {
      if (Files.exists(p)) {
        val s = Files.walk(p)
        try s.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => { try Files.delete(f) catch { case _: Throwable => () } })
        finally s.close()
      }
    } catch { case _: Throwable => () }
    tempDirs.remove(p)
  }

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    var p = tempDirs.poll()
    while (p != null) { deleteNow(p); p = tempDirs.poll() }
  }, "graft-tempdir-cleanup"))
}
