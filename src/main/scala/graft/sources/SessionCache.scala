package graft.sources

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession

/** Collision-free, GC-friendly identity for SparkSessions. The r9
  * serving caches keyed entries on `identityHashCode(spark)`, which the
  * advisor flagged twice over: identity hashes can collide (silently
  * re-introducing the dead-frame hazard the keying exists to prevent),
  * and string keys strongly pin nothing yet let entries for discarded
  * sessions accumulate forever. Here every session gets a unique id
  * from a monotonically increasing counter, held in a WeakHashMap so
  * the registry itself never keeps a discarded session alive.
  */
object SessionKeys {
  private val ids = new java.util.WeakHashMap[SparkSession, java.lang.Long]()
  private val next = new AtomicLong(0L)

  def idOf(spark: SparkSession): Long = ids.synchronized {
    val cur = ids.get(spark)
    if (cur != null) cur.longValue
    else { val id = next.incrementAndGet(); ids.put(spark, id); id }
  }
}

/** A serving cache keyed by (session identity, corpus dir) that holds
  * AT MOST ONE entry per corpus dir — the newest session wins and the
  * superseded entry is evicted through `onEvict` (where e.g. a pinned
  * `.cache()` frame gets unpersisted before its blocks become
  * unreachable garbage in the shared SparkContext). This is the bound
  * the r9 advisor asked for: session churn in a long-lived JVM (the
  * `newSession` serving scenario) replaces entries instead of growing
  * the map, because a cached DataFrame strongly references its session
  * — so any design that waits for the session to be GC'd while still
  * holding its frames can never collect anything.
  *
  * Values are built inside `compute`, so concurrent callers for the
  * same corpus serialize on the map bin exactly like the previous
  * `computeIfAbsent` protocol.
  */
final class SessionCache[V](onEvict: V => Unit = (_: V) => ()) {
  private val m = new ConcurrentHashMap[String, (Long, V)]()

  private def safeEvict(v: V): Unit =
    try onEvict(v) catch { case scala.util.control.NonFatal(_) => () }

  def getOrBuild(spark: SparkSession, corpusDir: String)(build: => V): V = {
    val sid = SessionKeys.idOf(spark)
    val cur = m.get(corpusDir)
    if (cur != null && cur._1 == sid) cur._2
    else m.compute(corpusDir, (_, old) => {
      if (old != null && old._1 == sid) old
      else {
        if (old != null) safeEvict(old._2)
        (sid, build)
      }
    })._2
  }

  /** Drop (and evict) the entry for `corpusDir` — used when a serve
    * detects its on-disk layout vanished (e.g. a vacuum raced a
    * long-lived server), so the next call rebuilds instead of failing
    * forever off a dead cached frame.
    */
  def invalidate(corpusDir: String): Unit = {
    val old = m.remove(corpusDir)
    if (old != null) safeEvict(old._2)
  }
}
