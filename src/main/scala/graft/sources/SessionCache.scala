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

/** A serving cache keyed by (session identity, corpus dir) holding a
  * SMALL BOUNDED set of per-session entries per corpus dir.
  *
  * The r9 design held AT MOST ONE entry per corpus (newest session
  * wins), which the r10 advisor showed thrashes when two LIVE sessions
  * alternately serve the same corpus: each call rebuilds and unpersists
  * a cached frame the other session is still using mid-query (correct —
  * Spark recomputes — but the cache stops caching). Here eviction is
  * liveness-first:
  *
  *  - an entry whose session's SparkContext is STOPPED is evicted on
  *    the next touch of its corpus (its pinned frames are dead weight
  *    in the shared JVM — this is the bound the r9 advisor asked for:
  *    session churn replaces entries instead of growing the map,
  *    because a cached DataFrame strongly references its session, so
  *    waiting for GC while holding its frames can never collect
  *    anything);
  *  - among LIVE sessions, up to [[SessionCache.MaxLivePerCorpus]]
  *    entries coexist (multi-session serving of one corpus no longer
  *    thrashes); past the cap the LEAST-RECENTLY-SERVED live entry is
  *    evicted. The cap bounds pinned-block growth when a pathological
  *    caller churns many concurrently-live sessions over one corpus.
  *
  * Holding the session strongly inside an entry adds no pinning beyond
  * what the cached value V already does (V's frames reference their
  * session); it exists so eviction can ask `isStopped`.
  *
  * Values are built inside `compute`, so concurrent BUILDERS for the
  * same corpus serialize on the map bin exactly like the previous
  * `computeIfAbsent` protocol; HITS return through a lock-free fast
  * path and never wait behind another session's build.
  */
final class SessionCache[V](onEvict: V => Unit = (_: V) => ()) {
  import SessionCache.MaxLivePerCorpus

  /** Per-corpus entries, most-recently-served LAST. */
  private val m = new ConcurrentHashMap[String, List[(Long, SparkSession, V)]]()

  private def safeEvict(v: V): Unit =
    try onEvict(v) catch { case scala.util.control.NonFatal(_) => () }

  private def dead(s: SparkSession): Boolean =
    try s.sparkContext.isStopped catch { case scala.util.control.NonFatal(_) => true }

  def getOrBuild(spark: SparkSession, corpusDir: String)(build: => V): V = {
    val sid = SessionKeys.idOf(spark)
    // Lock-free HIT fast path: a cached serve must never block behind
    // another session's minutes-long layout build in compute's bin lock
    // (the exact multi-session scenario this cache exists for). The
    // LRU move-to-back is attempted with one CAS and skipped under
    // contention — order then just reflects the last uncontended
    // touch, which is all the small cap needs. Dead-session eviction
    // stays on the compute path (next miss), where it was anyway.
    val cur = m.get(corpusDir)
    if (cur != null) cur.find(_._1 == sid) match {
      case Some(hit) if !dead(hit._2) =>
        val reordered = cur.filterNot(_._1 == sid) :+ hit
        if (reordered != cur) m.replace(corpusDir, cur, reordered)
        return hit._3
      case _ => ()
    }
    var out: Option[V] = None
    m.compute(corpusDir, (_, old) => {
      val prev = if (old == null) Nil else old
      val (deadE, live) = prev.partition(e => dead(e._2))
      deadE.foreach(e => safeEvict(e._3))
      live.find(_._1 == sid) match {
        case Some(hit) =>
          out = Some(hit._3)
          // move-to-back = most recently served
          live.filterNot(_._1 == sid) :+ hit
        case None =>
          val v = build
          out = Some(v)
          val appended = live :+ ((sid, spark, v))
          val over = appended.length - MaxLivePerCorpus
          if (over > 0) {
            val (evict, keep) = appended.splitAt(over)
            evict.foreach(e => safeEvict(e._3))
            keep
          } else appended
      }
    })
    out.get
  }

  /** Drop (and evict) every entry for `corpusDir` — used when a serve
    * detects its on-disk layout vanished (e.g. a vacuum raced a
    * long-lived server), so the next call rebuilds instead of failing
    * forever off a dead cached frame.
    */
  def invalidate(corpusDir: String): Unit = {
    val old = m.remove(corpusDir)
    if (old != null) old.foreach(e => safeEvict(e._3))
  }
}

object SessionCache {
  /** Max concurrently-live sessions cached per corpus dir. Small on
    * purpose: the supported pattern is a handful of serving sessions
    * over a shared SparkContext, not unbounded session churn.
    */
  val MaxLivePerCorpus = 4
}
