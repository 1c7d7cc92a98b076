package graft

import graft.sources.SessionCache

/** The bounded multi-session serving cache (r10 advisor: the one-entry
  * last-requester-wins design thrashed when two LIVE sessions
  * alternately served one corpus — every call rebuilt and unpersisted a
  * frame the other session was still using). The contract now: live
  * sessions coexist up to a small cap (LRU past it), dead-session
  * entries are evicted on touch, invalidate drops everything.
  */
class SessionCacheSpec extends SparkSpec {

  test("two live sessions alternately serving one corpus build once each (no thrash)") {
    var builds = 0
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val cache = new SessionCache[String](v => evicted += v)
    val s2 = spark.newSession()
    for (_ <- 1 to 4) {
      assert(cache.getOrBuild(spark, "/corpus/a") { builds += 1; "v1" } === "v1")
      assert(cache.getOrBuild(s2, "/corpus/a") { builds += 1; "v2" } === "v2")
    }
    assert(builds === 2, "alternating live sessions must HIT, not rebuild")
    assert(evicted.isEmpty, "no live entry may be evicted under the cap")
  }

  test("past the live cap the least-recently-served entry is evicted (and only it)") {
    var builds = 0
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val cache = new SessionCache[String](v => evicted += v)
    val sessions = (0 to SessionCache.MaxLivePerCorpus).map(_ => spark.newSession())
    sessions.zipWithIndex.foreach { case (s, i) =>
      cache.getOrBuild(s, "/corpus/b") { builds += 1; s"v$i" }
    }
    assert(builds === SessionCache.MaxLivePerCorpus + 1)
    assert(evicted.toSeq === Seq("v0"), "exactly the oldest entry is evicted")
    // the evicted session rebuilds; a cached one still hits
    cache.getOrBuild(sessions.last, "/corpus/b") { builds += 1; "never" }
    assert(builds === SessionCache.MaxLivePerCorpus + 1, "most-recent entry still cached")
    cache.getOrBuild(sessions.head, "/corpus/b") { builds += 1; "v0b" }
    assert(builds === SessionCache.MaxLivePerCorpus + 2, "evicted session must rebuild")
  }

  test("serving an entry refreshes its LRU position") {
    var builds = 0
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val cache = new SessionCache[String](v => evicted += v)
    val sessions = (0 until SessionCache.MaxLivePerCorpus).map(_ => spark.newSession())
    sessions.zipWithIndex.foreach { case (s, i) =>
      cache.getOrBuild(s, "/corpus/c") { builds += 1; s"v$i" }
    }
    // touch the oldest, then overflow: the SECOND-oldest must go
    cache.getOrBuild(sessions.head, "/corpus/c") { fail("must hit"); "x" }
    cache.getOrBuild(spark.newSession(), "/corpus/c") { builds += 1; "new" }
    assert(evicted.toSeq === Seq("v1"),
      "refreshing v0's recency must shift eviction to v1")
  }

  test("invalidate evicts every entry for the corpus") {
    var builds = 0
    val evicted = scala.collection.mutable.ArrayBuffer.empty[String]
    val cache = new SessionCache[String](v => evicted += v)
    val s2 = spark.newSession()
    cache.getOrBuild(spark, "/corpus/d") { builds += 1; "a" }
    cache.getOrBuild(s2, "/corpus/d") { builds += 1; "b" }
    cache.invalidate("/corpus/d")
    assert(evicted.toSet === Set("a", "b"))
    cache.getOrBuild(spark, "/corpus/d") { builds += 1; "a2" }
    assert(builds === 3, "invalidated corpus rebuilds")
  }

  test("corpus dirs are independent") {
    var builds = 0
    val cache = new SessionCache[String]()
    cache.getOrBuild(spark, "/corpus/e1") { builds += 1; "x" }
    cache.getOrBuild(spark, "/corpus/e2") { builds += 1; "y" }
    assert(cache.getOrBuild(spark, "/corpus/e1") { builds += 1; "z" } === "x")
    assert(builds === 2)
  }

  test("a cached hit never blocks behind another session's in-flight build") {
    val cache = new SessionCache[String]()
    val s2 = spark.newSession()
    cache.getOrBuild(spark, "/corpus/h") { "mine" }
    val buildStarted = new java.util.concurrent.CountDownLatch(1)
    val releaseBuild = new java.util.concurrent.CountDownLatch(1)
    val builder = new Thread(() =>
      cache.getOrBuild(s2, "/corpus/h") {
        buildStarted.countDown()
        // a layout build takes minutes; hold compute's bin lock
        releaseBuild.await(30, java.util.concurrent.TimeUnit.SECONDS)
        "theirs"
      })
    builder.start()
    assert(buildStarted.await(10, java.util.concurrent.TimeUnit.SECONDS),
      "builder thread never entered its build")
    // the hit must return while the other session's build holds the lock
    val t0 = System.nanoTime()
    val hit = cache.getOrBuild(spark, "/corpus/h")(sys.error("hit must not rebuild"))
    val hitMs = (System.nanoTime() - t0) / 1e6
    releaseBuild.countDown()
    builder.join(30000)
    assert(hit === "mine")
    assert(hitMs < 5000, f"hit blocked ${hitMs}%.0f ms behind a concurrent build")
    assert(cache.getOrBuild(s2, "/corpus/h")(sys.error("s2 must be cached")) === "theirs")
  }
}
