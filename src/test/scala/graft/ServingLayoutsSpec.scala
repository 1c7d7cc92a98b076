package graft

import graft.sources.{ServingLayouts, Sources}
import graft.ops.DedupServing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Lifecycle contract of the stable serving-layout homes (round 9's
  * hygiene ask): deterministic per-(kind, corpus-version) paths,
  * complete-marker discipline, age-based vacuum, cross-catalog
  * re-registration of bucketed layouts, and the DedupServing
  * session-validation fix (a new session reloads the stored layout
  * instead of serving frames bound to the builder session).
  */
class ServingLayoutsSpec extends SparkSpec {
  import spark.implicits._

  test("dirFor is stable per (kind, corpus) and moves when the corpus dir's mtime changes") {
    val corpus = Files.createTempDirectory("graft_sl_corpus").toString
    val a = ServingLayouts.dirFor("t", corpus)
    val b = ServingLayouts.dirFor("t", corpus)
    assert(a === b, "same corpus version must map to the same layout home")
    assert(a != ServingLayouts.dirFor("other", corpus))
    // simulate an in-place regeneration: the corpus dir's mtime moves
    Files.setLastModifiedTime(Paths.get(corpus),
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(Paths.get(corpus)).toMillis + 60000))
    val c = ServingLayouts.dirFor("t", corpus)
    assert(c != a, "a regenerated corpus must not reuse the old content's layout")
  }

  test("complete-marker discipline: absent until marked, stripped by invalidate") {
    val corpus = Files.createTempDirectory("graft_sl_corpus2").toString
    val dir = ServingLayouts.dirFor("m", corpus)
    assert(!ServingLayouts.isComplete(dir), "a fresh (or half-built) layout is not reusable")
    ServingLayouts.markComplete(dir)
    assert(ServingLayouts.isComplete(dir))
    ServingLayouts.invalidate(dir)
    assert(!ServingLayouts.isComplete(dir), "a rebuild-in-place must first strip the marker")
  }

  test("vacuum reclaims only layouts idle past the retention window") {
    val corpusOld = Files.createTempDirectory("graft_sl_old").toString
    val corpusHot = Files.createTempDirectory("graft_sl_hot").toString
    val oldDir = ServingLayouts.dirFor("vac", corpusOld)
    val hotDir = ServingLayouts.dirFor("vac", corpusHot)
    Files.write(Paths.get(oldDir, "data"), "x".getBytes)
    Files.write(Paths.get(hotDir, "data"), "y".getBytes)
    ServingLayouts.markComplete(oldDir)
    ServingLayouts.markComplete(hotDir)
    // age the idle layout's marker well past retention; touch the hot
    // one. Retention sits far above any live suite's marker age (the
    // layout root is shared by concurrently-running suites — only dirs
    // this test aged can cross the threshold).
    Files.setLastModifiedTime(Paths.get(oldDir, "_layout_complete"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000000))
    ServingLayouts.touch(hotDir)
    val n = ServingLayouts.vacuum(maxAgeMs = 5000000)
    assert(n >= 1)
    assert(!Files.exists(Paths.get(oldDir)), "idle layout reclaimed")
    assert(Files.exists(Paths.get(hotDir, "data")), "recently-served layout survives")
  }

  test("registerBucketedTable: a fresh catalog reuses a prior process's bucketed files with no exchange on the bucket side") {
    val df = (1L to 2000L).map(i => (i, s"v$i")).toDF("k", "v")
    val path = Files.createTempDirectory("graft_sl_bucketed").toString + "/t"
    Sources.writeBucketed(df, "graft_sl_reg_src", path, "k", 4)
    // simulate a new JVM: the files survive, the catalog entry does not
    spark.sql("DROP TABLE graft_sl_reg_src")
    Sources.registerBucketedTable(spark, "graft_sl_reg2", path, "k", 4)
    val reread = spark.table("graft_sl_reg2")
    assert(reread.count() === 2000)
    assert(reread.agg(sum("k")).head.getLong(0) === (1L to 2000L).sum)
    // the re-registered table must still join WITHOUT shuffling its side
    val probe = (1L to 50L).map(i => (i, i * 10)).toDF("k", "p")
      .repartition(4, col("k"))
    val joined = reread.join(probe.hint("shuffle_hash"), Seq("k"))
    val plan = joined.queryExecution.executedPlan
    def exchanges(p: org.apache.spark.sql.execution.SparkPlan): Seq[ShuffleExchangeExec] =
      p.collect { case e: ShuffleExchangeExec => e }
    val scanSide = plan.collectLeaves().map(_.toString).mkString("\n")
    assert(scanSide.contains("graft_sl_reg2"))
    // exactly the probe side may exchange; the bucketed scan side must not
    val joinedExchanges = exchanges(plan)
    assert(joinedExchanges.size <= 1,
      s"bucketed side must not re-shuffle:\n${plan.toString.take(4000)}")
    assert(joined.count() === 50)
  }

  test("stamp includes table subdirs: rewriting INSIDE a table dir moves the layout home") {
    val corpus = Files.createTempDirectory("graft_sl_sub").toString
    val table = Files.createDirectory(Paths.get(corpus, "documents.parquet"))
    val a = ServingLayouts.dirFor("t", corpus)
    // an append/compaction that only touches files INSIDE the table dir
    // bumps the SUBDIR's mtime, not the corpus dir's — must still move
    Files.setLastModifiedTime(table,
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(table).toMillis + 60000))
    val b = ServingLayouts.dirFor("t", corpus)
    assert(b != a, "a table rewritten in place must not be served from the old index")
  }

  test("an unreadable corpus dir fails loudly instead of sharing a defaulted layout") {
    intercept[IllegalArgumentException] {
      ServingLayouts.dirFor("t", "/nonexistent/graft/corpus/path")
    }
  }

  test("acquire: racing builders publish exactly one complete layout; the loser serves the winner's") {
    val corpus = Files.createTempDirectory("graft_sl_race").toString
    val started = new java.util.concurrent.CountDownLatch(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        val dir = ServingLayouts.acquire("race", corpus) { stage =>
          started.countDown()
          started.await() // both builders in flight simultaneously
          Files.write(Paths.get(stage, "data"), s"builder$i".getBytes)
          Thread.sleep(50)
          Files.write(Paths.get(stage, "owner"), s"builder$i".getBytes)
        }
        results.add(dir)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(30000))
    val dirs = results.toArray(Array.empty[String])
    assert(dirs.length === 2)
    dirs.foreach { d =>
      assert(ServingLayouts.isComplete(d), s"served dir must be complete: $d")
      // never a mixed build: data and owner must come from the SAME builder
      val data = new String(Files.readAllBytes(Paths.get(d, "data")))
      val owner = new String(Files.readAllBytes(Paths.get(d, "owner")))
      assert(data === owner, s"mixed layout served: data=$data owner=$owner")
    }
  }

  test("acquire claims incomplete debris by rename-aside, never delete-in-place") {
    // pre-protocol debris: a non-empty stable dir with NO complete marker
    // (a crashed build-in-place from before the staged protocol). r10
    // advisor: the old fallback DELETED the stable path after a
    // completeness check, destroying any winner whose atomic publish
    // landed in the check→delete window. The new path renames the slot
    // aside (atomic claim), re-inspects what it claimed, and publishes.
    val corpus = Files.createTempDirectory("graft_sl_debris").toString
    val stable = ServingLayouts.dirFor("dbr", corpus)
    Files.write(Paths.get(stable, "junk"), "half-built".getBytes)
    val served = ServingLayouts.acquire("dbr", corpus) { stage =>
      Files.write(Paths.get(stage, "data"), "fresh".getBytes)
    }
    assert(served === stable, "the claimed slot must hold the fresh publish")
    assert(ServingLayouts.isComplete(served))
    assert(Files.exists(Paths.get(served, "data")), "fresh layout served")
    assert(!Files.exists(Paths.get(served, "junk")), "debris content must not leak into the layout")
    // the claimed debris was recognized as junk and discarded
    val leftovers = {
      val s = Files.list(Paths.get(stable).getParent)
      try s.toArray.toSeq.map(_.toString).filter(_.contains(".debris-"))
      finally s.close()
    }
    assert(leftovers.isEmpty, s"claimed debris must be discarded: $leftovers")
  }

  test("acquire restores (not destroys) a complete layout it claimed from the stable slot") {
    // simulate the advisor's race outcome: by the time this builder's
    // fallback runs, the stable path holds a WINNER'S complete layout.
    // acquire must serve it intact — the old delete-in-place destroyed it.
    val corpus = Files.createTempDirectory("graft_sl_winner").toString
    val stable = ServingLayouts.dirFor("win", corpus)
    Files.write(Paths.get(stable, "data"), "winner".getBytes)
    ServingLayouts.markComplete(stable)
    val served = ServingLayouts.acquire("win", corpus) { _ =>
      fail("a complete published layout must be reused, not rebuilt")
    }
    assert(served === stable)
    assert(new String(Files.readAllBytes(Paths.get(served, "data"))) === "winner",
      "the winner's published layout must survive intact")
  }

  test("acquire reuses a completed layout without re-running the build") {
    val corpus = Files.createTempDirectory("graft_sl_reuse").toString
    var builds = 0
    val a = ServingLayouts.acquire("ru", corpus) { stage =>
      builds += 1; Files.write(Paths.get(stage, "data"), "x".getBytes)
    }
    val b = ServingLayouts.acquire("ru", corpus) { _ =>
      builds += 1; fail("a complete layout must be reused, not rebuilt")
    }
    assert(a === b)
    assert(builds === 1)
  }

  test("DedupServing touches the marker on EVERY serve and rebuilds if the layout is vacuumed under it") {
    // ISOLATED corpus copy: the vacuum-under-server simulation must
    // reclaim only THIS test's layout — suites run in parallel in one
    // JVM and share the per-user layout root, so a global
    // vacuum(maxAgeMs = -1) here can yank a layout another suite is
    // mid-serve on (seen as a flaky build-count/FileNotFound failure
    // in the r11 full-suite run)
    val corpus = Files.createTempDirectory("graft_sl_vac_corpus").toString
    Tables.documents(spark, sfDir).write.parquet(s"$corpus/documents.parquet")
    val first = DedupServing.dedupIncremental(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    val dir = ServingLayouts.dirFor("dedup", corpus)
    // simulate a long-idle marker, then a cache-hit serve: liveness must refresh
    Files.setLastModifiedTime(Paths.get(dir, "_layout_complete"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 10000000))
    DedupServing.dedupIncremental(spark, corpus).count()
    val age = System.currentTimeMillis() -
      Files.getLastModifiedTime(Paths.get(dir, "_layout_complete")).toMillis
    assert(age < 5000000, "a cache-hit serve must refresh the vacuum-liveness marker")
    // simulate a vacuum racing the live server: exactly this layout's
    // files and marker vanish (what vacuum would do to an aged dir)
    def rmTree(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.toArray.toSeq.foreach(c => rmTree(c.asInstanceOf[java.nio.file.Path]))
        finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rmTree(Paths.get(dir))
    assert(!Files.exists(Paths.get(dir)), "vacuum reclaimed the layout")
    val rebuilt = DedupServing.dedupIncremental(spark, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(rebuilt === first, "a vacuumed layout must be rebuilt, not served from dead frames")
  }

  test("DedupServing: a NEW session reloads the stored layout and serves identical survivors") {
    val first = DedupServing.dedupIncremental(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    val s2 = spark.newSession()
    val second = DedupServing.dedupIncremental(s2, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(second === first,
      "reloaded (re-registered) layout must serve the same survivors as the builder session")
  }
}
