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
    // age the idle layout's marker well past retention; touch the hot one
    Files.setLastModifiedTime(Paths.get(oldDir, "_layout_complete"),
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 1000000))
    ServingLayouts.touch(hotDir)
    val n = ServingLayouts.vacuum(maxAgeMs = 500000)
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
