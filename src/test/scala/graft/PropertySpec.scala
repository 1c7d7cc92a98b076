package graft

import graft.ops.{Ingest, TextDedup}
import graft.functions.Hashes
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}

/** Property-based invariants over ScalaCheck-generated datasets
  * (sampled deterministically — no scalatest/scalacheck bridge in the
  * offline cache, so generators are driven manually).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seedBase: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default,
      rng.Seed(seedBase + i)))

  private val eventGen = for {
    id <- Gen.choose(0L, 999L)
    user <- Gen.choose(0L, 5L)
    minute <- Gen.choose(0, 59)
    tpe <- Gen.oneOf("click", "view", "purchase", "signup", "error")
    value <- Gen.choose(0.0, 400.0)
  } yield (id, f"2024-01-01 10:$minute%02d:00", user, tpe, value, "{}")

  private def toDf(rows: Seq[(Long, String, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  test("dedupKeepLast is idempotent and key-unique (5 generated datasets)") {
    (1 to 5).foreach { trial =>
      val df = toDf(samples(eventGen, 60, 1000L * trial))
      val once = Ingest.dedupKeepLast(df)
      val twice = Ingest.dedupKeepLast(once)
      assert(once.count() === twice.count())
      assert(once.groupBy("user_id", "ts").count()
        .filter(col("count") > 1).count() === 0)
    }
  }

  test("validate ∪ dlq partitions the input exactly (5 generated datasets)") {
    (1 to 5).foreach { trial =>
      val df = toDf(samples(eventGen, 50, 7000L * trial))
      assert(Ingest.validate(df).count() + Ingest.dlq(df).count() === df.count())
    }
  }

  // NULL-bearing variant: value / event_type / user_id each nullable.
  // A NULL value or event_type makes the validity predicate itself NULL
  // — the regression this pins is rows vanishing from BOTH splits.
  private val nullableEventGen = for {
    id <- Gen.choose(0L, 999L)
    user <- Gen.option(Gen.choose(0L, 5L))
    minute <- Gen.choose(0, 59)
    tpe <- Gen.option(Gen.oneOf("click", "view", "purchase", "signup", "error"))
    value <- Gen.option(Gen.choose(0.0, 400.0))
  } yield (id, f"2024-01-01 10:$minute%02d:00", user, tpe, value, "{}")

  private def toDfNullable(
      rows: Seq[(Long, String, Option[Long], Option[String], Option[Double], String)]) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))

  test("validate ∪ dlq is an exact partition with NULLs present (5 datasets)") {
    (1 to 5).foreach { trial =>
      // re-id rows uniquely so the per-id set algebra below is exact
      val rows = samples(nullableEventGen, 50, 11000L * trial)
        .zipWithIndex.map { case (r, i) => r.copy(_1 = i.toLong) }
      // the generator must actually produce the NULL-predicate case
      assert(rows.exists(r => r._4.isEmpty || r._5.isEmpty))
      val df = toDfNullable(rows)
      val valid = Ingest.validate(df).select("event_id")
      val dead = Ingest.dlq(df).select("event_id")
      assert(valid.count() + dead.count() === df.count())
      assert(valid.intersect(dead).count() === 0)
      assert(valid.union(dead).exceptAll(df.select("event_id")).count() === 0)
      // NULL value/event_type rows land in the DLQ with a specific reason
      assert(Ingest.dlq(df)
        .filter(col("user_id").isNotNull &&
          (col("value").isNull || col("event_type").isNull) &&
          col("reason") =!= "missing_field").count() === 0)
    }
  }

  private val textGen =
    Gen.listOfN(12, Gen.oneOf("the", "fast", "data", "spark", "query",
      "row", "join", "scan", "sort", "hash")).map(_.mkString(" "))

  test("snapshot upsert converges to one row per key for ARBITRARY partition values (3 datasets)") {
    // the r7 Hive-escape fix, property-tested: whatever string lands in
    // the partition column — spaces, '=', ':', '/', '%', '#', unicode,
    // empty/null — an upsert of every key must produce exactly one row
    // per key with the updated ord, and a second identical upsert must
    // be a no-op on row count (idempotent merge, no silent duplicates)
    import graft.sources.SnapshotTable
    // no non-ASCII sample: the sandbox JVM runs a POSIX/ASCII locale, so
    // Spark's OWN partition writer throws InvalidPathException on é etc.
    // before any graft code runs — an environment bound, not an escape gap
    val trickyGen = Gen.oneOf(
      Gen.const(null: String), Gen.const(""),
      Gen.oneOf("a b", "x=y", "p:q", "m/n", "50%", "t#1", "a\tb"),
      Gen.alphaNumStr.map(_.take(8)))
    (1 to 3).foreach { trial =>
      val parts = samples(trickyGen, 6, 31000L * trial).distinct
      val rows = parts.zipWithIndex.map { case (p, i) => (i.toLong, Option(p), 1L) }
      val t = java.nio.file.Files.createTempDirectory("graft_prop_snap").toString + "/t"
      SnapshotTable.create(spark, t,
        rows.toDF("k", "part_col", "ord"), Seq("part_col"))
      val updates = rows.map { case (k, p, _) => (k, p, 9L) }
        .toDF("k", "part_col", "ord")
      SnapshotTable.upsertKeepLast(spark, t, updates, Seq("k"), "ord")
      val got = SnapshotTable.read(spark, t).select("k", "ord")
        .as[(Long, Long)].collect().sorted
      assert(got === rows.indices.map(i => (i.toLong, 9L)),
        s"trial $trial parts=${parts.mkString("|")}: got ${got.toSeq}")
      // idempotence: replaying the same updates changes nothing
      SnapshotTable.upsertKeepLast(spark, t, updates, Seq("k"), "ord")
      assert(SnapshotTable.read(spark, t).count() === rows.length.toLong)
    }
  }

  test("ngram jaccard post-filter stays in [0.5, 1]; simhash is deterministic") {
    (1 to 3).foreach { trial =>
      val docs = samples(textGen, 8, 31L * trial).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = TextDedup.ngramJaccard(docs).select("jaccard").as[Double].collect()
      assert(pairs.forall(j => j >= 0.5 && j <= 1.0))
      val h1 = docs.select(Hashes.simhash64(split(col("text"), " "))).as[Long].collect()
      val h2 = docs.select(Hashes.simhash64(split(col("text"), " "))).as[Long].collect()
      assert(h1.toSeq === h2.toSeq)
    }
  }

  test("funnel step counts are monotonically non-increasing (5 datasets)") {
    (1 to 5).foreach { trial =>
      val ev = toDf(samples(eventGen, 300, 41L * trial))
      val steps = graft.ops.Analytics.funnel(ev)
        .select("step", "n_users").as[(Int, Long)].collect().sortBy(_._1)
      assert(steps.map(_._1).toSeq === Seq(1, 2, 3))
      // a user must complete step i before counting for step i+1
      assert(steps.sliding(2).forall { case Array(a, b) => b._2 <= a._2 },
        steps.mkString(", "))
      assert(steps.forall(_._2 >= 0))
    }
  }

  test("retention offset-0 users per cohort equal the cohort size (5 datasets)") {
    (1 to 5).foreach { trial =>
      val ev = toDf(samples(eventGen, 300, 43L * trial))
      val ret = graft.ops.Analytics.retentionCohorts(ev)
        .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
        .as[(String, Long, Long)].collect()
      // every user is active in their own first week, so offset 0 counts
      // the full cohort — and no offset can exceed it
      val cohorts = ev.filter(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy("user_id")
        .agg(to_date(date_trunc("week", min(col("ts")))).cast("string").as("cw"))
        .groupBy("cw").count().as[(String, Long)].collect().toMap
      val zero = ret.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
      assert(zero === cohorts, s"offset-0 $zero vs cohort sizes $cohorts")
      assert(ret.forall { case (cw, _, n) => n <= cohorts(cw) })
      assert(ret.forall(_._2 >= 0))
    }
  }

  test("no source file is git-binary (control bytes make diffs invisible)") {
    // A raw NUL in a string literal once made a correctness-critical
    // source file invisible to diff/grep/merge tooling (git shows
    // 'Bin N -> M bytes'). Control characters other than \t \n \r in
    // source are always a mistake — write them as escapes.
    import scala.jdk.CollectionConverters._
    val bad = java.nio.file.Files.walk(java.nio.file.Paths.get("src")).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filter { p =>
        java.nio.file.Files.readAllBytes(p).exists(b =>
          (b >= 0 && b < 0x20) && b != '\t' && b != '\n' && b != '\r')
      }
      .map(_.toString).toList
    assert(bad.isEmpty, s"source files containing raw control bytes: $bad")
  }
}
