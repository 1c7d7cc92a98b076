package graft

import graft.ops.{Analytics, StationQueries}
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {

  test("hllRollup: merged daily sketches = direct weekly sketch, ±5% of exact, layout-stable") {
    val ev = Tables.events(spark, sfDir)
    val out = Analytics.hllRollup(ev).cache()
    // register-lossless union: merging the stored DAILY sketches must
    // give the IDENTICAL estimate as sketching the week's users directly
    val direct = ev
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type"),
        date_trunc("week", to_date(col("ts"))).cast("date").as("week_start"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("direct_users"),
        countDistinct(col("user_id")).as("exact_users"))
    val j = out.join(direct, Seq("event_type", "week_start")).cache()
    assert(j.filter(col("approx_users") =!= col("direct_users")).count() === 0)
    // accuracy floor: every weekly estimate within 5% of exact
    assert(j.filter(
      abs(col("approx_users") - col("exact_users")) >
        col("exact_users") * 0.05).count() === 0)
    // no RNG anywhere: the rollup is a pure function of the data
    assert(Analytics.hllRollup(ev.repartition(13)).except(out).count() === 0)
    j.unpersist(); out.unpersist()
  }
  import spark.implicits._

  test("sessionize splits on >30min gaps per user") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 7L, "click", 1.0, "{}"),
      (2L, "2024-01-01 10:10:00", 7L, "click", 1.0, "{}"),
      (3L, "2024-01-01 10:41:00", 7L, "click", 1.0, "{}"),  // 31 min gap → new session
      (4L, "2024-01-01 09:00:00", 8L, "view", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val s = Analytics.sessionize(ev)
      .select("user_id", "session_id", "n_events").as[(Long, Long, Long)].collect().sorted
    assert(s === Array((7L, 1L, 2L), (7L, 2L, 1L), (8L, 1L, 1L)))
  }

  test("native session_window sessionization equals the lag+cumsum form") {
    val ev = Tables.events(spark, sfDir)
    val a = Analytics.sessionize(ev).collect().map(_.toSeq)
    val b = Analytics.sessionizeNative(ev).collect().map(_.toSeq)
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq)
  }

  test("q1 aggregates are positive and groups are complete") {
    val out = Analytics.q1PricingSummary(Tables.lineitem(spark, sfDir)).collect()
    assert(out.length === 6) // 3 returnflags × 2 linestatus
    assert(out.forall(_.getAs[Double]("sum_qty") > 0))
  }

  test("top-k per group returns at most k rows per brand, descending") {
    val out = Analytics.topKPerGroup(Tables.part(spark, sfDir), 3)
    val perBrand = out.groupBy("p_brand").count().select("count").as[Long].collect()
    assert(perBrand.forall(_ <= 3))
    val firstBrand = out.filter(col("p_brand") === "Brand#1")
      .select("p_retailprice").as[Double].collect()
    assert(firstBrand.sorted.reverse sameElements firstBrand)
  }

  test("bucketized range join equals the naive interval join") {
    val ev = Tables.events(spark, sfDir)
    val got = graft.ops.Analytics.rangeJoinActivity(ev).collect().map(_.toSeq)
    // naive: direct non-equi join (BroadcastNestedLoop) over same windows
    val hours = ev.groupBy(date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    val hot = hours.withColumn("rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("h"))))
      .filter(col("rn") <= 20)
      .select((col("h") - expr("INTERVAL 30 MINUTE")).as("w_start"),
        (col("h") + expr("INTERVAL 90 MINUTE")).as("w_end"))
    val naive = hot.join(ev, col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .groupBy("w_start", "w_end")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
      .orderBy("w_start").collect().map(_.toSeq)
    assert(got.toSeq === naive.toSeq)
  }

  test("timeseries_station pushes station + range predicates to the scan") {
    // sf0.001 has users 0..14; bounds cover the whole month
    val ev = Tables.events(spark, sfDir)
    val ts = StationQueries.timeseriesStation(ev, 7L,
      "2024-01-01 00:00:00", "2024-02-01 00:00:00", "30 minutes")
    val plan = ts.queryExecution.executedPlan.toString
    // the station predicate must reach the parquet scan (the ts bounds
    // can't here: Tables.events derives ts from the nanos long, so the
    // range predicate sits just above the scan; on natively-µs storage
    // it pushes too)
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("EqualTo(user_id,7)"), plan.take(1200))
    val rows = ts.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("user_id") === 7L))
    // buckets are 30-minute aligned
    assert(rows.forall { r =>
      val b = r.getAs[java.time.LocalDateTime]("bucket")
      (b.getMinute % 30 === 0) && b.getSecond === 0
    })
    // equals the unparameterized rollup restricted to the same station
    val full = StationQueries.timeseriesBucket(ev, "30 minutes")
      .filter(col("user_id") === 7L)
      .withColumnRenamed("bucket", "b").collect().map(_.toSeq)
    assert(rows.map(_.toSeq).toSeq === full.toSeq)
  }

  test("latest per key yields exactly one newest row per user") {
    val ev = Tables.events(spark, sfDir)
    val latest = StationQueries.latestPerKey(ev).cache()
    assert(latest.count() === ev.select("user_id").distinct().count())
    // the kept ts is the max ts for that user
    val chk = latest.alias("l")
      .join(ev.groupBy("user_id").agg(max("ts").as("mx")), "user_id")
      .filter(col("ts") =!= col("mx")).count()
    assert(chk === 0)
    latest.unpersist()
  }

  test("funnel counts only users whose steps occur strictly in order") {
    import spark.implicits._
    val ev = Seq(
      // u1 completes the whole funnel in order
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 11:00:00", "click"),
      (1L, "2024-01-01 12:00:00", "purchase"),
      // u2 skips click: purchase without a prior click must not count
      (2L, "2024-01-02 10:00:00", "view"),
      (2L, "2024-01-02 11:00:00", "purchase"),
      // u3 clicks BEFORE viewing: ordering matters
      (3L, "2024-01-03 09:00:00", "click"),
      (3L, "2024-01-03 10:00:00", "view"))
      .toDF("user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = graft.ops.Analytics.funnel(ev)
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(out === Array((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("funnel on a corpus with no first-step events reports zero at every step") {
    import spark.implicits._
    val ev = Seq((1L, "2024-01-01 10:00:00", "click"))
      .toDF("user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = graft.ops.Analytics.funnel(ev)
      .as[(Int, String, Long)].collect().sortBy(_._1)
    // one row per step even when empty — dashboards rely on the full shape
    assert(out.map(t => (t._1, t._3)).toSeq === Seq((1, 0L), (2, 0L), (3, 0L)))
  }

  test("retention cohorts count distinct users per (cohort week, offset)") {
    import spark.implicits._
    val ev = Seq(
      // u1: first event Mon Jan 1 (week 0), active again in week 2
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-16 10:00:00", "click"),
      // u2: same cohort week, active only in week 0
      (2L, "2024-01-03 10:00:00", "view"),
      (2L, "2024-01-04 10:00:00", "view"))
      .toDF("user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = graft.ops.Analytics.retentionCohorts(ev)
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Long, Long)].collect().toSet
    assert(out === Set(
      ("2024-01-01", 0L, 2L),   // both users active in their first week
      ("2024-01-01", 2L, 1L)))  // only u1 returns two weeks later
  }

  test("valueHistogram bins tile [min,max], counts sum to non-null rows") {
    val ev = Tables.events(spark, sfDir)
    val out = Analytics.valueHistogram(ev).orderBy("bin")
      .as[(Long, Double, Double, Long)].collect()
    assert(out.nonEmpty && out.map(_._1).forall(b => b >= 0 && b < 20))
    assert(out.map(_._4).sum === ev.filter(col("value").isNotNull).count())
    // edges are contiguous: bin b's hi equals bin b+1's lo when adjacent
    out.sliding(2).foreach {
      case Array((b1, _, hi1, _), (b2, lo2, _, _)) if b2 == b1 + 1 =>
        assert(math.abs(hi1 - lo2) < 1e-9, s"gap between bin $b1 and $b2")
      case _ =>
    }
    // extremes bins are populated: min lands in bin 0, max in bin 19
    assert(out.head._1 === 0L && out.last._1 === 19L)
  }

  test("dowHourProfile covers the week grid and conserves event counts") {
    val ev = Tables.events(spark, sfDir)
    val out = Analytics.dowHourProfile(ev)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.forall { case (d, h, _, _) => d >= 1 && d <= 7 && h >= 0 && h <= 23 })
    assert(out.length <= 168)
    assert(out.map(_._3).sum === ev.filter(col("ts").isNotNull).count())
    // ISO numbering: a known Monday lands in dow=1
    val monday = Seq((1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val m = Analytics.dowHourProfile(monday).as[(Long, Long, Long, Double)].head()
    assert(m._1 === 1L && m._2 === 10L)
  }

  test("valueHistogram degenerate case: constant values land in bin 0") {
    val ev = Seq((1L, "2024-01-01 10:00:00", 1L, "click", 5.0, "{}"),
      (2L, "2024-01-01 11:00:00", 2L, "view", 5.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val out = Analytics.valueHistogram(ev).as[(Long, Double, Double, Long)].collect()
    assert(out.toSeq === Seq((0L, 5.0, 5.0, 2L)))
  }
}
