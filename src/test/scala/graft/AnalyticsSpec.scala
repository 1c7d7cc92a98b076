package graft

import graft.ops.{Analytics, StationQueries}
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
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

  test("q1 aggregates are exact decimals and groups are complete") {
    val out = Analytics.q1PricingSummary(Tables.lineitem(spark, sfDir)).collect()
    assert(out.length === 6) // 3 returnflags × 2 linestatus
    assert(out.forall(_.getAs[java.math.BigDecimal]("sum_qty").signum > 0))
  }

  test("top-k per group returns at most k rows per brand, descending") {
    val out = Analytics.topKPerGroup(Tables.part(spark, sfDir), 3)
    val perBrand = out.groupBy("p_brand").count().select("count").as[Long].collect()
    assert(perBrand.forall(_ <= 3))
    val firstBrand = out.filter(col("p_brand") === "Brand#1")
      .select("p_retailprice").as[Double].collect()
    assert(firstBrand.sorted.reverse sameElements firstBrand)
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
}
