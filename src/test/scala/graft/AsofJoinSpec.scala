package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, Long, String, Double)*) =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  test("asof picks the most recent right row at or before each left ts") {
    val e = ev(
      (1L, "2024-01-01 09:00:00", 1L, "signup", 100.0),
      (2L, "2024-01-01 10:00:00", 1L, "purchase", 5.0),   // → 100.0
      (3L, "2024-01-01 11:00:00", 1L, "signup", 200.0),
      (4L, "2024-01-01 11:00:00", 1L, "purchase", 6.0),   // simultaneous → 200.0
      (5L, "2024-01-01 12:00:00", 1L, "purchase", 7.0),   // → 200.0
      (6L, "2024-01-01 08:00:00", 2L, "purchase", 8.0)    // no prior signup → null
    )
    val out = AsofJoin.purchaseSignupAsof(e)
      .select("event_id", "asof_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out === Map(
      2L -> Some(100.0), 4L -> Some(200.0), 5L -> Some(200.0), 6L -> None))
  }

  test("asof: null keys never match and duplicate right (key,ts) keeps the last arrival") {
    val rows = Seq(
      (1L, Some("2024-01-01 09:00:00"), Option(1L), "signup", 100.0),
      (2L, Some("2024-01-01 09:00:00"), Option(1L), "signup", 150.0), // same (key,ts), higher event_id wins
      (3L, Some("2024-01-01 10:00:00"), Option(1L), "purchase", 5.0), // → 150.0
      (4L, Some("2024-01-01 09:30:00"), None, "signup", 999.0),       // null-key signup: invisible
      (5L, Some("2024-01-01 10:00:00"), None, "purchase", 6.0)        // null-key purchase: no match
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val out = AsofJoin.purchaseSignupAsof(rows)
      .select("event_id", "asof_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out === Map(3L -> Some(150.0), 5L -> None))
  }

  test("forward asof picks the earliest right row at or after each left ts") {
    val e = ev(
      (1L, "2024-01-01 09:00:00", 1L, "signup", 100.0),
      (2L, "2024-01-01 10:00:00", 1L, "purchase", 5.0),   // → next signup 200.0
      (3L, "2024-01-01 11:00:00", 1L, "signup", 200.0),
      (4L, "2024-01-01 11:00:00", 1L, "purchase", 6.0),   // simultaneous → 200.0
      (5L, "2024-01-01 12:00:00", 1L, "purchase", 7.0),   // nothing after → null
      (6L, "2024-01-01 08:00:00", 2L, "purchase", 8.0)    // user 2 has no signup → null
    )
    val out = AsofJoin.purchaseSignupAsofForward(e)
      .select("event_id", "asof_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out === Map(
      2L -> Some(200.0), 4L -> Some(200.0), 5L -> None, 6L -> None))
  }

  test("tolerance nulls matches farther away than the interval") {
    val e = ev(
      (1L, "2024-01-01 09:00:00", 1L, "signup", 100.0),
      (2L, "2024-01-01 10:00:00", 1L, "purchase", 5.0),   // 1h old → kept
      (3L, "2024-01-05 10:00:00", 1L, "purchase", 6.0))   // 4d old → nulled at 2d tol
    val out = AsofJoin.purchaseSignupAsofTolerance(e)
      .select("event_id", "asof_value", "asof_ts").collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(out(2L)._1 === Some(100.0))
    assert(out(3L) === (None, None)) // both payload AND matched ts null out
  }

  test("asof with an empty right side annotates every left row with nulls") {
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "purchase", 5.0),
      (2L, "2024-01-01 11:00:00", 2L, "purchase", 6.0))
    val out = AsofJoin.purchaseSignupAsof(e) // no signup rows at all
    assert(out.count() === 2)
    assert(out.filter(col("asof_value").isNotNull || col("asof_ts").isNotNull).count() === 0)
  }

  test("asof on real events: every non-null match is the max signup ts <= purchase ts") {
    val e = Tables.events(spark, sfDir)
    val out = AsofJoin.purchaseSignupAsof(e).filter(col("asof_ts").isNotNull)
    val bad = out.alias("o").join(
      e.filter(col("event_type") === "signup").alias("s"), "user_id")
      .filter(col("s.ts") <= col("o.ts") && col("s.ts") > col("o.asof_ts"))
    assert(bad.count() === 0)
  }
}
