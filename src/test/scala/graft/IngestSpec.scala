package graft

import graft.ops.Ingest
import org.apache.spark.sql.functions._

class IngestSpec extends SparkSpec {
  import spark.implicits._

  private def syntheticEvents = Seq(
    // (event_id, ts, user_id, event_type, value, props)
    (1L, "2024-01-01 10:00:00", 1L, "click", 10.0, "{}"),
    (2L, "2024-01-01 10:00:00", 1L, "click", 20.0, "{}"),   // dup key, later arrival
    (3L, "2024-01-01 11:00:00", 1L, "error", 10.0, "{}"),   // invalid type
    (4L, "2024-01-01 12:00:00", 2L, "view", 400.0, "{}"),   // value out of range
    (5L, "2024-01-01 13:00:00", 2L, "purchase", 5.0, "{}")
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    .withColumn("ts", col("ts").cast("timestamp_ntz"))

  test("validate splits on range and domain rules") {
    assert(Ingest.validate(syntheticEvents).select("event_id")
      .as[Long].collect().sorted === Array(1L, 2L, 5L))
  }

  test("dlq tags each invalid row with the failing rule") {
    val reasons = Ingest.dlq(syntheticEvents)
      .select("event_id", "reason").as[(Long, String)].collect().toMap
    assert(reasons === Map(3L -> "bad_event_type", 4L -> "value_out_of_range"))
  }

  test("dedup keeps the LAST arrival per (user_id, ts) — upsert semantics") {
    val out = Ingest.dedupKeepLast(syntheticEvents)
    val kept = out.filter(col("user_id") === 1 && col("event_type") === "click")
      .select("event_id", "value").as[(Long, Double)].collect()
    assert(kept === Array((2L, 20.0)))
    assert(out.count() === 4) // 5 rows, one duplicate key collapsed
  }

  test("pipeline = validate then dedup") {
    assert(Ingest.pipeline(syntheticEvents).select("event_id")
      .as[Long].collect().sorted === Array(2L, 5L))
  }

  test("batch stats counts valid/invalid/dup per user") {
    val st = Ingest.batchStats(syntheticEvents)
      .select("user_id", "n_events", "n_valid", "n_invalid", "n_dup_keys")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(st === Array((1L, 3L, 2L, 1L, 1L), (2L, 2L, 1L, 1L, 0L)))
  }

  test("typed pipeline round-trips through Dataset[Event] with identical results") {
    import graft.model.Event
    implicit val enc = org.apache.spark.sql.Encoders.product[Event]
    val ds = Tables.events(spark, sfDir).as[Event]
    val typed = Ingest.pipelineTyped(ds).collect().map(_.event_id).sorted
    val untyped = Ingest.pipeline(Tables.events(spark, sfDir))
      .select("event_id").as[Long].collect().sorted
    assert(typed.toSeq === untyped.toSeq)
    // typed access compiles against fields, e.g.:
    assert(Ingest.pipelineTyped(ds).head().event_type.nonEmpty)
  }

  test("pipeline over real events is non-empty and key-unique") {
    val out = Ingest.pipeline(Tables.events(spark, sfDir)).cache()
    assert(out.count() > 0)
    assert(out.groupBy("user_id", "ts").count().filter(col("count") > 1).count() === 0)
    out.unpersist()
  }

  test("DLQ replay recovers exactly the clamp-fixable rows") {
    val ev = Tables.events(spark, sfDir)
    val replay = Ingest.dlqReplay(ev).cache()
    // replay covers the whole DLQ, nothing more
    assert(replay.count() === Ingest.dlq(ev).count())
    // recovered ⇔ repaired: value clamping is the only safe fix, so
    // exactly the out-of-range rows come back (their other fields were
    // valid by reason precedence)
    assert(replay.filter(col("recovered") =!= col("repaired")).count() === 0)
    // every recovered row now passes the validator verbatim
    val revalidated = Ingest.validate(
      replay.filter(col("recovered"))
        .select("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(revalidated.count() === replay.filter(col("recovered")).count())
    // clamped values sit on the violated bound
    assert(replay.filter(col("repaired") &&
      (col("value") =!= 0.0) && (col("value") =!= 300.0)).count() === 0)
    // dead rows keep their original values untouched
    val dead = replay.filter(!col("recovered") && col("value").isNotNull)
    val origDead = Ingest.dlq(ev)
      .filter(col("reason") =!= "value_out_of_range" && col("value").isNotNull)
    assert(dead.count() === origDead.count())
    replay.unpersist()
  }
}
