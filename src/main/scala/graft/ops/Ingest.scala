package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingestion-pipeline semantics of the reference consumer/collector,
  * re-expressed as declarative DataFrame transforms.
  *
  * Reference behavior (cited from /root/reference):
  *  - services/consumer/main.py:142-161 — field-range validation
  *    (temperature/humidity/wind_speed bounds); invalid records go to a
  *    dead-letter queue with an error reason
  *    (services/collector/main.py:133-146).
  *  - services/consumer/main.py:327-344 — in-memory dedup keyed
  *    (station_id, timestamp), keep-LAST (newest message overwrites).
  *  - services/consumer/main.py:229-245 — DB upsert ON CONFLICT
  *    (station_id,timestamp) DO UPDATE (keep-last again).
  *  - services/consumer/main.py:434-443 — /stats counters (processed,
  *    duplicates).
  *
  * Mapped onto the `events` table: key = (user_id, ts), measurement =
  * value, arrival order = event_id (monotone producer sequence).
  *
  * Scale notes: validation and DLQ-split are narrow (no shuffle — pure
  * filter/project, pushed into the parquet scan). Dedup is one hash
  * shuffle on the dedup key; stats are a single partial-aggregated
  * groupBy. At 100 TB none of these materialize more than one shuffle.
  */
object Ingest {

  /** Validity predicate — the analog of WeatherData's field validators
    * (consumer/main.py:142-161): range rule on the measurement and a
    * domain rule on the event type.
    */
  val MaxValue = 300.0
  val ValidTypes: Seq[String] = Seq("click", "view", "purchase", "signup")

  private def validCond =
    col("user_id").isNotNull && col("ts").isNotNull &&
      col("value") >= 0.0 && col("value") <= MaxValue &&
      col("event_type").isin(ValidTypes: _*)

  /** Valid split: rows passing all validation rules (→ main topic). */
  def validate(events: DataFrame): DataFrame =
    events.filter(validCond)

  /** Invalid split: rows failing validation, tagged with the first
    * failing rule — the DLQ payload (collector/main.py:133-146 wraps the
    * original message with an error string).
    *
    * NULL-safe: a NULL value/event_type makes `validCond` NULL, which a
    * bare `filter(!validCond)` drops — the row would vanish from BOTH
    * splits. `coalesce(_, true)` routes NULL-predicate rows here, so
    * validate ∪ dlq is an exact partition of the input (the reference's
    * pydantic validator likewise rejects missing fields —
    * consumer/main.py:142-161).
    */
  def dlq(events: DataFrame): DataFrame =
    events
      .filter(coalesce(!validCond, lit(true)))
      .withColumn(
        "reason",
        when(col("user_id").isNull || col("ts").isNull, "missing_key")
          .when(col("value").isNull || col("event_type").isNull, "missing_field")
          .when(col("value") < 0.0 || col("value") > MaxValue, "value_out_of_range")
          .when(!col("event_type").isin(ValidTypes: _*), "bad_event_type")
          .otherwise("unknown"))

  /** DLQ replay with repair — the operational loop that drains a dead
    * letter queue: apply the known-safe fixes (out-of-range values
    * clamp to the sensor's physical bounds — the standard treatment for
    * spike/underflow readings), revalidate, and split into recovered
    * rows (re-enter the pipeline, tagged with their original reason and
    * a repair marker) vs dead rows (structurally unfixable: missing
    * keys/fields, unknown types — back to the queue/human). Narrow
    * per-row work on the DLQ subset only; composes with [[pipeline]]
    * for the re-ingest.
    */
  def dlqReplay(events: DataFrame): DataFrame = {
    val repaired = dlq(events)
      .withColumn("value",
        when(col("reason") === "value_out_of_range",
          least(greatest(col("value"), lit(0.0)), lit(MaxValue)))
          .otherwise(col("value")))
      .withColumn("repaired", (col("reason") === "value_out_of_range").cast("boolean"))
    repaired
      .withColumn("recovered", coalesce(validCond, lit(false)).cast("boolean"))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props"), col("reason"), col("repaired"),
        col("recovered"))
  }

  /** Keep-last dedup on (user_id, ts): the ON CONFLICT DO UPDATE upsert
    * (consumer/main.py:229-245). "Last" = highest event_id (arrival
    * order). One shuffle on the dedup key; the window never needs a full
    * sort of the partition beyond the key group.
    */
  def dedupKeepLast(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
    events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Consumer /stats analog, per user: processed / valid / invalid /
    * duplicate counts (consumer/main.py:434-443). Single groupBy with
    * map-side partial aggregation.
    */
  def batchStats(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(validCond, 1L).otherwise(0L)).as("n_valid"),
        sum(when(validCond, 0L).otherwise(1L)).as("n_invalid"),
        (count(lit(1)) - countDistinct(col("ts"))).as("n_dup_keys"))

  /** End-to-end pipeline: validate → dedup keep-last. This is the
    * observable result of the whole reference ingest path (what lands in
    * the `weather` table).
    */
  def pipeline(events: DataFrame): DataFrame =
    dedupKeepLast(validate(events))

  /** Semi-structured payload extraction: parse the JSON `props` column
    * into typed columns (the collector accepts JSON payloads —
    * collector/main.py:151-171 — and a real pipeline projects them to
    * columns at ingest so downstream queries are columnar). Uses
    * `from_json` with an explicit schema — single pass, codegen'd,
    * no schema inference over the data.
    */
  def extractProps(events: DataFrame): DataFrame =
    events
      .withColumn("__p", from_json(col("props"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.LongType)))))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("__p.k").as("prop_k"))
      .orderBy(col("event_id"))

  /** Typed variant of the pipeline over Dataset[Event] — same plan (the
    * typed filter still uses Column predicates, so pushdown and codegen
    * are identical; the Encoder only governs the API surface).
    */
  def pipelineTyped(events: org.apache.spark.sql.Dataset[graft.model.Event])
      : org.apache.spark.sql.Dataset[graft.model.Event] = {
    implicit val enc: org.apache.spark.sql.Encoder[graft.model.Event] =
      org.apache.spark.sql.Encoders.product[graft.model.Event]
    pipeline(events.toDF()).as[graft.model.Event]
  }
}
