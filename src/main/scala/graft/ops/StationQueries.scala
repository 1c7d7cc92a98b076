package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Query-service semantics of the reference (services/query/main.py),
  * mapped onto `events` (user_id ≈ station_id, value ≈ measurement,
  * ts ≈ timestamp).
  *
  * Scale notes: raw/agg are key+range filters — both predicates reach the
  * parquet scan (PushedFilters), so at 100 TB with time-partitioned data
  * these are partition-pruned point lookups, exactly the access path the
  * reference gets from its (station_id, timestamp DESC) index
  * (migrations/db.sql:22). timeseries and latest aggregate over one hash
  * shuffle on the key.
  */
object StationQueries {

  /** GET /weather/{station}?start&end — raw rows in a time range, newest
    * first (query/main.py:200-212).
    */
  def rawStation(events: DataFrame, userId: Long, start: String, end: String): DataFrame =
    events
      .filter(col("user_id") === userId &&
        col("ts") >= tsLit(start) && col("ts") <= tsLit(end))
      .orderBy(col("ts").desc)

  /** The endpoint's DEFAULT form — start/end omitted: ALL rows for the
    * station, newest first (query/main.py:180-212 appends the BETWEEN
    * clause only when both bounds are given). Still a pruned point
    * lookup at scale: the key predicate reaches the scan, and output
    * size is one station's history, not the corpus.
    */
  def rawStationAll(events: DataFrame, userId: Long): DataFrame =
    events
      .filter(col("user_id") === userId)
      .orderBy(col("ts").desc)

  /** Partition-pruning bound for events stored date-partitioned
    * (Sources.writePartitioned on `dt` = to_date(ts)): constrains the
    * PARTITION column from the same literal bounds the endpoint
    * receives, so the scan lists only in-range `dt=` directories — the
    * Spark analog of the reference's TimescaleDB chunk exclusion
    * (migrations/db.sql:5-22). Compose under [[rawStation]] /
    * [[timeseriesStation]]; their `ts` predicates stay as row-level
    * pushed filters within the surviving partitions. CI-locked in
    * PartitionPruningSpec.
    */
  def dtBounded(events: DataFrame, start: String, end: String): DataFrame =
    events.filter(
      col("dt") >= to_date(tsLit(start)) && col("dt") <= to_date(tsLit(end)))

  /** GET /weather/aggregate/{station} — avg/min/max of the measurement
    * over a range (query/main.py:262-272). Averages rounded at the output
    * boundary (double-sum order nondeterminism).
    */
  def aggStation(events: DataFrame, userId: Long, start: String, end: String): DataFrame =
    events
      .filter(col("user_id") === userId &&
        col("ts") >= tsLit(start) && col("ts") <= tsLit(end))
      .groupBy(col("user_id"))
      .agg(
        round(avg(col("value")), 4).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("n"))

  /** GET /weather/timeseries/{station} — time_bucket(interval, ts)
    * aggregation (query/main.py:342-354). `window(ts, interval).start`
    * is the epoch-aligned equivalent of TimescaleDB's time_bucket for
    * arbitrary intervals ('1 hour', '30 minutes', ...). Computed for
    * every key (the reference filters to one station; the engine form
    * is the full keyed rollup — one shuffle).
    */
  def timeseriesBucket(events: DataFrame, interval: String = "1 hour"): DataFrame =
    events
      .groupBy(col("user_id"),
        window(col("ts"), interval).getField("start").as("bucket"))
      .agg(
        round(avg(col("value")), 4).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("reading_count"))
      .orderBy(col("user_id"), col("bucket"))

  /** GET /weather/timeseries/{station_id}?start_time&end_time&interval —
    * the reference's actual endpoint shape (query/main.py:318-354):
    * station-filtered, range-bounded, caller-chosen bucket interval.
    * This is the hot path at 100 TB: both the key predicate and the time
    * bounds are plain column comparisons against the scan, so with
    * time-partitioned storage this is a partition-pruned point lookup
    * (the Spark analog of the reference's (station_id, timestamp DESC)
    * index access) followed by a near-empty aggregation.
    */
  def timeseriesStation(events: DataFrame, userId: Long, start: String,
                        end: String, interval: String = "1 hour"): DataFrame =
    events
      .filter(col("user_id") === userId &&
        col("ts") >= tsLit(start) && col("ts") <= tsLit(end))
      .groupBy(col("user_id"),
        window(col("ts"), interval).getField("start").as("bucket"))
      .agg(
        round(avg(col("value")), 4).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        count(lit(1)).as("reading_count"))
      .orderBy(col("bucket"))

  /** Gap-filled station timeseries with last-observation-carried-forward —
    * the TimescaleDB `time_bucket_gapfill(...) + locf(...)` shape the
    * reference's hypertable layer provides over the same endpoint as
    * [[timeseriesStation]] (query/main.py:318-354, migrations/db.sql:5-22).
    * Missing buckets materialize with reading_count=0 and the previous
    * bucket's average carried forward.
    *
    * Scale: the aggregation is the partition-pruned point lookup of
    * [[timeseriesStation]]; the generated bucket series and the LOCF
    * window are bounded by the REQUESTED RANGE's bucket count
    * (range/interval rows), not by data size, so the single-partition
    * fill stage is O(buckets) at any corpus scale.
    */
  def gapfillLocf(events: DataFrame, userId: Long, start: String,
                  end: String, interval: String = "1 hour"): DataFrame = {
    val agg = events
      .filter(col("user_id") === userId &&
        col("ts") >= tsLit(start) && col("ts") <= tsLit(end))
      .groupBy(window(col("ts"), interval).getField("start").as("bucket"))
      .agg(
        round(avg(col("value")), 4).as("avg_value"),
        count(lit(1)).as("reading_count"))
    val series = events.sparkSession.range(1)
      .select(explode(sequence(tsLit(start), tsLit(end),
        expr(s"interval $interval"))).as("bucket"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series
      .join(agg, Seq("bucket"), "left")
      .withColumn("reading_count", coalesce(col("reading_count"), lit(0L)))
      .withColumn("filled_value", last(col("avg_value"), ignoreNulls = true).over(w))
      .withColumn("is_gap", col("reading_count") === 0L)
      .select(col("bucket"), col("reading_count"), col("avg_value"),
        col("filled_value"), col("is_gap"))
      .orderBy(col("bucket"))
  }

  /** Per-station rolling mean over a trailing time interval — a RANGE
    * window frame on the event-time axis (the continuous cousin of the
    * bucketed timeseries; TimescaleDB exposes the same thing as a window
    * over the hypertable). Frame boundaries are computed on floored
    * epoch seconds so rows in the same second are frame peers.
    *
    * Scale: one hash shuffle on the key, then a streaming in-partition
    * range frame — no buffering beyond the trailing window, the shape
    * that survives 100× (per-key history length is what matters, and the
    * frame evicts as it slides).
    */
  def movingAvg(events: DataFrame, windowSec: Long = 3600): DataFrame = {
    // NTZ has no direct long cast; session tz is UTC so the timestamp
    // round-trip is the identity and floor(double-epoch) = whole seconds
    val w = Window.partitionBy(col("user_id"))
      .orderBy(floor(col("ts").cast("timestamp").cast("double")).cast("long"))
      .rangeBetween(-windowSec, 0)
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"),
        round(avg(col("value")).over(w), 4).as("mov_avg"),
        count(lit(1)).over(w).as("n_in_window"))
    // no trailing global sort: output is corpus-sized and the engine's
    // contract (like the correctness gate) is set-oriented — a total
    // order here would add a full range-Exchange for nothing at scale
  }

  /** Sliding-window keyed timeseries: overlapping 1-hour windows every
    * 30 minutes (`window(ts, duration, slide)`) — each event lands in
    * duration/slide windows via Spark's Expand, then one keyed shuffle.
    * The streaming-capable form of a smoothed rollup (the same operator
    * Structured Streaming uses for sliding aggregations).
    */
  def slidingWindow(events: DataFrame, duration: String = "1 hour",
                    slide: String = "30 minutes"): DataFrame =
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .groupBy(col("user_id"),
        window(col("ts"), duration, slide).getField("start").as("w_start"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("value")), 4).as("avg_value"))
      .orderBy(col("user_id"), col("w_start"))

  /** Sensor-outage detection: per station, reporting gaps longer than
    * `thresholdSec` between consecutive readings — the monitoring query
    * a telemetry pipeline runs against exactly this table (which
    * stations went dark, when, for how long). One keyed lag window
    * (same single shuffle as [[movingAvg]], same epoch-seconds frame
    * discipline); output is one row per gap, so it shrinks with data
    * health, not data size.
    */
  def gapDetect(events: DataFrame, thresholdSec: Long = 21600): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_sec",
        (floor(col("ts").cast("timestamp").cast("double")) -
          floor(col("prev_ts").cast("timestamp").cast("double"))).cast("long"))
      .filter(col("gap_sec") > thresholdSec)
      .select(col("user_id"), col("prev_ts").as("gap_start"),
        col("ts").as("gap_end"), col("gap_sec"))
  }

  /** get_latest_weather_data — DISTINCT ON (station_id) … ORDER BY
    * station_id, timestamp DESC (migrations/db.sql:79-90): newest row per
    * key, tie-broken by event_id. row_number over a keyed window = one
    * shuffle; AQE handles key skew.
    */
  def latestPerKey(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .orderBy(col("user_id"))
  }
}
