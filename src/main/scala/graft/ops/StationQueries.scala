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
