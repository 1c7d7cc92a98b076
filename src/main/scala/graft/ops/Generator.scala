package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spark-native form of the reference Generator service
  * (services/generator/main.py:71-83, 130-237): synthesize station
  * telemetry with a configurable station count and a deterministic
  * duplicate-injection rate (every 5th record repeats an earlier one —
  * main.py:157 — to exercise dedup downstream).
  *
  * Distributed design: `spark.range` partitions the id space across the
  * cluster; every column derives deterministically from the id via hash
  * mixing (no driver-side RNG state, no collect) — at 100 TB the
  * generator is embarrassingly parallel and reproducible from (seed,
  * id), which is exactly how the driver's own test tables behave.
  */
object Generator {

  /** Deterministic uniform double in [0,1) from (seed, source id, tag) —
    * keyed on __src so an injected duplicate replicates its source
    * record's measurements exactly.
    */
  private def u(tag: Int, seed: Long) =
    (pmod(xxhash64(col("__src"), lit(tag), lit(seed)), lit(1L << 52)).cast("double")
      / lit((1L << 52).toDouble))

  /** Generate `n` telemetry events for `stations` stations starting at
    * `startTs`, one record per `intervalSec` per station slot, with
    * ~`duplicatePercent`% of records duplicating an earlier record
    * (same station+timestamp+measurements — the reference's duplicate
    * test pattern).
    */
  def events(spark: SparkSession, n: Long, stations: Int = 3,
             startTs: String = "2024-01-01 00:00:00", intervalSec: Int = 60,
             duplicatePercent: Int = 20, seed: Long = 42L): DataFrame = {
    val period = math.max(1, 100 / math.max(1, duplicatePercent))
    val base = spark.range(n).toDF("id")
      .withColumn("__dup", pmod(col("id"), lit(period.toLong)) === (period - 1) && col("id") >= 1)
      // duplicate the immediately preceding record — which is never itself
      // a duplicate (the reference buffers only non-dup records to copy:
      // generator/main.py:173-176)
      .withColumn("__src", when(col("__dup"), col("id") - 1).otherwise(col("id")))
      .withColumn("station_id",
        concat(lit("station"), (pmod(xxhash64(col("__src"), lit(1), lit(seed)),
          lit(stations.toLong)) + 1).cast("string")))
      .withColumn("ts", (lit(startTs).cast("timestamp_ntz") +
        make_dt_interval(lit(0), lit(0), lit(0),
          (col("__src") * intervalSec).cast("double"))))
      .withColumn("temperature", round(lit(-10.0) + u(2, seed) * 45.0, 1))
      .withColumn("humidity", round(u(3, seed) * 100.0, 1))
      .withColumn("wind_speed", round(u(4, seed) * 30.0, 1))
    base.select(col("id").as("record_id"), col("station_id"), col("ts"),
      col("temperature"), col("humidity"), col("wind_speed"),
      col("__dup").as("is_injected_dup"))
  }

  /** Generator /status analog: totals + duplicate counts
    * (generator/main.py:318-347).
    */
  def status(generated: DataFrame): DataFrame =
    generated.agg(
      count(lit(1)).as("total_generated"),
      sum(when(col("is_injected_dup"), 1L).otherwise(0L)).as("total_duplicates"),
      countDistinct(col("station_id")).as("n_stations"))
}
