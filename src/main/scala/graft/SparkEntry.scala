package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory each
  * entry maps to. Every query here has a matching DuckDB oracle in
  * [[oracleSql]] unless the operator is not ANSI-SQL-expressible
  * (approximate/LSH ops), which get the driver's rows-only check.
  */
object SparkEntry {

  /** Flagship: the reference's whole ingest path (validate → DLQ-split →
    * keep-last dedup) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Ingest.pipeline(Tables.events(spark, "/root/testdata/sf0.001"))

  // Constants shared by the Spark queries and their oracles.
  private val RawUser = 42L
  private val RawStart = "2024-01-05 00:00:00"
  private val RawEnd = "2024-01-20 00:00:00"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── A. ingestion pipeline (SURVEY §2A) ─────────────────────────────
    "ingest_validate" -> ((s, d) => Ingest.validate(Tables.events(s, d))),
    "ingest_dlq" -> ((s, d) => Ingest.dlq(Tables.events(s, d))),
    "ingest_dedup" -> ((s, d) => Ingest.dedupKeepLast(Tables.events(s, d))),
    "ingest_batch_stats" -> ((s, d) => Ingest.batchStats(Tables.events(s, d))),
    "ingest_pipeline" -> ((s, d) => Ingest.pipeline(Tables.events(s, d))),
    // ── B. query service (SURVEY §2B) ──────────────────────────────────
    "raw_station" -> ((s, d) =>
      StationQueries.rawStation(Tables.events(s, d), RawUser, RawStart, RawEnd)),
    "agg_station" -> ((s, d) =>
      StationQueries.aggStation(Tables.events(s, d), RawUser, RawStart, RawEnd)),
    "timeseries_bucket" -> ((s, d) =>
      StationQueries.timeseriesBucket(Tables.events(s, d))),
    "latest_per_key" -> ((s, d) =>
      StationQueries.latestPerKey(Tables.events(s, d))),
    // ── C. analytics (SURVEY §2C) ──────────────────────────────────────
    "q1_agg" -> ((s, d) => Analytics.q1PricingSummary(Tables.lineitem(s, d))),
    "q3_shipping" -> ((s, d) => Analytics.q3Shipping(s,
      Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q5_local_supplier" -> ((s, d) => Analytics.q5LocalSupplier(
      Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
      Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d))),
    "top_k_per_group" -> ((s, d) => Analytics.topKPerGroup(Tables.part(s, d))),
    "events_sessionize" -> ((s, d) => Analytics.sessionize(Tables.events(s, d))),
    "rollup_events" -> ((s, d) => Analytics.rollupEvents(Tables.events(s, d)))
  )

  // Validation predicate fragments reused across the A-section oracles —
  // MUST stay in sync with graft.ops.Ingest.
  private val validSql =
    "user_id IS NOT NULL AND ts IS NOT NULL AND value >= 0 AND value <= 300 " +
      "AND event_type IN ('click','view','purchase','signup')"
  private val eventCols = "event_id, ts, user_id, event_type, value, props"

  def oracleSql: Map[String, String] = Map(
    "ingest_validate" ->
      s"SELECT * FROM events WHERE $validSql",
    "ingest_dlq" ->
      s"""SELECT *,
         | CASE WHEN user_id IS NULL OR ts IS NULL THEN 'missing_key'
         |      WHEN value < 0 OR value > 300 THEN 'value_out_of_range'
         |      WHEN event_type NOT IN ('click','view','purchase','signup') THEN 'bad_event_type'
         |      ELSE 'unknown' END AS reason
         |FROM events WHERE NOT ($validSql)""".stripMargin,
    "ingest_dedup" ->
      s"""SELECT $eventCols FROM (
         | SELECT e.*, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
         | FROM events e) t WHERE rn = 1""".stripMargin,
    "ingest_batch_stats" ->
      s"""SELECT user_id, count(*) AS n_events,
         | cast(sum(CASE WHEN $validSql THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
         | cast(sum(CASE WHEN $validSql THEN 0 ELSE 1 END) AS BIGINT) AS n_invalid,
         | count(*) - count(DISTINCT ts) AS n_dup_keys
         |FROM events GROUP BY user_id""".stripMargin,
    "ingest_pipeline" ->
      s"""SELECT $eventCols FROM (
         | SELECT e.*, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
         | FROM (SELECT * FROM events WHERE $validSql) e) t WHERE rn = 1""".stripMargin,
    "raw_station" ->
      s"""SELECT * FROM events WHERE user_id = $RawUser
         | AND ts >= TIMESTAMP '$RawStart' AND ts <= TIMESTAMP '$RawEnd'
         |ORDER BY ts DESC""".stripMargin,
    "agg_station" ->
      s"""SELECT user_id, round(avg(value), 4) AS avg_value, min(value) AS min_value,
         | max(value) AS max_value, count(*) AS n
         |FROM events WHERE user_id = $RawUser
         | AND ts >= TIMESTAMP '$RawStart' AND ts <= TIMESTAMP '$RawEnd'
         |GROUP BY user_id""".stripMargin,
    "timeseries_bucket" ->
      """SELECT user_id, date_trunc('hour', ts) AS bucket,
        | round(avg(value), 4) AS avg_value, min(value) AS min_value,
        | max(value) AS max_value, count(*) AS reading_count
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "latest_per_key" ->
      s"""SELECT $eventCols FROM (
         | SELECT e.*, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         | FROM events e) t WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | sum(cast(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        | sum(cast(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
        | sum(cast(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_extendedprice), 4) AS avg_price,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        | sum(cast(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        | AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
        | AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        |GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        | sum(cast(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
        | AND c_nationkey = s_nationkey AND c_nationkey = n_nationkey
        | AND n_regionkey = r_regionkey AND r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "top_k_per_group" ->
      """SELECT p_brand, rnk, p_partkey, p_name, p_retailprice FROM (
        | SELECT p_brand, p_partkey, p_name, p_retailprice,
        |  row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk
        | FROM part) t WHERE rnk <= 3 ORDER BY p_brand, rnk""".stripMargin,
    "events_sessionize" ->
      """SELECT user_id, cast(session_id AS BIGINT) AS session_id,
        | min(ts) AS session_start, max(ts) AS session_end,
        | count(*) AS n_events, sum(cast(value AS DECIMAL(18,2))) AS session_value
        |FROM (
        | SELECT user_id, ts, event_id, value,
        |  sum(CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_id
        | FROM (
        |  SELECT user_id, ts, event_id, value,
        |   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events) x) y
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "rollup_events" ->
      """SELECT event_type, user_bucket, count(*) AS n,
        | sum(cast(value AS DECIMAL(18,2))) AS total_value
        |FROM (SELECT event_type, user_id % 10 AS user_bucket, value FROM events) t
        |GROUP BY ROLLUP(event_type, user_bucket)
        |ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST""".stripMargin
  )
}
