package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Ingest

/** Structured Streaming form of the reference's ingest path (SURVEY.md
  * §2E): the consumer loop (services/consumer/main.py:277-376) —
  * validate → dedup → persist — expressed as readStream → transforms →
  * writeStream with watermarked state instead of an in-memory buffer.
  *
  * Kafka-sourced deployment is [[kafkaSource]] (`format("kafka")` +
  * [[fromKafka]]'s from_json over the value column); the transform DAG
  * downstream is identical. The file [[source]] stands in for local
  * tests (no broker in the container), exactly like the reference's
  * tests bypass the broker.
  *
  * Scale notes: streaming dedup state is bounded by the watermark
  * horizon (the reference's unbounded in-memory dict is the thing that
  * does NOT survive scale); windowed aggregation state likewise. Both
  * compile to the same keyed shuffle as the batch path.
  */
object EventStream {

  /** Schema of the converted events table (ts already µs, see
    * graft.Tables.events — file streams need an explicit schema).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of event parquet files. */
  def source(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Kafka value-payload schema: the collector produces each validated
    * record as one JSON message on the topic
    * (collector/main.py:129-131); mapped onto the events shape, with ts
    * as an ISO-8601 string (pydantic's json serialization of datetime).
    */
  val kafkaValueSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", StringType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Parse a Kafka-shaped frame (binary key/value + topic/partition/
    * offset/timestamp) into the events schema: from_json over the value
    * column, ISO ts string → TIMESTAMP_NTZ. Separated from
    * [[kafkaSource]] so the parse logic is spec-testable without a
    * broker — it only needs a DataFrame with a binary `value` column,
    * exactly what the Kafka source emits.
    *
    * The casted payload rides along as `__raw` so an unparseable frame
    * (all-null parsed struct) keeps its original message and can be
    * routed to [[kafkaStructuralDlq]] — the collector wraps exactly
    * that payload in its DLQ record (collector/main.py:134-146).
    * Downstream transforms name their columns, so the extra column is
    * inert; drop it at the sink if the topic schema is closed.
    */
  def fromKafka(raw: DataFrame): DataFrame =
    raw
      .select(col("value").cast("string").as("__raw"))
      .select(from_json(col("__raw"), kafkaValueSchema).as("e"), col("__raw"))
      .select(
        col("e.event_id").as("event_id"),
        // to_timestamp_ntz parses the wall clock directly — an LTZ
        // round-trip would shift it by the session zone offset for
        // offset-bearing ISO strings in non-UTC sessions
        to_timestamp_ntz(col("e.ts")).as("ts"),
        col("e.user_id").as("user_id"),
        col("e.event_type").as("event_type"),
        col("e.value").as("value"),
        col("e.props").as("props"),
        col("__raw"))

  /** Producer-side projection — the inverse of [[fromKafka]]: events
    * serialized to the collector's one-JSON-message-per-record topic
    * shape (collector/main.py:129-131), key = user_id so a key-
    * partitioned topic keeps per-user order (what the watermarked
    * dedup and sessionization downstream rely on). Attach
    * `.writeStream.format("kafka")` (broker deployment) or any test
    * sink; spec proves fromKafka ∘ toKafka is the identity on valid
    * events.
    */
  def toKafka(events: DataFrame): DataFrame =
    events.select(
      col("user_id").cast("string").cast("binary").as("key"),
      to_json(struct(
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props")))
        .cast("binary").as("value"))

  /** Parsed-only projection of [[fromKafka]] — the default DAG input
    * for any composition that persists the stream. `__raw` exists for
    * the DLQ branch only; without this drop, a pass-through sink (e.g.
    * validate → upsert) would write the full raw JSON into the table,
    * doubling row width and changing the stored schema.
    */
  def fromKafkaParsed(raw: DataFrame): DataFrame =
    fromKafka(raw).drop("__raw")

  /** Structural DLQ for the Kafka path: frames whose payload did not
    * parse (from_json yields a null struct → null event_id AND null ts)
    * re-emitted in the collector's {error, original_message, trace_id}
    * wrap (collector/main.py:134-146). Same record shape as the batch
    * [[graft.sources.Sources.structuralDlq]]; trace_id is a content
    * hash so redelivered frames stay idempotent. Narrow (no shuffle) —
    * attach as a second sink on the parsed stream.
    */
  def kafkaStructuralDlq(parsed: DataFrame): DataFrame =
    parsed
      .filter(col("event_id").isNull && col("ts").isNull && col("__raw").isNotNull)
      .select(
        lit("schema_validation_error").as("error"),
        col("__raw").as("original_message"),
        md5(col("__raw")).as("trace_id"))

  /** Kafka-sourced deployment of the same DAG — the consumer's
    * subscribe loop (consumer/main.py:277-376). Requires the
    * spark-sql-kafka connector on the classpath at runtime (not in this
    * container — the file [[source]] stands in for local tests, exactly
    * like the reference's tests bypass the broker); the transform chain
    * downstream of [[fromKafka]] is identical either way.
    */
  def kafkaSource(spark: SparkSession, bootstrapServers: String,
                  topic: String): DataFrame =
    fromKafka(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load())

  /** Validate → watermarked dedup on (user_id, ts). Within the watermark
    * horizon duplicates are dropped keep-FIRST — the streaming analog of
    * the reference's idempotent upsert (migrations/db.sql:30-33,
    * ON CONFLICT DO NOTHING); the in-memory keep-last buffer
    * (consumer/main.py:327-344) is a micro-batch-local detail.
    */
  def cleaned(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    Ingest.validate(events)
      // watermarks require TIMESTAMP (with-tz); session tz is UTC so the
      // NTZ→LTZ cast is value-preserving
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "ts")

  /** Stream-static enrichment: each micro-batch joins a STATIC
    * dimension frame on `joinCol` — the standard lookup-table pattern
    * (station metadata, user attributes). The dim side is broadcast
    * per micro-batch, so the stream never shuffles and late dimension
    * updates are picked up on the next batch re-read when the dim is a
    * table-backed frame. Left join: an event with no dimension row
    * flows through with nulls rather than silently dropping (DLQ-style
    * routing on the null columns stays composable downstream).
    */
  def enriched(events: DataFrame, dim: DataFrame,
               joinCol: String = "user_id"): DataFrame =
    events.join(broadcast(dim), Seq(joinCol), "left")

  /** Hourly windowed aggregation per event_type — the streaming form of
    * the timeseries_bucket query. Append mode: a bucket emits once its
    * watermark passes.
    */
  def windowedAgg(cleanedEvents: DataFrame): DataFrame =
    cleanedEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming session windows: the same session_window operator as the
    * batch [[graft.ops.Analytics.sessionizeNative]], keyed per user,
    * with watermark-bounded state — sessions emit (append mode) once
    * the watermark passes their close. The reference has no session
    * endpoint; this is the streaming face of the batch sessionize so
    * both run one operator family.
    */
  def sessionAgg(cleanedEvents: DataFrame, gap: String = "30 minutes"): DataFrame =
    cleanedEvents
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("total_value"))

  /** Stream-stream interval join: purchases matched to the same user's
    * views within the preceding `horizon` — attribution, the canonical
    * two-stream correlation. Both sides carry watermarks and the join
    * predicate carries the time bound, which TOGETHER bound the state
    * store: each side buffers only rows younger than
    * watermark + horizon, so state is O(rate × horizon) regardless of
    * stream length — the property that lets this run forever at scale.
    * Inner join: matches emit as soon as both sides have arrived (no
    * watermark-close wait, unlike outer stream-stream joins).
    */
  def intervalJoin(events: DataFrame, watermark: String = "1 hour",
                   horizon: String = "30 minutes"): DataFrame = {
    val valid = Ingest.validate(events)
      .withColumn("ts", col("ts").cast("timestamp"))
    val purchases = valid.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    val views = valid.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    purchases
      .join(views, expr(
        s"user_id = v_user_id AND view_ts <= purchase_ts " +
          s"AND view_ts >= purchase_ts - interval $horizon"))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("purchase_value"), col("view_id"), col("view_ts"))
  }

  /** Streaming upsert sink — the consumer's full persistence path
    * (consumer/main.py:277-376): validate each micro-batch, then merge
    * it into a date-partitioned parquet table with keep-last semantics
    * per (user_id, ts), the `ON CONFLICT DO UPDATE` analog
    * (consumer/main.py:229-245). The micro-batch IS the reference's
    * size/TTL flush buffer (trigger interval ≈ TTL, maxFilesPerTrigger
    * ≈ size); dedup across redeliveries is the upsert's job, so the
    * sink converges to one newest row per key no matter how batches
    * overlap. Each foreachBatch call touches only the partitions
    * present in that batch — cost scales with the batch at any table
    * size.
    */
  def upsertSink(spark: SparkSession, events: DataFrame, path: String,
                 checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    Ingest.validate(events)
      // defense-in-depth: never let the Kafka DLQ payload column reach
      // the stored table even if a caller wires fromKafka (not
      // fromKafkaParsed) straight into the sink
      .drop("__raw")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("dt", to_date(col("ts")).cast("string"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.sources.Sources.upsertPartitionedKeepLast(spark, path, batch,
          keyCols = Seq("user_id", "ts"), orderCol = "event_id",
          partitionCols = Seq("dt"))
      }
      .start()

  /** [[upsertSink]] writing through [[graft.sources.SnapshotTable]]
    * instead of live partition-swap parquet — the consumer's `ON
    * CONFLICT` loop under a transactional table (consumer/main.py:
    * 229-245 against a real MVCC store). Each micro-batch becomes one
    * atomically-published table version whose commit rewrites only the
    * partitions the batch touches; a reader pinned at version v keeps
    * reading v byte-for-byte while the stream publishes v+1, v+2, … —
    * the isolation the raw-directory sink can only approximate. Batch
    * replays after checkpoint recovery converge by keep-last.
    */
  def upsertSinkSnapshot(spark: SparkSession, events: DataFrame, path: String,
                         checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    Ingest.validate(events)
      .drop("__raw")
      .withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("dt", to_date(col("ts")).cast("string"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // no-data micro-batches (watermark advancement) must not mint
        // empty table versions
        if (!batch.isEmpty)
          graft.sources.SnapshotTable.upsertOrCreate(spark, path, batch,
            keyCols = Seq("user_id", "ts"), orderCol = "event_id",
            partitionCols = Seq("dt")): Unit
      }
      .start()

  /** [[aggTableSink]] on [[graft.sources.SnapshotTable]]: the
    * incrementally-maintained aggregate becomes a versioned table, so a
    * dashboard reader holds one CONSISTENT version of the whole
    * aggregate while the stream keeps publishing newer ones — update
    * mode re-emits a window's row mid-aggregation, and under the raw
    * sink a reader could catch partition A after batch n and partition
    * B at batch n-1. Keep-last on the micro-batch sequence `__v` keeps
    * redelivered batches from regressing rows, exactly as in
    * [[aggTableSink]].
    */
  def aggTableSinkSnapshot(spark: SparkSession, events: DataFrame, path: String,
                           checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowedAgg(cleaned(events))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          graft.sources.SnapshotTable.upsertOrCreate(spark, path,
            batch
              .withColumn("dt", to_date(col("bucket")).cast("string"))
              .withColumn("__v", lit(batchId)),
            keyCols = Seq("bucket", "event_type"), orderCol = "__v",
            partitionCols = Seq("dt")): Unit
      }
      .start()

  /** Incrementally-maintained aggregate table — the materialized-view
    * face of [[windowedAgg]]: update mode re-emits each (bucket,
    * event_type) row whenever new events land in its window, and
    * foreachBatch upserts the NEW cumulative value over the old one
    * (keep-last on the micro-batch sequence number — monotone per
    * checkpoint, so redelivered batches can't regress a row). The
    * dashboard table the reference's query service would read is thus
    * always current without ever recomputing history; each micro-batch
    * touches only the date partitions its windows fall in. The batch
    * version column `__v` rides along in the stored table as merge
    * lineage.
    */
  def aggTableSink(spark: SparkSession, events: DataFrame, path: String,
                   checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowedAgg(cleaned(events))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.Sources.upsertPartitionedKeepLast(spark, path,
          batch
            .withColumn("dt", to_date(col("bucket")).cast("string"))
            .withColumn("__v", lit(batchId)),
          keyCols = Seq("bucket", "event_type"), orderCol = "__v",
          partitionCols = Seq("dt"))
      }
      .start()

  /** One-shot backfill/catch-up: run the ingest DAG (validate →
    * watermarked dedup) over everything CURRENTLY in `dir`, write
    * parquet, and stop — `Trigger.AvailableNow`, the replay mode of
    * the same streaming job (checkpoint-compatible with the continuous
    * form, so a backfill and the live stream share offsets and never
    * double-process). Re-running with the same checkpoint is a no-op:
    * exactly-once lands at the sink level. At 100 TB this is how the
    * engine rebuilds from the raw landing zone — same DAG, bounded
    * run, rate-limited by maxFilesPerTrigger if configured.
    */
  def backfillOnce(spark: SparkSession, dir: String, destPath: String,
                   checkpointDir: String): Unit =
    cleaned(source(spark, dir))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet")
      .option("path", destPath)
      .start()
      .awaitTermination()

  /** Run the whole pipeline synchronously against whatever files are in
    * `dir`, collecting results via a memory sink. Used by the spec; a
    * production job points the same DAG at a real sink with a
    * checkpoint.
    */
  def runOnce(spark: SparkSession, dir: String, queryName: String = ""): DataFrame = {
    val name = if (queryName.nonEmpty) queryName else s"graft_stream_${System.nanoTime()}"
    runOnceNamed(spark, dir, name)
  }

  /** File-sink form of [[runOnce]] for the DRIVER-GATED query: the same
    * DAG writes its finalized windows to a parquet sink (fresh sink +
    * checkpoint per invocation, `Trigger.AvailableNow` over the staged
    * files) and the result is read BACK FROM FILES — no result row ever
    * materializes on the driver, so repeated runs (bench reps) time the
    * engine, not a driver copy. The memory-sink form below stays for
    * specs, where collecting a few hundred rows is the point.
    */
  def runOnceToFiles(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    windowedAgg(cleaned(source(spark, dir)))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("parquet")
      .option("path", out)
      .start()
      .awaitTermination()
    spark.read.parquet(out)
  }

  private def runOnceNamed(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q = windowedAgg(cleaned(source(spark, dir)))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    // Materialize and drop the sink table: each memory sink pins its
    // result rows on the driver for the life of the session, so repeated
    // runs (bench reps) would otherwise accumulate copies.
    val sink = spark.table(queryName)
    val out = spark.createDataFrame(sink.collectAsList(), sink.schema)
    spark.catalog.dropTempView(queryName)
    out
  }

  /** Streaming latest-per-key via explicit keyed state
    * (mapGroupsWithState): maintains the newest event per user as new
    * micro-batches arrive — the streaming form of the reference's
    * get_latest_weather_data (migrations/db.sql:79-90) kept fresh
    * incrementally instead of re-queried. State is one row per key
    * (bounded by key cardinality, not stream length).
    */
  def latestPerKeyStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val typed = events
      .withColumn("ts", col("ts").cast("timestamp"))
      .as[(Long, java.sql.Timestamp, Long, String, Double, String)]
    typed
      .groupByKey(_._3)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String, Double, String)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, java.sql.Timestamp, Double)]) =>
          val newest = (rows ++ state.getOption.map(s => (s._1, s._2, user, "", s._3, "")))
            .maxBy(r => (r._2.getTime, r._1))
          state.update((newest._1, newest._2, newest._5))
          (user, newest._1, newest._2, newest._5)
      }
      .toDF("user_id", "event_id", "ts", "value")
  }

  /** Streaming sensor-outage detection — the stateful twin of
    * [[graft.ops.StationQueries.gapDetect]]: per station, keep the
    * newest seen timestamp as keyed state and EMIT a gap row the moment
    * a reading arrives more than `thresholdSec` after it — monitoring
    * that fires on arrival instead of on re-scan. State is one
    * timestamp per key (bounded by key cardinality); gap arithmetic
    * floors to epoch seconds exactly like the batch form, so emitted
    * rows are comparable row-for-row. Assumes per-key in-order arrival
    * across micro-batches (the key-partitioned-topic guarantee
    * [[toKafka]] encodes); within a batch rows are sorted before the
    * state walk. The batch sort buffers ONE PRIMITIVE LONG per row
    * (epoch-µs), not the row itself — a 10M-row hot key in a catch-up
    * batch costs ~80 MB, not gigabytes; ordering by epoch-µs is
    * gap-equivalent to the old (second, nano, event_id) order because
    * equal timestamps yield gap 0 either way.
    */
  def gapDetectStream(spark: SparkSession, events: DataFrame,
                      thresholdSec: Long = 21600): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val typed = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
    def toMicros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant; i.getEpochSecond * 1000000L + i.getNano / 1000
    }
    def fromMicros(m: Long): java.sql.Timestamp = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(Math.floorDiv(m, 1000000L),
        Math.floorMod(m, 1000000L) * 1000))
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
         state: org.apache.spark.sql.streaming.GroupState[java.sql.Timestamp]) =>
          val micros = rows.map(r => toMicros(r._2)).toArray
          java.util.Arrays.sort(micros)
          val out = Seq.newBuilder[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
          var last = state.getOption.map(toMicros).getOrElse(Long.MinValue)
          micros.foreach { m =>
            if (last != Long.MinValue) {
              val gap = Math.floorDiv(m, 1000000L) - Math.floorDiv(last, 1000000L)
              if (gap > thresholdSec) out += ((user, fromMicros(last), fromMicros(m), gap))
            }
            if (m > last) last = m
          }
          if (last != Long.MinValue) state.update(fromMicros(last))
          out.result().iterator
      }
      .toDF("user_id", "gap_start", "gap_end", "gap_sec")
  }

  /** Streaming anomaly detection — the stateful twin of
    * [[graft.ops.Analytics.anomalyZScore]]: per event_type, keyed state
    * carries Welford running moments (n, mean, M2), each micro-batch
    * first absorbs its rows (in event_id order, so the fold is
    * deterministic) and then scores THAT batch's rows against the
    * updated prefix statistics — monitoring that flags outliers on
    * arrival, with thresholds that sharpen as history accumulates.
    * State is three numbers per event type (bounded by type
    * cardinality, never stream length). When everything arrives in one
    * batch the prefix IS the full group, so the emitted set equals the
    * batch operator's (AnomalyStreamSpec proves it); across batches the
    * early rows are scored against less history — the honest streaming
    * semantics. sd=0 and n<2 prefixes emit nothing, mirroring the
    * batch operator's zero-variance exclusion. z is rounded HALF_UP to
    * 4 decimals BEFORE thresholding, exactly like the batch form.
    */
  def anomalyStream(spark: SparkSession, events: DataFrame,
                    threshold: Double = 2.5): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val typed = events
      .filter(col("event_type").isNotNull && col("value").isNotNull)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .as[(Long, Long, String, Double)]
    typed
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (etype: String, rows: Iterator[(Long, Long, String, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Double, Double)]) =>
          val batch = rows.toArray.sortBy(_._1)
          var (n, mean, m2) = state.getOption.getOrElse((0L, 0.0, 0.0))
          batch.foreach { r =>
            n += 1
            val d = r._4 - mean
            mean += d / n
            m2 += d * (r._4 - mean)
          }
          state.update((n, mean, m2))
          val std = if (n < 2) 0.0 else math.sqrt(m2 / (n - 1))
          if (std <= 0.0) Iterator.empty
          else batch.iterator.flatMap { case (id, uid, _, v) =>
            val z = BigDecimal((v - mean) / std)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (math.abs(z) >= threshold) Some((id, uid, etype, v, z)) else None
          }
      }
      .toDF("event_id", "user_id", "event_type", "value", "z")
  }

  /** Driver-facing entry (rows-only check): stage the converted events
    * as a file-stream source, run the full streaming pipeline, return
    * the emitted windows. Append mode withholds windows newer than the
    * final watermark, so this is not byte-for-byte SQL-expressible —
    * the StreamingSpec proves emitted ⊆ batch-equivalent.
    */
  private val stagedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The events table staged once as a file-stream source directory
    * (JVM-cached per sfDir) — shared by [[stagedPipeline]] and the
    * cross-JVM streaming checks in [[graft.ClusterCheck]].
    */
  def stagedEventsDir(spark: SparkSession, sfDir: String): String =
    stagedDirs.computeIfAbsent(sfDir, { sf =>
      val d = java.nio.file.Files.createTempDirectory("graft_stream_src").toString
      graft.Tables.events(spark, sf).coalesce(2).write.mode("overwrite").parquet(d)
      d
    })

  def stagedPipeline(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stagedEventsDir(spark, sfDir)
    // Size the STATE partitioning to the state volume, not to the batch
    // default: every shuffle partition owns a state store per stateful
    // operator, and each store pays commit I/O per micro-batch. With two
    // stateful ops, 32 partitions = 64 store commits per batch for a few
    // hundred thousand keys — store overhead dominates. 8 partitions is
    // plenty for this key volume; at real scale this is the knob you
    // RAISE with key cardinality (it is fixed for the life of a
    // checkpoint — chosen at first start, like any state layout).
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try runOnceToFiles(spark, dir)
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Continuous distinct-count maintenance — the streaming
    * materialization of [[graft.ops.Analytics.hllRollup]]'s daily
    * layer: each micro-batch folds its events into per-(event_type,
    * day) HLL sketch rows and register-merges them into the persisted
    * sketch store (`hll_union_agg` over old ∪ new — same-lgK union is
    * lossless, so the stream-maintained sketch is BIT-EQUAL to one
    * built from all rows at once, which the spec asserts through the
    * estimates). The store is rollup-sized (types × days), so the
    * merge rewrite costs nothing at any event volume — this is the
    * pre-aggregation that makes "distinct users this week" a
    * sketch-merge instead of a 100 TB rescan, kept fresh per batch.
    * The merged frame is localCheckpointed before the overwrite (the
    * plan reads the store it is about to replace) and released after.
    */
  def hllIngestOnce(spark: SparkSession, srcDir: String, storePath: String,
                    checkpointDir: String, lgK: Int = 12,
                    maxFilesPerTrigger: Int = 0): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val reader = spark.readStream.schema(schema)
    (if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
    else reader)
      .parquet(srcDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // release exactly the blocks this batch pins (the CorpusStream
        // snapshot-diff pattern) — a continuous stream would otherwise
        // accumulate one checkpointed store copy per micro-batch
        val sc = spark.sparkContext
        val before = sc.getPersistentRDDs.keySet
        val daily = batch
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .groupBy(col("event_type"),
            to_date(col("ts").cast("timestamp")).as("day"))
          .agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sketch"),
            count(lit(1)).as("n_events"))
        val store = new java.io.File(storePath)
        val merged = (if (store.exists && store.list().nonEmpty)
          spark.read.parquet(storePath).unionByName(daily)
        else daily)
          .groupBy(col("event_type"), col("day"))
          .agg(expr("hll_union_agg(sketch, false)").as("sketch"),
            sum(col("n_events")).as("n_events"))
          .localCheckpoint(true)
        merged.write.mode("overwrite").parquet(storePath)
        sc.getPersistentRDDs.filterNot { case (id, _) => before.contains(id) }
          .foreach { case (_, rdd) => rdd.unpersist(false) }
      }
      .start()
      .awaitTermination()
  }

  /** Serve the maintained store: per-key distinct estimate + volume —
    * what a dashboard reads; cost ∝ store rows, never events.
    */
  def hllServe(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath)
      .select(col("event_type"), col("day"),
        expr("hll_sketch_estimate(sketch)").as("approx_users"),
        col("n_events"))
      .orderBy(col("event_type"), col("day"))
}
