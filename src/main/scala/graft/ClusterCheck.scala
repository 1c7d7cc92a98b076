package graft

import org.apache.spark.sql.{Row, SparkSession}

/** Cross-JVM equivalence gate (r10 verdict's top gap: every run of this
  * engine had only ever executed inside one JVM, so no custom Catalyst
  * expression, broadcast, shuffle block, or physical plan had ever been
  * SERIALIZED across a process boundary — the first thing a real
  * cluster tests).
  *
  * Runs a kernel-heavy query subset TWICE in one process —
  *
  *   1. under `local-cluster[2,C,MB]` (real executor child processes:
  *      codegen sources compile executor-side, per-JVM lazy caches
  *      — hyperplane sign tables, kryo registrators — initialize in a
  *      JVM that is NOT the driver, shuffle/broadcast bytes cross
  *      process boundaries, serving layouts are BUILT by remote
  *      executors);
  *   2. then under plain `local[C]` against the SAME corpus (which also
  *      proves the persisted serving layouts built by remote executors
  *      reload in a fresh driver-only context);
  *
  * — and compares per-query row fingerprints. Numeric values are
  * canonicalized to 9 significant digits before hashing so a
  * last-ulp difference from a different partition-reduction order
  * can't masquerade as a serialization bug (everything the driver's
  * DuckDB oracle checks is already rounded/aliased upstream anyway).
  *
  * Emits ONE JSON line (and writes it to SPARK_GRAFT_CLUSTER_OUT if
  * set); exits non-zero on any mismatch. Usage:
  *
  *   runMain graft.ClusterCheck <sfDir> [query,query,...]
  *
  * Env: SPARK_GRAFT_CLUSTER_MASTER (default local-cluster[2,4,2048]),
  * SPARK_GRAFT_CPUS (local-side cores + shuffle partitions, default 8).
  */
object ClusterCheck {

  /** Every custom-kernel / cross-JVM-sensitive family is represented:
    * codegen hash expressions (minhash/simhash/shingles), codegen
    * vector ops + per-JVM sign-table cache (embedding LSH, knn),
    * custom physical plan (top_k_per_group_fast), session-window native
    * plan, persisted serving layouts (dedup_incremental, knn_ivf_pq,
    * dsir_sample), bloom runtime filter (split_leakage_bloom),
    * broadcast-heavy TPC-H joins (q9), two-level prefix scans
    * (seq_pack), binary multimodal columns, the ingest pipeline's
    * DLQ union — and the STREAMING engine: micro-batch execution with
    * executor-side state stores (windowed agg + stream dedup via the
    * staged pipeline) plus keyed arbitrary state whose custom tuple
    * encoders serialize across the process boundary
    * (mapGroupsWithState / flatMapGroupsWithState).
    */
  val DefaultSubset: Seq[String] = Seq(
    "q1_agg", "q9_profit_proxy", "q18_big_orders",
    "top_k_per_group_fast", "events_sessionize_native",
    "asof_join", "range_join",
    "ingest_pipeline",
    "dedup_exact", "dedup_minhash", "dedup_simhash",
    "dedup_embedding_lsh", "dedup_incremental",
    "knn_bruteforce", "knn_ivf_pq",
    "split_leakage_bloom", "seq_pack",
    "doc_lm_score", "dsir_sample", "multimodal_features",
    "stream_hourly_by_type", "stream_latest_state", "stream_gap_state",
  )

  /** Streaming checks beyond the driver-gated entry: run the REAL
    * micro-batch engine against the staged file source with state
    * stores living in executor processes. `stream_latest_state`
    * (mapGroupsWithState, update-mode memory sink reduced to the final
    * per-key state — batch-boundary-insensitive) and `stream_gap_state`
    * (flatMapGroupsWithState, append-mode emissions ≡ batch gaps by
    * StreamingSpec) both carry tuple state through custom encoders —
    * exactly the serialization a single-JVM run never exercises.
    */
  val StreamChecks: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
    "stream_latest_state" -> ((s: SparkSession, sfDir: String) => {
      import graft.streaming.EventStream
      val dir = EventStream.stagedEventsDir(s, sfDir)
      val q = EventStream.latestPerKeyStream(s, EventStream.source(s, dir))
        .writeStream.outputMode("update").format("memory")
        .queryName("cc_latest_state").start()
      q.processAllAvailable(); q.stop()
      val sink = s.table("cc_latest_state")
      val out = sink.groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.struct("ts", "event_id", "value")).as("m"))
        .select(org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("m.event_id"),
          org.apache.spark.sql.functions.col("m.ts"),
          org.apache.spark.sql.functions.col("m.value"))
      val materialized = s.createDataFrame(out.collectAsList(), out.schema)
      s.catalog.dropTempView("cc_latest_state")
      materialized
    }),
    "stream_gap_state" -> ((s: SparkSession, sfDir: String) => {
      import graft.streaming.EventStream
      val dir = EventStream.stagedEventsDir(s, sfDir)
      val q = EventStream.gapDetectStream(s, EventStream.source(s, dir))
        .writeStream.outputMode("append").format("memory")
        .queryName("cc_gap_state").start()
      q.processAllAvailable(); q.stop()
      val sink = s.table("cc_gap_state")
      val materialized = s.createDataFrame(sink.collectAsList(), sink.schema)
      s.catalog.dropTempView("cc_gap_state")
      materialized
    }),
  )

  /** Canonical, order-insensitive fingerprint of a result — the shared
    * [[graft.gates.GateHarness.fingerprint]]; kept as an alias because
    * every gate and spec referenced it here first.
    */
  def fingerprint(rows: Array[Row]): (Long, String) =
    graft.gates.GateHarness.fingerprint(rows)

  private def runAll(spark: SparkSession, sfDir: String,
                     names: Seq[String]): Map[String, Either[String, (Long, String)]] = {
    val resolve = StreamChecks.orElse(SparkEntry.queries)
    names.map { n =>
      n -> (try Right(fingerprint(resolve(n)(spark, sfDir).collect()))
      catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") })
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.lift(1)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultSubset)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val clusterMaster =
      sys.env.getOrElse("SPARK_GRAFT_CLUSTER_MASTER", "local-cluster[2,4,2048]")

    // SPARK_GRAFT_CLUSTER_FRESH=1: vacuum every serving layout first so
    // pass 1 BUILDS them with remote executors (otherwise layouts from
    // an earlier local run are merely reloaded and the executor-side
    // build path goes untested). Serving caches revalidate per serve,
    // so concurrent processes rebuild rather than fail.
    if (sys.env.get("SPARK_GRAFT_CLUSTER_FRESH").contains("1"))
      graft.sources.ServingLayouts.vacuum(maxAgeMs = -1)

    // Pass 1: real executor processes. Builds any serving layout that
    // is missing for this corpus WITH remote executors.
    val t0 = System.nanoTime()
    val clustered = {
      val s = GraftSession.builderFor(clusterMaster, cpus).getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      try runAll(s, sfDir, names) finally s.stop()
    }
    val tCluster = (System.nanoTime() - t0) / 1e9
    // a stopped context lingers briefly; the builder would otherwise
    // hand back the stopped singleton
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()

    // Pass 2: single-JVM reference (and reload-what-executors-built).
    val t1 = System.nanoTime()
    val local = {
      val s = GraftSession.builderFor(s"local[$cpus]", cpus).getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      try runAll(s, sfDir, names) finally s.stop()
    }
    val tLocal = (System.nanoTime() - t1) / 1e9

    val perQuery = names.map { n =>
      val verdict = (clustered(n), local(n)) match {
        case (Right((cr, ch)), Right((lr, lh))) =>
          if (cr == lr && ch == lh) s"""{"rows":$cr,"match":true}"""
          else s"""{"match":false,"cluster_rows":$cr,"local_rows":$lr,"cluster_hash":"$ch","local_hash":"$lh"}"""
        case (Left(e), _) => s"""{"match":false,"cluster_error":"${e.replace("\"", "'").take(200)}"}"""
        case (_, Left(e)) => s"""{"match":false,"local_error":"${e.replace("\"", "'").take(200)}"}"""
      }
      n -> verdict
    }
    val failures = perQuery.count(!_._2.contains("\"match\":true"))
    graft.gates.GateHarness.artifact("cluster_equivalence")
      .str("sf", sfDir).str("master", clusterMaster)
      .num("queries_checked", names.length.toLong).num("failures", failures.toLong)
      .raw("cluster_sec", f"$tCluster%.1f").raw("local_sec", f"$tLocal%.1f")
      .queries(perQuery)
      .emit("SPARK_GRAFT_CLUSTER_OUT", red = failures > 0)
  }
}
