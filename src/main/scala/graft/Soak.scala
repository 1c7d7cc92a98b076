package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Driver-soak gate: push thousands of mixed queries through ONE
  * long-lived session and assert the driver's RSS PLATEAUS — the
  * repeatable regression gate the r8 scale campaign's one-off finding
  * called for (a 24g driver OOM'd at minute ~31 of the first sf1
  * sweep: ContextCleaner backlog + status-store retention, fixed by
  * the periodicGC/retention posture now in Bench/Verify; SCALE.md §4).
  * This main re-runs that exposure class on demand so the fix can
  * never silently regress: a reverted cleaner setting, a new
  * cache/broadcast leak in an operator, or an unbounded serving cache
  * all show up as monotone RSS growth here long before a multi-hour
  * bench would find them.
  *
  * Methodology: a rotating mix of ~20 gated queries (scans, joins,
  * window ops, broadcasts, the cached/serving paths — the block
  * classes with driver-side lifecycle) runs `iters` times. The leak
  * signal is RETAINED HEAP AFTER A FORCED GC, sampled periodically: a
  * raw RSS curve mostly measures G1 expanding lazily toward Xmx (a
  * first naive run of this gate "failed" on exactly that), while
  * retained-after-GC is what actually grows when the cleaner backlog,
  * status stores, or a serving cache leak — System.gc() also enqueues
  * the ContextCleaner's weak refs, so an un-drained backlog shows up
  * as blocks that survive collection. The gate compares the LAST
  * third's mean retained heap to the MIDDLE third's (first third is
  * warmup: caches fill, codegen compiles) and fails past `growthTol`
  * (default 15%); RSS is reported, and gated only by a lenient
  * absolute cap (1.75×Xmx) that catches native/off-heap runaways.
  *
  * Usage: `runMain graft.Soak [sfDir] [iters]`; env SPARK_GRAFT_CPUS,
  * SPARK_GRAFT_SOAK_OUT (JSON result path), SPARK_GRAFT_SOAK_TOL.
  * Exit 1 on gate failure. ~2000 queries ≈ 8 min at sf0.01/local[8].
  */
object Soak {

  /** VmRSS in MiB from /proc/self/status — Linux-only, like the rest
    * of the gate tooling. */
  def rssMb(): Long = {
    val line = scala.io.Source.fromFile("/proc/self/status").getLines()
      .find(_.startsWith("VmRSS:")).getOrElse("VmRSS: 0 kB")
    line.split("\\s+")(1).toLong / 1024
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val iters = if (args.length > 1) args(1).toInt else 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SOAK_OUT", "soak_out.json")
    val growthTol = sys.env.getOrElse("SPARK_GRAFT_SOAK_TOL", "0.15").toDouble
    val spark = GraftSession.builder(defaultCpus = cpus)
      // the posture under test — the r8 OOM fix
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.sql.ui.retainedExecutions", "16")
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // The mix: every driver-side block-lifecycle class is represented —
    // broadcast joins (q3/q5/top_k), window ops (latest_per_key),
    // result-cache hits (raw_station_cached), serving-layer caches
    // (dedup_incremental, knn_ivf, ann families), plain scans/aggs.
    // All are sub-second at sf0.01 so thousands fit in minutes.
    val mixNames = Seq(
      "q1_agg", "q3_shipping", "q5_local_supplier", "agg_station",
      "raw_station", "raw_station_cached", "timeseries_station",
      "latest_per_key", "top_k_per_group_fast", "rollup_events",
      "events_dow_hour", "token_count", "text_stats", "lang_id",
      "span_dedup", "doc_fingerprint", "multimodal_meta",
      "sample_weighted", "knn_ivf", "dedup_incremental")
    val mix = mixNames.map(n => n -> SparkEntry.queries(n))

    /** Retained heap (MiB) after a forced GC + a short cleaner-drain
      * pause — the bytes that SURVIVE collection, i.e. what a leak
      * actually grows. */
    def retainedMb(): Long = {
      System.gc()
      Thread.sleep(300) // let the ContextCleaner drain enqueued refs
      System.gc()
      val rt = Runtime.getRuntime
      (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    }

    val sampleEvery = math.max(1, iters / 40)
    val samples = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var failures = 0
    val t0 = System.nanoTime()
    var i = 0
    while (i < iters) {
      val (name, fn) = mix(i % mix.size)
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        failures += 1
        System.err.println(s"[soak] $name failed at iter $i: ${e.getMessage}")
      }
      if (i % sampleEvery == sampleEvery - 1) samples += ((i, retainedMb(), rssMb()))
      i += 1
    }
    val wallSec = (System.nanoTime() - t0) / 1e9

    val retained = samples.map(_._2.toDouble).toSeq
    val third = retained.size / 3
    val mid = retained.slice(third, 2 * third)
    val last = retained.drop(2 * third)
    val midMean = mid.sum / math.max(1, mid.size)
    val lastMean = last.sum / math.max(1, last.size)
    val growth = lastMean / math.max(1.0, midMean) - 1.0
    val plateau = growth <= growthTol
    val rssPeak = samples.map(_._3).max
    val rssCapMb = (Runtime.getRuntime.maxMemory() / (1024 * 1024) * 7) / 4
    val rssOk = rssPeak <= rssCapMb
    val ok = plateau && rssOk && failures == 0

    // assembled via the shared harness; outPath has a DEFAULT here
    // (unlike the env-optional gates), so the write stays explicit
    val json = graft.gates.GateHarness.artifact("soak_retained_heap_plateau")
      .bool("ok", ok).num("iters", iters.toLong).num("failures", failures.toLong)
      .raw("wall_sec", f"$wallSec%.1f")
      .raw("retained_mid_mb", f"$midMean%.0f").raw("retained_last_mb", f"$lastMean%.0f")
      .raw("growth", f"$growth%.4f").raw("tolerance", growthTol.toString)
      .num("rss_peak_mb", rssPeak).num("rss_cap_mb", rssCapMb).str("sf", sfDir)
      .json
    println(json)
    Files.write(Paths.get(outPath), (json + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
    if (!ok) {
      System.err.println(
        s"[soak] GATE FAILED: retained-heap growth=${f"$growth%.3f"} tol=$growthTol " +
          s"rss_peak=${rssPeak}MB cap=${rssCapMb}MB failures=$failures " +
          "- driver memory does not plateau (see SCALE.md §4 for the leak classes this catches)")
      sys.exit(1)
    }
  }
}
