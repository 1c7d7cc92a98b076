package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Memory-pressure (spill) gate. At 100 TB the working set of a
  * shuffle/sort/agg partition WILL exceed executor execution memory
  * somewhere — the engine's contract is to degrade to disk spill, not
  * to OOM. A `local[N]` run on a 128 GiB heap can never show that, so
  * this gate runs shuffle-heavy queries under deliberately starved
  * executor processes (default `local-cluster[2,2,640]`: two 640 MB
  * executors, ~200 MB execution+storage each) and asserts
  *
  *   1. every query completes and its canonical fingerprint equals an
  *      undisturbed roomy `local[C]` control run, and
  *   2. the run ACTUALLY spilled (sum of per-task diskBytesSpilled > 0)
  *      — otherwise the gate is vacuous and exits non-zero so the
  *      operator shrinks the memory knob instead of trusting it.
  *
  * Usage:  runMain graft.PressureCheck <sfDir> [query,query,...]
  * Env: SPARK_GRAFT_PRESSURE_MASTER (default local-cluster[2,2,640]),
  * SPARK_GRAFT_CPUS (control cores + shuffle partitions, default 8),
  * SPARK_GRAFT_PRESSURE_OUT (JSON artifact path).
  */
object PressureCheck {

  /** The shapes that stress execution memory: hash aggregation over the
    * biggest fact table (q18), a multi-join shuffle tree (q9), window
    * sorts over the full event stream (timeseries_sliding), the minhash
    * banding shuffle + verify join, a corpus-wide explode/agg
    * (tfidf_topterms), and the two-level prefix-scan packer (seq_pack).
    */
  val DefaultSubset: Seq[String] = Seq(
    "q18_big_orders", "q9_profit_proxy", "timeseries_sliding",
    "dedup_minhash", "tfidf_topterms", "seq_pack",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/data/sf1")
    val names = args.lift(1)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultSubset)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val pressureMaster =
      sys.env.getOrElse("SPARK_GRAFT_PRESSURE_MASTER", "local-cluster[2,2,640]")

    val control = graft.gates.GateHarness.controlFingerprints(names, cpus, sfDir)(
      SparkEntry.queries(_))

    val spark = GraftSession.builderFor(pressureMaster, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spilledDisk = new AtomicLong
    val spilledMem = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spilledDisk.addAndGet(m.diskBytesSpilled)
          spilledMem.addAndGet(m.memoryBytesSpilled)
        }
      }
    })

    val results = names.map { n =>
      val d0 = spilledDisk.get(); val m0 = spilledMem.get()
      val fp =
        try Right(ClusterCheck.fingerprint(SparkEntry.queries(n)(spark, sfDir).collect()))
        catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      (n, fp, spilledDisk.get() - d0, spilledMem.get() - m0)
    }
    spark.stop()

    val perQuery = results.map { case (n, fp, disk, mem) =>
      val verdict = fp match {
        case Right((rows, hash)) =>
          val (cr, chash) = control(n)
          val ok = rows == cr && hash == chash
          s"""{"rows":$rows,"match":$ok,"disk_spill_mb":${disk / 1048576},""" +
            s""""mem_spill_mb":${mem / 1048576}}"""
        case Left(e) =>
          s"""{"match":false,"error":"${e.replace("\"", "'").take(200)}"}"""
      }
      n -> verdict
    }
    val failures = perQuery.count(!_._2.contains("\"match\":true"))
    val totalDiskMb = spilledDisk.get() / 1048576
    graft.gates.GateHarness.artifact("memory_pressure")
      .str("sf", sfDir).str("master", pressureMaster)
      .num("queries_checked", names.length.toLong).num("failures", failures.toLong)
      .num("disk_spill_mb", totalDiskMb)
      .queries(perQuery)
      .emit("SPARK_GRAFT_PRESSURE_OUT",
        red = !graft.gates.GateHarness.spillNonVacuous(failures, totalDiskMb))
  }
}
