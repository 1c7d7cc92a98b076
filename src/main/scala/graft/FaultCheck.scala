package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.duration._
import scala.concurrent.{Await, Future}

/** Executor-loss resilience gate. On a 1000-executor cluster, executor
  * death is ROUTINE (preemption, OOM kills, hardware) — the scheduler's
  * answer is task retry plus stage resubmission when the lost
  * executor's shuffle files surface as FetchFailed. None of that
  * machinery had ever fired against this engine's custom kernels: a
  * `local[N]` run cannot lose an executor, and the cross-JVM gate
  * (ClusterCheck) only proves the happy path.
  *
  * For each query in the subset: run it under `local-cluster[2,C,MB]`,
  * and once the scheduler reports ≥ `killAfterTasks` task launches,
  * SIGKILL one live executor PROCESS mid-flight (found via /proc by
  * this app's id on its command line — the executor is a child of the
  * in-JVM standalone worker, not of sbt). The query must still
  * complete, and its canonical fingerprint must equal the undisturbed
  * `local[C]` control run. The artifact records per query whether the
  * kill landed mid-query (`killed`) and whether the scheduler
  * acknowledged the loss (`executor_removed`) — a query that finishes
  * before enough tasks start yields `killed:false` and proves nothing,
  * so the gate also requires a minimum number of landed kills.
  *
  * Recovery is the standalone master relaunching a replacement
  * executor in the freed worker slot, so consecutive queries each get
  * a full-size cluster to damage. Usage:
  *
  *   runMain graft.FaultCheck <sfDir> [query,query,...]
  *
  * Env: SPARK_GRAFT_CLUSTER_MASTER (default local-cluster[2,4,2048]),
  * SPARK_GRAFT_CPUS (default 8), SPARK_GRAFT_FAULT_OUT (JSON path),
  * SPARK_GRAFT_KILL_AFTER (task launches before the kill, default 4).
  */
object FaultCheck {

  /** Multi-stage, shuffle-bearing queries whose lineage exercises the
    * kernels: TPC-H join tree (broadcast + shuffle joins), minhash
    * banding (codegen hash expressions feeding a shuffle), embedding
    * LSH (sign-table kernels + shuffle-hash verify join), the native
    * session-window physical plan — and a STATEFUL STREAM
    * (flatMapGroupsWithState via [[ClusterCheck.StreamChecks]]): the
    * micro-batch engine must survive losing an executor whose state
    * store partitions are mid-flight, reloading them from the
    * checkpoint's delta files on the surviving/replacement executor.
    */
  val DefaultSubset: Seq[String] = Seq(
    "q9_profit_proxy", "dedup_minhash", "dedup_embedding_lsh",
    "events_sessionize_native", "stream_gap_state",
  )

  /** Streaming pseudo-queries share ClusterCheck's resolvers so the
    * fault gate and the cross-JVM gate test the same entry points. */
  private def resolve(n: String): (SparkSession, String) => org.apache.spark.sql.DataFrame =
    ClusterCheck.StreamChecks.getOrElse(n, SparkEntry.queries(n))

  private def executorPids(appId: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val stream = Files.list(Paths.get("/proc"))
    try stream.iterator().asScala
      .filter(p => p.getFileName.toString.forall(_.isDigit))
      .flatMap { p =>
        try {
          val cmd = new String(Files.readAllBytes(p.resolve("cmdline")),
            StandardCharsets.UTF_8).replace('\u0000', ' ')
          if (cmd.contains("CoarseGrainedExecutorBackend") && cmd.contains(appId))
            Some(p.getFileName.toString.toLong)
          else None
        } catch { case _: Throwable => None }
      }.toSeq
    finally stream.close() // the 50 ms retry loop would leak an fd per poll
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.lift(1)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(DefaultSubset)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val clusterMaster =
      sys.env.getOrElse("SPARK_GRAFT_CLUSTER_MASTER", "local-cluster[2,4,2048]")
    val killAfter = sys.env.getOrElse("SPARK_GRAFT_KILL_AFTER", "4").toInt

    // control fingerprints: undisturbed single-JVM run
    val control = graft.gates.GateHarness.controlFingerprints(names, cpus, sfDir)(resolve)

    val spark = GraftSession.builderFor(clusterMaster, cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val appId = spark.sparkContext.applicationId
    val taskStarts = new AtomicInteger
    val removed = new AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskStart(t: SparkListenerTaskStart): Unit =
        taskStarts.incrementAndGet()
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit =
        removed.incrementAndGet()
    })

    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val results = names.map { n =>
      val startTasks = taskStarts.get()
      val startRemoved = removed.get()
      val fut = Future(ClusterCheck.fingerprint(
        resolve(n)(spark, sfDir).collect()))
      // wait for the query to be genuinely mid-flight, then pull the rug
      val deadline = System.nanoTime() + 60L * 1000000000L
      var killedPid = -1L
      while (killedPid < 0 && !fut.isCompleted && System.nanoTime() < deadline) {
        if (taskStarts.get() - startTasks >= killAfter) {
          // record a kill ONLY if the signal was actually delivered to a
          // live process — an executor that exited between the /proc
          // read and the destroy must not count (a false killed:true
          // would make the gate vacuous for this query); the delivery
          // rule is the spec-locked GateHarness.killAcknowledged
          executorPids(appId).headOption.foreach { pid =>
            if (graft.gates.GateHarness.killAcknowledged(pid)) killedPid = pid
          }
          if (killedPid < 0) Thread.sleep(50)
        } else Thread.sleep(20)
      }
      val fp = try Right(Await.result(fut, 10.minutes))
      catch { case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
      val execRemoved = removed.get() - startRemoved
      (n, fp, killedPid >= 0, execRemoved)
    }
    spark.stop()

    val perQuery = results.map { case (n, fp, killed, execRemoved) =>
      val verdict = fp match {
        case Right((rows, hash)) =>
          val (cr, chash) = control(n)
          if (rows == cr && hash == chash)
            s"""{"rows":$rows,"match":true,"killed":$killed,"executors_removed":$execRemoved}"""
          else
            s"""{"match":false,"killed":$killed,"rows":$rows,"control_rows":$cr}"""
        case Left(e) =>
          s"""{"match":false,"killed":$killed,"error":"${e.replace("\"", "'").take(200)}"}"""
      }
      n -> verdict
    }
    val failures = perQuery.count(!_._2.contains("\"match\":true"))
    val kills = results.count(_._3)
    graft.gates.GateHarness.artifact("fault_tolerance")
      .str("sf", sfDir).str("master", clusterMaster)
      .num("queries_checked", names.length.toLong).num("failures", failures.toLong)
      .num("kills", kills.toLong)
      .queries(perQuery)
      .emit("SPARK_GRAFT_FAULT_OUT", red = failures > 0 || kills == 0)
  }
}
