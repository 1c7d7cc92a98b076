package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Driver-crash recovery gate for the continuous-ingest path. The
  * StreamingSpec replay proofs run in ONE session: a stream finishes,
  * then a second query re-reads the committed checkpoint — which
  * proves offset idempotence but never the deployment failure mode, a
  * driver process dying MID-STREAM and a NEW process resuming from a
  * half-committed checkpoint. The dangerous window is specific:
  * foreachBatch's sink write has committed but the streaming commit
  * log has not recorded the batch — on resume the engine MUST replay
  * that batch, and a non-idempotent sink doubles it.
  *
  * Mechanism: stage a doc backlog, run the corpus-ingest stream
  * (micro-batch per file) in a CHILD JVM that `Runtime.halt()`s — no
  * shutdown hooks, a real crash — INSIDE batch k's foreachBatch, after
  * its writes are durable and before the engine records the batch in
  * the commit log (streaming.FaultInjection), so the resume is
  * GUARANTEED to replay batch k; then a SECOND child JVM resumes the
  * same checkpoint to completion. The resumed destination must equal
  * an undisturbed single-run control bit-for-bit, with doc_ids unique
  * — i.e. the sink guard absorbed the redelivery.
  *
  * Usage:   runMain graft.StreamCrashCheck <sfDir> [nBatches]
  * (child)  runMain graft.StreamCrashCheck --child <sfDir> <srcDir>
  *            <destPath> <ckptDir>   (+ GRAFT_CRASH_AFTER_BATCH env)
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_CRASH_OUT (JSON artifact path).
  */
object StreamCrashCheck {

  private val HaltExit = graft.streaming.FaultInjection.HaltExit

  def main(args: Array[String]): Unit =
    if (args.headOption.contains("--child")) child(args.drop(1)) else parent(args)

  private def child(args: Array[String]): Unit = {
    // the crash itself is injected by GRAFT_CRASH_AFTER_BATCH
    // (streaming.FaultInjection): halt() fires INSIDE foreachBatch,
    // after that batch's writes are durable and before the engine
    // records the batch in the commit log — the worst-case window.
    val Array(sfDir, srcDir, destPath, ckptDir) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builderFor(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val index = graft.ops.DedupServing.servedIndex(spark, sfDir)
    graft.streaming.CorpusStream.ingestOnce(spark, srcDir, index,
      destPath, ckptDir, maxFilesPerTrigger = 1)
    println("STREAM_CRASH_CHECK_COMPLETED")
    spark.stop()
    sys.exit(0)
  }

  private def fork(extraArgs: Seq[String], cpus: String,
                   crashAfterBatch: Long): (Int, String) = {
    val env = Map("SPARK_GRAFT_CPUS" -> cpus) ++
      (if (crashAfterBatch >= 0)
        Map("GRAFT_CRASH_AFTER_BATCH" -> crashAfterBatch.toString) else Map.empty)
    val r = graft.gates.GateHarness.fork("graft.StreamCrashCheck",
      "--child" +: extraArgs, heap = "4g", env = env, timeoutMinutes = 8)
    (r.exit, r.log)
  }

  private def parent(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val haltAfter = math.max(2, nBatches / 3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builderFor(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_stream_crash").toString

    // backlog: fresh ids, text perturbed so the stream does real
    // near-dup work (the StreamBench staging pattern)
    val docs = Tables.documents(spark, sfDir)
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val src = s"$work/src"
    docs.select((col("doc_id") + maxId + 1).as("doc_id"),
        concat(col("text"), lit(" streamed suffix")).as("text"))
      .repartition(nBatches).write.parquet(src)

    // control: one undisturbed in-process run
    val index = graft.ops.DedupServing.servedIndex(spark, sfDir)
    graft.streaming.CorpusStream.ingestOnce(spark, src, index,
      s"$work/ctrl_dest", s"$work/ctrl_ckpt", maxFilesPerTrigger = 1)
    val control = ClusterCheck.fingerprint(
      spark.read.parquet(s"$work/ctrl_dest").collect())

    // crash mid-stream (inside batch `haltAfter`'s post-write window),
    // then resume from the same checkpoint in a fresh process
    val dest = s"$work/dest"; val ckpt = s"$work/ckpt"
    val (crashExit, crashLog) = fork(Seq(sfDir, src, dest, ckpt), cpus, haltAfter)
    val crashed = graft.gates.GateHarness.crashedMidStream(
      crashExit, crashLog, HaltExit, "STREAM_CRASH_CHECK_COMPLETED")
    val (resumeExit, resumeLog) = fork(Seq(sfDir, src, dest, ckpt), cpus, -1L)
    val resumed = resumeExit == 0 && resumeLog.contains("STREAM_CRASH_CHECK_COMPLETED")

    val out = spark.read.parquet(dest)
    val (rows, hash) = ClusterCheck.fingerprint(out.collect())
    val distinctIds = out.select("doc_id").distinct().count()
    // control._1 > 0: a zero-row control would make the whole check
    // vacuous (nothing for the replayed batch to double)
    val matches = (rows, hash) == control && distinctIds == rows && control._1 > 0
    spark.stop()
    val red = !crashed || !resumed || !matches
    if (red)
      System.err.println(s"crash log tail:\n${crashLog.takeRight(1500)}\n" +
        s"resume log tail:\n${resumeLog.takeRight(1500)}")
    graft.gates.GateHarness.artifact("stream_crash_recovery")
      .str("sf", sfDir).num("n_batches", nBatches.toLong)
      .num("halt_after", haltAfter.toLong)
      .bool("crashed_mid_stream", crashed).bool("resumed", resumed)
      .num("rows", rows).num("control_rows", control._1)
      .num("distinct_ids", distinctIds).bool("match", matches)
      .emit("SPARK_GRAFT_CRASH_OUT", red = red)
  }
}
