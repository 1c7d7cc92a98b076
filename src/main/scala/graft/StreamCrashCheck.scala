package graft

import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

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
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd = Seq(javaBin) ++ GraftSession.jdk17AddOpens.split(" ").toSeq ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), "graft.StreamCrashCheck", "--child") ++ extraArgs
    val pb = new ProcessBuilder(cmd: _*)
    pb.environment().put("SPARK_GRAFT_CPUS", cpus)
    if (crashAfterBatch >= 0)
      pb.environment().put("GRAFT_CRASH_AFTER_BATCH", crashAfterBatch.toString)
    sys.env.get("GRAFT_SERVE_ROOT").foreach(pb.environment().put("GRAFT_SERVE_ROOT", _))
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val log = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
    proc.waitFor()
    (proc.exitValue(), log)
  }

  private def parent(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(8)
    val haltAfter = math.max(2, nBatches / 3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val outPath = sys.env.get("SPARK_GRAFT_CRASH_OUT")
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
    val crashed = crashExit == HaltExit && !crashLog.contains("STREAM_CRASH_CHECK_COMPLETED")
    val (resumeExit, resumeLog) = fork(Seq(sfDir, src, dest, ckpt), cpus, -1L)
    val resumed = resumeExit == 0 && resumeLog.contains("STREAM_CRASH_CHECK_COMPLETED")

    val out = spark.read.parquet(dest)
    val (rows, hash) = ClusterCheck.fingerprint(out.collect())
    val distinctIds = out.select("doc_id").distinct().count()
    // control._1 > 0: a zero-row control would make the whole check
    // vacuous (nothing for the replayed batch to double)
    val matches = (rows, hash) == control && distinctIds == rows && control._1 > 0
    val json =
      s"""{"metric":"stream_crash_recovery","sf":"$sfDir","n_batches":$nBatches,""" +
        s""""halt_after":$haltAfter,"crashed_mid_stream":$crashed,"resumed":$resumed,""" +
        s""""rows":$rows,"control_rows":${control._1},"distinct_ids":$distinctIds,""" +
        s""""match":$matches}"""
    println(json)
    outPath.foreach(p => Files.write(Paths.get(p), (json + "\n").getBytes(StandardCharsets.UTF_8)))
    spark.stop()
    if (!crashed || !resumed || !matches) {
      System.err.println(s"crash log tail:\n${crashLog.takeRight(1500)}\n" +
        s"resume log tail:\n${resumeLog.takeRight(1500)}")
      sys.exit(1)
    }
  }
}
