package graft.gates

import org.apache.spark.sql.{Row, SparkSession}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** The one home for the scaffolding every resilience/equivalence gate
  * used to carry privately (r11 verdict item 2: ClusterCheck,
  * FaultCheck, PressureCheck, StreamCrashCheck, Soak and the CI specs
  * each had their own fork/env/fingerprint/JSON-emit plumbing — and
  * all three of r11's own gate-soundness bugs lived in exactly that
  * duplicated plumbing, not in the engine). Each gate is now a config
  * over four shared pieces:
  *
  *  - [[fork]]: run a repo main in a child JVM with the JDK-17 module
  *    openings, the session props, a bounded wait, and the harness env
  *    (SPARK_GRAFT_CPUS / GRAFT_SERVE_ROOT / gate-specific extras) —
  *    the LocalClusterSpec pattern, previously re-typed four times;
  *  - [[fingerprint]]: the canonical order-insensitive result hash all
  *    cross-run comparisons share (numeric cells canonicalized to 9
  *    significant digits so a last-ulp partition-reduction difference
  *    cannot masquerade as a serialization bug);
  *  - [[controlFingerprints]]: the undisturbed single-JVM control run
  *    (build local session → fingerprint each query → stop → clear the
  *    stopped singleton so the next builder cannot hand it back);
  *  - [[Artifact]]: ordered-field JSON emit (print + optional env-named
  *    file + red exit), so every gate's artifact keeps its committed
  *    byte shape.
  *
  * The gate-soundness PREDICATES — the rules that make a green run
  * non-vacuous — are also here as pure functions with their own specs
  * (GateHarnessSpec), because each was the site of an r11 bug:
  * [[killAcknowledged]] (a kill only counts if the signal was delivered
  * to a live process), [[spillNonVacuous]] (a pressure run that never
  * spilled proves nothing), [[crashedMidStream]] (a child that ran to
  * completion never exercised the redelivery window).
  */
object GateHarness {

  /** Outcome of a forked child JVM: exit code, merged stdout+stderr,
    * and whether the bounded wait expired (the child is force-killed
    * on timeout — a wedged gate must fail, not hang CI).
    */
  final case class ForkResult(exit: Int, log: String, timedOut: Boolean)

  /** Fork `mainClass` from THIS JVM's classpath into a child JVM with
    * the standard session flags. `inheritServeRoot` forwards
    * GRAFT_SERVE_ROOT when the parent has one (the isolated-layout
    * contract: a forked gate must never vacuum layouts a concurrent
    * suite is serving from); `env` entries win over the inherited one.
    */
  def fork(mainClass: String, args: Seq[String], heap: String = "4g",
           env: Map[String, String] = Map.empty,
           timeoutMinutes: Double = 10,
           inheritServeRoot: Boolean = true): ForkResult = {
    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cmd = Seq(javaBin) ++ graft.GraftSession.jdk17AddOpens.split(" ").toSeq ++ Seq(
      s"-Xmx$heap", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"), mainClass) ++ args
    val pb = new ProcessBuilder(cmd: _*)
    if (inheritServeRoot)
      sys.env.get("GRAFT_SERVE_ROOT").foreach(pb.environment().put("GRAFT_SERVE_ROOT", _))
    env.foreach { case (k, v) => pb.environment().put(k, v) }
    pb.redirectErrorStream(true)
    val proc = pb.start()
    // drain concurrently with the wait: a child that fills the pipe
    // buffer would deadlock a read-after-wait implementation
    val logRef = new java.util.concurrent.atomic.AtomicReference[String]("")
    val drain = new Thread(() => logRef.set(
      new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)))
    drain.setDaemon(true)
    drain.start()
    val finished = proc.waitFor((timeoutMinutes * 60000).toLong,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    if (!finished) proc.destroyForcibly().waitFor()
    drain.join(10000)
    ForkResult(if (finished) proc.exitValue() else -1, logRef.get(), !finished)
  }

  /** Canonical, order-insensitive fingerprint of a collected result. */
  def fingerprint(rows: Array[Row]): (Long, String) = {
    def cell(v: Any): String = v match {
      case null => "∅"
      case d: Double => if (d.isNaN) "NaN" else f"$d%.9e"
      case f: Float => if (f.isNaN) "NaN" else f"${f.toDouble}%.9e"
      case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
      case s: scala.collection.Seq[_] => s.map(cell).mkString("[", ",", "]")
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, v) => s"${cell(k)}→${cell(v)}" }.toSeq.sorted.mkString("{", ",", "}")
      case r: Row => r.toSeq.map(cell).mkString("(", ",", ")")
      case other => other.toString
    }
    val rendered = rows.map(_.toSeq.map(cell).mkString("|")).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rendered.foreach(r => md.update(r.getBytes(StandardCharsets.UTF_8)))
    (rows.length.toLong, md.digest().map("%02x".format(_)).mkString)
  }

  /** Undisturbed single-JVM control run: fingerprint each named query
    * under `local[cpus]`, then stop the session AND clear the stopped
    * singleton (the builder would otherwise hand the dead context back
    * to the gate's next, differently-mastered session).
    */
  def controlFingerprints(names: Seq[String], cpus: String, sfDir: String)
                         (resolve: String => (SparkSession, String) => org.apache.spark.sql.DataFrame)
      : Map[String, (Long, String)] = {
    val s = graft.GraftSession.builderFor(s"local[$cpus]", cpus).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val out =
      try names.map(n => n -> fingerprint(resolve(n)(s, sfDir).collect())).toMap
      finally s.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    out
  }

  /** Ordered-field JSON artifact: assembled exactly in insertion order
    * (gates commit their artifact SHAPE, so field order is part of the
    * contract), printed as the gate's one stdout line, mirrored to the
    * file named by `outPathEnv` when that env var is set.
    */
  final class Artifact(metric: String) {
    private val fields = scala.collection.mutable.LinkedHashMap[String, String](
      "metric" -> s""""$metric"""")
    // JSON string escaping (r12 advisor): Artifact is the single JSON
    // emitter for every gate artifact, and values like sfDir/master are
    // caller-supplied paths — a quote or backslash in one must not
    // produce an unparseable committed artifact.
    private def jsonEscape(v: String): String = v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < 0x20 => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def str(k: String, v: String): Artifact = { fields(k) = s""""${jsonEscape(v)}"""" ; this }
    def raw(k: String, v: String): Artifact = { fields(k) = v; this }
    def num(k: String, v: Long): Artifact = raw(k, v.toString)
    def num(k: String, v: Double, fmt: String = "%.1f"): Artifact =
      raw(k, fmt.format(v))
    def bool(k: String, v: Boolean): Artifact = raw(k, v.toString)
    /** per-query sub-object from already-rendered JSON verdicts */
    def queries(perQuery: Seq[(String, String)]): Artifact =
      raw("queries", perQuery.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}"))
    def json: String = fields.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    /** Print, mirror to `$outPathEnv` if set, exit(1) when `red`. */
    def emit(outPathEnv: String, red: Boolean): Unit = {
      println(json)
      sys.env.get(outPathEnv).foreach(p =>
        Files.write(Paths.get(p), (json + "\n").getBytes(StandardCharsets.UTF_8)))
      if (red) sys.exit(1)
    }
  }
  def artifact(metric: String): Artifact = new Artifact(metric)

  // ---- gate-soundness predicates (spec-locked in GateHarnessSpec) ----

  /** A kill counts only if the SIGKILL was DELIVERED to a live process:
    * `ProcessHandle.destroyForcibly` on an already-exited pid returns
    * false, and counting it would make the fault gate vacuous for that
    * query (the r11 vacuous-kill accounting bug).
    */
  def killAcknowledged(pid: Long): Boolean =
    java.lang.ProcessHandle.of(pid)
      .map[java.lang.Boolean](h => h.destroyForcibly())
      .orElse(java.lang.Boolean.FALSE)

  /** A pressure run is sound only if it completed clean AND actually
    * spilled: zero disk spill means the starved executors never hit
    * the pressure path and the gate proved nothing.
    */
  def spillNonVacuous(failures: Int, totalDiskSpillMb: Long): Boolean =
    failures == 0 && totalDiskSpillMb > 0

  /** A stream-crash child exercised the redelivery window only if it
    * died with the injector's exit code BEFORE printing its completion
    * marker — a child that ran to completion (or died some other way)
    * never left a half-committed checkpoint to resume.
    */
  def crashedMidStream(exit: Int, log: String, haltExit: Int,
                       completionMarker: String): Boolean =
    exit == haltExit && !log.contains(completionMarker)
}

/** Tiny child-JVM used only by GateHarnessSpec to exercise [[GateHarness.fork]]
  * end-to-end (exit code, log capture, env passthrough, timeout kill)
  * without paying for a SparkSession: `args = <exitCode> [sleepMs]
  * [envKeysToEcho...]`.
  */
object ForkProbe {
  def main(args: Array[String]): Unit = {
    val exit = args.headOption.map(_.toInt).getOrElse(0)
    val sleepMs = args.lift(1).map(_.toLong).getOrElse(0L)
    args.drop(2).foreach(k => println(s"$k=${sys.env.getOrElse(k, "<unset>")}"))
    if (sleepMs > 0) Thread.sleep(sleepMs)
    sys.exit(exit)
  }
}
