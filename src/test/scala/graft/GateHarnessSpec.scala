package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import graft.gates.GateHarness

/** Spec-locks the shared gate plumbing (r11 verdict item 2) — every
  * property here is one that a real r11 gate-soundness bug lived in
  * when the plumbing was duplicated per gate: fork lifecycle (exit,
  * log, env, timeout-kill), kill acknowledgement, spill non-vacuity,
  * crash-in-window detection, and the canonical fingerprint the
  * cross-run comparisons all ride on.
  */
class GateHarnessSpec extends AnyFunSuite {

  test("fork: exit code, log capture, and env passthrough") {
    val r = GateHarness.fork("graft.gates.ForkProbe",
      Seq("7", "0", "GRAFT_PROBE_KEY"), heap = "64m",
      env = Map("GRAFT_PROBE_KEY" -> "probe-value"), timeoutMinutes = 2)
    assert(!r.timedOut)
    assert(r.exit === 7, r.log)
    assert(r.log.contains("GRAFT_PROBE_KEY=probe-value"), r.log)
  }

  test("fork: a wedged child is force-killed at the deadline, not hung") {
    val t0 = System.nanoTime()
    val r = GateHarness.fork("graft.gates.ForkProbe",
      Seq("0", "60000"), heap = "64m", timeoutMinutes = 0.05) // 3 s deadline
    val waited = (System.nanoTime() - t0) / 1e9
    assert(r.timedOut, s"child should have timed out (exit=${r.exit})")
    assert(waited < 30, f"fork must not wait out the child's sleep ($waited%.1f s)")
  }

  test("killAcknowledged: true only for a signal delivered to a live process") {
    val proc = new ProcessBuilder("sleep", "30").start()
    val pid = proc.pid()
    assert(GateHarness.killAcknowledged(pid), "live child: kill must be acknowledged")
    proc.waitFor(10, java.util.concurrent.TimeUnit.SECONDS)
    // the process is dead now — a second kill must NOT count (the r11
    // vacuous-kill accounting bug: counting undelivered kills made the
    // fault gate's killed:true meaningless)
    assert(!GateHarness.killAcknowledged(pid),
      "exited pid: kill must not be acknowledged")
  }

  test("spillNonVacuous: zero spill or any failure is not a green pressure run") {
    assert(GateHarness.spillNonVacuous(failures = 0, totalDiskSpillMb = 148))
    assert(!GateHarness.spillNonVacuous(failures = 0, totalDiskSpillMb = 0),
      "a run that never spilled proved nothing")
    assert(!GateHarness.spillNonVacuous(failures = 1, totalDiskSpillMb = 148))
  }

  test("crashedMidStream: only the injector's exit before completion counts") {
    val halt = 173
    assert(GateHarness.crashedMidStream(halt, "partial log", halt, "DONE_MARK"))
    assert(!GateHarness.crashedMidStream(0, "partial log", halt, "DONE_MARK"),
      "clean exit is not a crash")
    assert(!GateHarness.crashedMidStream(halt, "x DONE_MARK y", halt, "DONE_MARK"),
      "a child that printed completion never left a half-committed checkpoint")
    assert(!GateHarness.crashedMidStream(1, "oom", halt, "DONE_MARK"),
      "a non-injected death (OOM, segv) must not pass as the planned crash")
  }

  test("fingerprint: row-order-insensitive, null/NaN-stable, 9-sig-digit canonical") {
    val a = Array(Row(1L, "x", 1.0), Row(2L, null, Double.NaN))
    val b = Array(Row(2L, null, Double.NaN), Row(1L, "x", 1.0))
    assert(GateHarness.fingerprint(a) === GateHarness.fingerprint(b))
    // a last-ulp partition-reduction difference must not read as a bug
    val c = Array(Row(0.1 + 0.2))
    val d = Array(Row(0.3))
    assert(GateHarness.fingerprint(c) === GateHarness.fingerprint(d))
    // but a real value difference must
    assert(GateHarness.fingerprint(Array(Row(1L))) !==
      GateHarness.fingerprint(Array(Row(2L))))
  }

  test("artifact: committed field order and rendering") {
    val j = GateHarness.artifact("m")
      .str("sf", "dir").num("n", 3L).bool("ok", true).raw("t", "1.5")
      .queries(Seq("q1" -> """{"match":true}"""))
      .json
    assert(j === """{"metric":"m","sf":"dir","n":3,"ok":true,"t":1.5,""" +
      """"queries":{"q1":{"match":true}}}""")
  }

  test("artifact: str escapes quotes, backslashes, and control chars (r12 advisor)") {
    // Artifact is the ONE JSON emitter for every committed gate
    // artifact; a path value containing a quote/backslash/newline must
    // render as parseable JSON, not corrupt the artifact.
    val j = GateHarness.artifact("m").str("p", "a\"b\\c\nd").json
    assert(j === "{\"metric\":\"m\",\"p\":\"a\\\"b\\\\c\\u000ad\"}")
  }
}
