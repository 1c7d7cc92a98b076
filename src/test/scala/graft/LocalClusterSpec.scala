package graft

/** CI gate for cross-JVM execution (r10 verdict item 1): forks
  * `graft.ClusterCheck` as a SEPARATE process (its own driver JVM,
  * which itself spawns `local-cluster[2,4,2048]` executor processes)
  * and asserts every kernel-heavy query produces identical results
  * under real process-boundary serialization and under `local[N]`.
  *
  * A subprocess — not an in-suite session — because the suite JVM
  * already holds a shared `local[4]` SparkContext (one context per JVM)
  * and because a forked driver is exactly the topology a user gets.
  * SPARK_GRAFT_CLUSTER_FRESH=1 vacuums serving layouts first so the
  * executor-side BUILD path runs, not just the reload path.
  */
class LocalClusterSpec extends SparkSpec {

  test("kernel-heavy subset matches bit-for-bit between local-cluster and local masters") {
    val out = java.io.File.createTempFile("graft_cluster_check", ".json")
    out.deleteOnExit()
    // an ISOLATED serving-layout root: every layout is BUILT by the
    // subprocess's remote executors (nothing to reload), and its
    // builds/vacuums can never touch layouts the concurrently-running
    // suites in THIS process are serving from (suite parallelism
    // shares the per-user root)
    val serveRoot = java.nio.file.Files.createTempDirectory("graft_cluster_serve")
    val r = graft.gates.GateHarness.fork("graft.ClusterCheck", Seq(sfDir),
      heap = "4g", timeoutMinutes = 10,
      env = Map(
        "SPARK_GRAFT_CPUS" -> "4",
        "GRAFT_SERVE_ROOT" -> serveRoot.toString,
        "SPARK_GRAFT_CLUSTER_OUT" -> out.getAbsolutePath))
    if (r.timedOut) fail(s"ClusterCheck timed out.\n${r.log.takeRight(4000)}")
    assert(r.exit === 0,
      s"ClusterCheck reported mismatches or crashed:\n${r.log.takeRight(4000)}")
    val json = new String(java.nio.file.Files.readAllBytes(out.toPath))
    assert(json.contains("\"failures\":0"), s"artifact shows failures: $json")
    assert(json.contains("\"queries_checked\":" + ClusterCheck.DefaultSubset.length))
  }

  test("sliced LSH verify agrees across JVMs through a shared GRAFT_SCRATCH root") {
    // r13 verdict item 3: the sliced exact-verify's spill dirs are
    // written by EXECUTORS and read back by later driver jobs, so the
    // scratch root must be a filesystem every process sees. This forks
    // ClusterCheck on dedup_embedding_lsh alone with the slice budget
    // forced far below the gate corpus's candidate mass (~200k pairs →
    // a real multi-slice loop) and GRAFT_SCRATCH pointing at a shared
    // dir: pass 1 (local-cluster — executor child processes) and pass 2
    // (local) must fingerprint identically, which proves driver and
    // executors agreed on the spill location in both topologies.
    val scratch = java.nio.file.Files.createTempDirectory("graft_scratch_x")
    val out = java.io.File.createTempFile("graft_sliced_check", ".json")
    out.deleteOnExit()
    val r = graft.gates.GateHarness.fork("graft.ClusterCheck",
      Seq(sfDir, "dedup_embedding_lsh"),
      heap = "4g", timeoutMinutes = 10,
      env = Map(
        "SPARK_GRAFT_CPUS" -> "4",
        "GRAFT_SCRATCH" -> scratch.toString,
        "GRAFT_LSH_VERIFY_SLICE_PAIRS" -> "60000",
        "SPARK_GRAFT_CLUSTER_OUT" -> out.getAbsolutePath))
    if (r.timedOut) fail(s"sliced ClusterCheck timed out.\n${r.log.takeRight(4000)}")
    assert(r.exit === 0, s"sliced cross-JVM check failed:\n${r.log.takeRight(4000)}")
    val json = new String(java.nio.file.Files.readAllBytes(out.toPath))
    assert(json.contains("\"failures\":0"), s"artifact shows failures: $json")
    // the child's exit hook reclaims every acquired root: nothing of
    // the verify spill may survive the process
    val s = java.nio.file.Files.list(scratch)
    val leftover = try s.toArray.toSeq finally s.close()
    assert(leftover.isEmpty, s"scratch roots leaked past JVM exit: $leftover")
  }
}
