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
}
