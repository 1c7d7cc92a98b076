package graft

import graft.sources.ScratchDirs

/** Contract of the shared scratch-root helper (r13 verdict item 3: the
  * sliced LSH verify's spill dirs must be cluster-visible — executors
  * write them, later jobs read them back). The GRAFT_SCRATCH +
  * cross-JVM path is driven by LocalClusterSpec's forked sliced-verify
  * run (env vars cannot be set in-process); this spec locks the local
  * fallback and the eager-release semantics.
  */
class ScratchDirsSpec extends SparkSpec {

  test("local-master fallback acquires a live dir; release reclaims it eagerly") {
    val root = ScratchDirs.acquire(spark, "graft-scratch-spec")
    val p = java.nio.file.Paths.get(root)
    assert(java.nio.file.Files.isDirectory(p), s"acquired root $root must exist")
    // a second acquire never collides with the first
    val root2 = ScratchDirs.acquire(spark, "graft-scratch-spec")
    assert(root2 !== root)
    // eager release removes the tree (a subpath release works too —
    // the sliced verify reclaims its dead pairs/ subtree mid-call)
    java.nio.file.Files.createDirectories(p.resolve("pairs"))
    java.nio.file.Files.write(p.resolve("pairs/part-0"), Array[Byte](1, 2, 3))
    ScratchDirs.release(spark, s"$root/pairs")
    assert(java.nio.file.Files.isDirectory(p) &&
      !java.nio.file.Files.exists(p.resolve("pairs")),
      "subtree release must reclaim only the subtree")
    ScratchDirs.release(spark, root)
    ScratchDirs.release(spark, root2)
    assert(!java.nio.file.Files.exists(p), "released root must be gone")
    // releasing an already-released root is a no-op, not an error
    ScratchDirs.release(spark, root)
  }

  test("localUsableBytes reports the single-host scratch volume under a local master") {
    // local master, no GRAFT_SCRATCH in the test JVM: the probe must
    // see the java.io.tmpdir volume and report a positive byte count —
    // this is what lets the sliced verify self-size its slice budget
    // to the disk it actually spills on (r14: a fleet-sized 16 M-pair
    // slice out-sized a lone box's free space; the self-sized budget
    // completes). The cluster-FS None branch is driven by scheme
    // inspection alone, so it is locked here too via the env-shaped
    // resolution order: an explicit override always wins upstream.
    assume(sys.env.get("GRAFT_SCRATCH").forall(_.trim.isEmpty))
    val b = ScratchDirs.localUsableBytes(spark)
    assert(b.exists(_ > 0L),
      s"local master must probe the temp volume, got $b")
    // and the derived slice budget stays within [1 M, 16 M] pairs
    val budget = math.max(1000000L, math.min(16000000L, b.get / 3 / 3000L))
    assert(budget >= 1000000L && budget <= 16000000L)
  }
}
