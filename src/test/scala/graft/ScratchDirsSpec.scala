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
}
