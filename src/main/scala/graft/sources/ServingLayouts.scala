package graft.sources

import java.nio.file.{Files, Path, Paths}

/** Stable on-disk homes for serving-layer index layouts (the persisted
  * artifacts behind AnnServing / DedupServing — cf. the reference's
  * long-lived Redis/DB state, services/query/main.py:66-79, here
  * re-expressed as parquet layouts).
  *
  * Before round 9, each serving cache built its layout into a fresh
  * `createTempDirectory` per JVM: correct, process-stable within a run,
  * but every new process re-paid the corpus-sized build AND left the
  * previous run's layout stranded in /tmp forever. This helper gives
  * each (kind, corpus-dir) pair ONE deterministic directory under the
  * system temp dir, namespaced by OS user so shared hosts don't
  * collide:
  *
  * {{{ <java.io.tmpdir>/graft-serve-<user>/<kind>-<md5(corpus).12> }}}
  *
  * Lifecycle contract:
  *  - Builders stage into the directory and call [[markComplete]] LAST;
  *    readers treat the layout as reusable only when the marker exists
  *    (a crashed half-build is rebuilt, never trusted).
  *  - [[touch]] on every reuse keeps the marker's mtime fresh, so
  *    [[vacuum]] (age-based reclaim of whole layout dirs) only removes
  *    layouts no process has served from within the retention window —
  *    the same owner-cadence retention trade as SnapshotTable.vacuum
  *    and vacuumIvfVersions.
  *
  * Layout dirs are keyed by (corpus directory, its mtime): rewriting a
  * table inside the corpus dir updates the dir's mtime (overwrite
  * replaces the table subdir), which moves the layout home — so a
  * REGENERATED corpus can never be served from the previous content's
  * index, and the superseded layout ages out via [[vacuum]]. Growth is
  * bounded: one dir per (kind, corpus version), regardless of how many
  * gate/bench/test processes run.
  */
object ServingLayouts {

  private val Marker = "_layout_complete"

  /** Per-user root — deterministic across processes. */
  def root: Path =
    Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft-serve-" + sys.props.getOrElse("user.name", "anon"))

  private def digest(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString

  /** The stable layout directory for (kind, corpusDir) — created if
    * absent, same path in every JVM while the corpus dir's content
    * version (mtime) is unchanged.
    */
  def dirFor(kind: String, corpusDir: String): String = {
    val stamp =
      try Files.getLastModifiedTime(Paths.get(corpusDir)).toMillis.toString
      catch { case _: java.io.IOException => "0" }
    val d = root.resolve(s"$kind-${digest(s"$corpusDir@$stamp")}")
    Files.createDirectories(d)
    d.toString
  }

  /** True iff a prior build finished (marker present). */
  def isComplete(dir: String): Boolean =
    Files.exists(Paths.get(dir, Marker))

  /** Publish the layout as reusable — call only after every file of the
    * layout is on disk.
    */
  def markComplete(dir: String): Unit = {
    val m = Paths.get(dir, Marker)
    if (!Files.exists(m)) Files.createFile(m)
    touch(dir)
  }

  /** Strip the marker before a rebuild overwrites the layout in place,
    * so no other process trusts a half-overwritten directory.
    */
  def invalidate(dir: String): Unit =
    Files.deleteIfExists(Paths.get(dir, Marker))

  /** Refresh the marker mtime so [[vacuum]] sees the layout as live. */
  def touch(dir: String): Unit = {
    val m = Paths.get(dir, Marker)
    if (Files.exists(m))
      Files.setLastModifiedTime(m,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
  }

  /** Reclaim layout dirs not served from within `maxAgeMs` (marker
    * mtime too old) — and half-built dirs with NO marker older than
    * `maxAgeMs` by directory mtime (a crashed build's debris). Returns
    * the number of layout dirs deleted. Safe to run on the owner's
    * cadence; a concurrent reader of a reclaimed layout fails its next
    * scan and rebuilds — same trade as every retention GC in the repo.
    */
  def vacuum(maxAgeMs: Long, nowMs: Long = System.currentTimeMillis()): Int = {
    if (!Files.exists(root)) return 0
    val dirs = Files.list(root).toArray.toSeq.map(_.asInstanceOf[Path])
      .filter(Files.isDirectory(_))
    var deleted = 0
    dirs.foreach { d =>
      val marker = d.resolve(Marker)
      val stampPath = if (Files.exists(marker)) marker else d
      val age = nowMs - Files.getLastModifiedTime(stampPath).toMillis
      if (age > maxAgeMs) { deleteRecursively(d); deleted += 1 }
    }
    deleted
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).toArray.toSeq.map(_.asInstanceOf[Path]).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
