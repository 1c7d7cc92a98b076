package graft

import graft.sources.SnapshotTable
import org.apache.spark.sql.functions._

/** Contract tests for the snapshot-isolated table format: atomic
  * version publish, time travel, partition-level copy-on-write merge,
  * pinned-snapshot isolation, compaction, vacuum, and dead-commit
  * inertness.
  */
class SnapshotTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def rowsOf(path: String, v: Long = -1L): Set[(Long, String, Long)] =
    SnapshotTable.read(spark, path, v)
      .select("k", "part_col", "ord")
      .as[(Long, String, Long)].collect().toSet

  private def seed = Seq(
    (1L, "a", 1L), (2L, "a", 1L), (3L, "b", 1L), (4L, "b", 1L), (5L, "c", 1L)
  ).toDF("k", "part_col", "ord")

  test("create/read round-trip; append adds a version and time travel keeps the old one") {
    val t = tmpTable("graft_snap")
    assert(SnapshotTable.create(spark, t, seed, Seq("part_col")) === 1L)
    assert(rowsOf(t) === seed.as[(Long, String, Long)].collect().toSet)
    val v2 = SnapshotTable.append(spark, t,
      Seq((6L, "c", 2L)).toDF("k", "part_col", "ord"))
    assert(v2 === 2L)
    assert(rowsOf(t).size === 6)
    assert(rowsOf(t, 1L).size === 5, "version 1 must be unchanged")
    // partition column re-attaches and prunes
    val pruned = SnapshotTable.read(spark, t).filter(col("part_col") === "a")
    assert(pruned.count() === 2)
  }

  test("upsert rewrites ONLY affected partitions; untouched files carry forward by path") {
    val t = tmpTable("graft_snap_up")
    SnapshotTable.create(spark, t, seed, Seq("part_col"))
    val before = SnapshotTable.manifest(spark, t)
      .select("path", "part").as[(String, String)].collect().toMap
    // update key 1 (partition a), insert key 9 into new partition d
    val v2 = SnapshotTable.upsertKeepLast(spark, t,
      Seq((1L, "a", 5L), (9L, "d", 5L)).toDF("k", "part_col", "ord"),
      Seq("k", "part_col"), "ord")
    assert(v2 === 2L)
    val after = SnapshotTable.manifest(spark, t)
      .select("path", "part").as[(String, String)].collect().toMap
    // partitions b and c keep their exact old file paths
    val oldUntouched = before.filter { case (_, p) => p != "part_col=a" }
    assert(oldUntouched.toSet.subsetOf(after.toSet),
      "unaffected partitions must carry their old files forward")
    // partition a's files are new paths
    assert(after.filter(_._2 == "part_col=a").keySet
      .intersect(before.filter(_._2 == "part_col=a").keySet).isEmpty)
    val got = rowsOf(t)
    assert(got.contains((1L, "a", 5L)) && !got.contains((1L, "a", 1L)))
    assert(got.contains((9L, "d", 5L)) && got.size === 6)
    // old snapshot still reads the pre-merge state
    assert(rowsOf(t, 1L).contains((1L, "a", 1L)))
  }

  test("a pinned snapshot survives later commits untouched (isolation without locks)") {
    val t = tmpTable("graft_snap_iso")
    SnapshotTable.create(spark, t, seed, Seq("part_col"))
    val pinned = SnapshotTable.read(spark, t, 1L) // reader holds v1
    SnapshotTable.upsertKeepLast(spark, t,
      Seq((3L, "b", 9L)).toDF("k", "part_col", "ord"), Seq("k", "part_col"), "ord")
    SnapshotTable.compact(spark, t)
    // the pinned plan still evaluates to v1's content after two commits
    assert(pinned.select("k", "part_col", "ord").as[(Long, String, Long)]
      .collect().toSet === seed.as[(Long, String, Long)].collect().toSet)
  }

  test("compact folds to one commit branch with identical rows; vacuum reclaims history") {
    val t = tmpTable("graft_snap_cmp")
    SnapshotTable.create(spark, t, seed, Seq("part_col"))
    SnapshotTable.append(spark, t, Seq((6L, "a", 2L)).toDF("k", "part_col", "ord"))
    SnapshotTable.append(spark, t, Seq((7L, "b", 2L)).toDF("k", "part_col", "ord"))
    val beforeRows = rowsOf(t)
    val commitsBefore = SnapshotTable.manifest(spark, t)
      .select("path").as[String].collect()
      .map(_.split("/").take(2).mkString("/")).toSet
    assert(commitsBefore.size === 3)
    SnapshotTable.compact(spark, t)
    assert(rowsOf(t) === beforeRows)
    val commitsAfter = SnapshotTable.manifest(spark, t)
      .select("path").as[String].collect()
      .map(_.split("/").take(2).mkString("/")).toSet
    assert(commitsAfter.size === 1, "compaction must fold to one commit subtree")
    val deleted = SnapshotTable.vacuum(spark, t, keepVersions = 1)
    assert(deleted > 0)
    assert(rowsOf(t) === beforeRows, "latest must survive vacuum")
    assert(SnapshotTable.versions(spark, t) === Seq(4L))
    intercept[Exception](SnapshotTable.read(spark, t, 1L).collect())
  }

  test("an unpublished commit is invisible and vacuum reclaims it") {
    val t = tmpTable("graft_snap_dead")
    SnapshotTable.create(spark, t, seed, Seq("part_col"))
    // simulate a writer dying after its data write, before publish:
    // files land under data/ but no manifest names them
    seed.write.partitionBy("part_col")
      .parquet(s"$t/data/commit-deadbeef")
    assert(rowsOf(t).size === 5, "uncommitted files must be invisible")
    val deleted = SnapshotTable.vacuum(spark, t, keepVersions = 1)
    assert(deleted >= 3, "the dead commit's files must be reclaimed")
    assert(rowsOf(t).size === 5)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$t/data/commit-deadbeef")))
  }

  test("unpartitioned tables upsert as one unit and round-trip") {
    val t = tmpTable("graft_snap_flat")
    SnapshotTable.create(spark, t, seed.drop("part_col"))
    SnapshotTable.upsertKeepLast(spark, t,
      Seq((2L, 7L), (8L, 7L)).toDF("k", "ord"), Seq("k"), "ord")
    val got = SnapshotTable.read(spark, t).select("k", "ord")
      .as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (2L, 7L), (3L, 1L), (4L, 1L), (5L, 1L), (8L, 7L)))
  }
}
