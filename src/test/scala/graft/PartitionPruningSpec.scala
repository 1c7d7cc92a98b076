package graft

import graft.ops.StationQueries
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Time-axis partition pruning: events stored date-partitioned (the
  * 100 TB layout from SURVEY §2B) must serve the station hot-path
  * queries by LISTING only in-range `dt=` directories — the Spark
  * analog of the reference's TimescaleDB chunk exclusion. Same proof
  * pattern as the IVF cell-pruning spec: assert on the scan's
  * PartitionFilters and on the actual file listing, not just on plan
  * strings.
  */
class PartitionPruningSpec extends SparkSpec {

  private val user = 7L
  private val start = "2024-01-05 00:00:00"
  private val end = "2024-01-08 00:00:00"

  test("date-partitioned events prune the scan to in-range dt directories") {
    val events = Tables.events(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_events_dt").toString
    Sources.writePartitioned(
      events.withColumn("dt", to_date(col("ts"))), dir, Seq("dt"))
    val part = spark.read.parquet(dir)

    // the partitioned read serves the same rows as the flat table
    val viaPart = StationQueries.rawStation(
      StationQueries.dtBounded(part, start, end), user, start, end)
      .drop("dt").collect().map(_.toSeq).toSeq
    val viaFlat = StationQueries.rawStation(events, user, start, end)
      .collect().map(_.toSeq).toSeq
    assert(viaPart === viaFlat && viaFlat.nonEmpty)

    // the scan plans a partition-pruned read: dt bounds land in
    // PartitionFilters and the file listing excludes out-of-range days
    val bounded = StationQueries.dtBounded(part, start, end)
      .filter(col("user_id") === user)
    val scan = bounded.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.metadata("PartitionFilters").contains("dt"),
      scan.metadata.mkString("\n"))
    // user_id stays a row-level pushed filter, not a partition filter
    assert(scan.metadata("PushedFilters").contains("user_id"),
      scan.metadata.mkString("\n"))
    val files = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).map(_.getPath.toString)
    val allDays = new java.io.File(dir).listFiles()
      .count(_.getName.startsWith("dt="))
    val keptDays = files.flatMap(_.split("/").find(_.startsWith("dt="))).distinct
    assert(files.nonEmpty && allDays > keptDays.size,
      s"expected pruning: $allDays days total, kept ${keptDays.size}")
    assert(keptDays.forall { d =>
      val day = d.stripPrefix("dt=")
      day >= "2024-01-05" && day <= "2024-01-08"
    }, keptDays.mkString(", "))
  }

  test("clustered write produces non-overlapping sort-key ranges per file") {
    import scala.jdk.CollectionConverters._
    val events = Tables.events(spark, sfDir).withColumn("dt", to_date(col("ts")))
    val dir = java.nio.file.Files.createTempDirectory("graft_clustered").toString
    Sources.writeClustered(events, dir, Seq("dt"), Seq("user_id"), numFiles = 24)
    // proof from the FOOTERS: within a partition dir, every file covers
    // a disjoint user_id slice — the property row-group skipping needs
    val conf = spark.sparkContext.hadoopConfiguration
    def userIdRange(f: java.io.File): (Long, Long) = {
      val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        val stats = rd.getFooter.getBlocks.asScala
          .flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == "user_id")
          .map(_.getStatistics)
        (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
          stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
      } finally rd.close()
    }
    val dayDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("dt="))
    val multiFileDays = dayDirs.map(d =>
      d -> d.listFiles().filter(_.getName.endsWith(".parquet"))).filter(_._2.length >= 2)
    assert(multiFileDays.nonEmpty, "need at least one partition with several files")
    multiFileDays.foreach { case (day, files) =>
      val ranges = files.map(userIdRange).sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, aMax), (bMin, _)) =>
          assert(bMin > aMax, s"${day.getName}: overlapping ranges $ranges")
        case _ =>
      }
    }
    // and the data is unchanged
    val a = Tables.events(spark, sfDir)
    val b = spark.read.parquet(dir).drop("dt")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("compaction bin-packs partition fragments without changing the data") {
    val events = Tables.events(spark, sfDir).withColumn("dt", to_date(col("ts")))
    val src = java.nio.file.Files.createTempDirectory("graft_frag").toString
    val dest = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // fragment: 4 writer tasks per partition dir
    events.repartition(4).write.mode("overwrite").partitionBy("dt").parquet(src)
    def filesPerDay(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("dt=")).map(d =>
        d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val before = filesPerDay(src)
    assert(before.values.max >= 4, before.toString)
    Sources.compactPartitions(spark, src, dest, Seq("dt"))
    val after = filesPerDay(dest)
    // huge default target vs tiny partitions → one file per partition
    assert(after.keySet === before.keySet)
    assert(after.values.forall(_ === 1), after.toString)
    // byte-identical row set (dt comes back as string partition value)
    val a = spark.read.parquet(src).drop("dt")
    val b = spark.read.parquet(dest).drop("dt")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("compaction handles multi-level (dt, hour) partitioning") {
    val events = Tables.events(spark, sfDir)
      .withColumn("dt", to_date(col("ts")))
      .withColumn("hr", format_string("%02d", hour(col("ts"))))
      .limit(2000)
    val src = java.nio.file.Files.createTempDirectory("graft_frag2").toString
    val dest = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    events.repartition(3).write.mode("overwrite")
      .partitionBy("dt", "hr").parquet(src)
    Sources.compactPartitions(spark, src, dest, Seq("dt", "hr"))
    def leafFiles(dir: String): Map[String, Int] = {
      val base = new java.io.File(dir)
      base.listFiles().filter(_.getName.startsWith("dt=")).flatMap(d =>
        d.listFiles().filter(_.getName.startsWith("hr=")).map(h =>
          s"${d.getName}/${h.getName}" ->
            h.listFiles().count(_.getName.endsWith(".parquet")))).toMap
    }
    val before = leafFiles(src)
    val after = leafFiles(dest)
    assert(after.keySet === before.keySet)
    assert(before.values.max > 1 && after.values.forall(_ === 1), after.toString)
    val a = spark.read.parquet(src).drop("dt", "hr")
    val b = spark.read.parquet(dest).drop("dt", "hr")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
