package graft

import graft.ops.Skew
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSkewSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("station_id", StringType),
    StructField("temperature", DoubleType),
    StructField("_corrupt_record", StringType)))

  test("jsonl source routes malformed records to _corrupt_record (DLQ analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.jsonl"),
      """{"station_id":"s1","temperature":20.5}
        |{"station_id":"s2","temperature":"NOT_A_NUMBER"}
        |not json at all""".stripMargin)
    val df = Sources.jsonl(spark, dir, schema).cache()
    assert(df.count() === 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() === 2)
    assert(df.filter(col("station_id") === "s1").count() === 1)
    df.unpersist()
  }

  test("partitioned writer produces date-prunable layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Tables.events(spark, sfDir).withColumn("date", to_date(col("ts")))
    Sources.writePartitioned(ev, dir, Seq("date"))
    val back = spark.read.parquet(dir).filter(col("date") === "2024-01-05")
    val plan = back.queryExecution.executedPlan.toString
    assert(back.count() > 0)
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("date=")))
    // the date predicate must prune partitions at planning, not scan+filter
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(date"), plan.take(900))
  }

  test("salted sum equals plain sum") {
    val ev = Tables.events(spark, sfDir)
    val salted = Skew.saltedSum(ev, col("event_type"), col("value"))
      .select("key", "n").as[(String, Long)].collect().toMap
    val plain = ev.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    assert(salted === plain)
  }

  test("salted join equals plain join") {
    val ev = Tables.events(spark, sfDir)
    val dim = Seq(("click", 1.0), ("view", 0.5), ("purchase", 5.0),
      ("signup", 2.0), ("error", 0.0)).toDF("event_type", "weight")
    val a = Skew.saltedJoin(ev, dim, "event_type").agg(sum("weight")).head().getDouble(0)
    val b = ev.join(dim, "event_type").agg(sum("weight")).head().getDouble(0)
    assert(a === b)
  }
}
