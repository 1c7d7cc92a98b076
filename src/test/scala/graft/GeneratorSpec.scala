package graft

import graft.ops.{Generator, Ingest}
import org.apache.spark.sql.functions._

class GeneratorSpec extends SparkSpec {
  import spark.implicits._

  test("generator is deterministic and injects the configured duplicate rate") {
    val g1 = Generator.events(spark, 1000, stations = 5).cache()
    val g2 = Generator.events(spark, 1000, stations = 5)
    assert(g1.orderBy("record_id").collect().map(_.toSeq).toSeq ===
      g2.orderBy("record_id").collect().map(_.toSeq).toSeq)
    val st = Generator.status(g1).as[(Long, Long, Long)].head()
    assert(st._1 === 1000L)
    assert(st._2 === 200L) // ids 4,9,...,999
    assert(st._3 <= 5L)
    g1.unpersist()
  }

  test("injected duplicates replicate their source record exactly") {
    val g = Generator.events(spark, 100, stations = 3).cache()
    val dups = g.filter(col("is_injected_dup"))
      .select("record_id", "station_id", "ts", "temperature")
    val matched = dups.alias("d").join(
      g.filter(!col("is_injected_dup")).alias("s"),
      col("d.record_id") - 1 === col("s.record_id") &&
        col("d.station_id") === col("s.station_id") &&
        col("d.ts") === col("s.ts") &&
        col("d.temperature") === col("s.temperature"))
    assert(matched.count() === dups.count())
    g.unpersist()
  }

  test("generated duplicates are removed by the dedup operator") {
    val g = Generator.events(spark, 500)
      .select(col("record_id").as("event_id"), col("ts"),
        expr("cast(substr(station_id, 8) as long)").as("user_id"),
        lit("click").as("event_type"), col("temperature").as("value"),
        lit("{}").as("props"))
    val before = g.count()
    val after = Ingest.dedupKeepLast(g).count()
    assert(after < before)
    assert(after === g.select("user_id", "ts").distinct().count())
  }
}
