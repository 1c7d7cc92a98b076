package graft

import graft.sources.ResultCache
import org.apache.spark.sql.functions._

/** Contract tests for the TTL'd materialized result cache: hit
  * short-circuits compute, expiry recomputes, invalidation forces a
  * miss, keys are canonical over params, and every path is a
  * correctness no-op vs the uncached query.
  */
class ResultCacheSpec extends SparkSpec {
  import spark.implicits._

  private def root(): String =
    java.nio.file.Files.createTempDirectory("graft_rescache").toString

  test("key is canonical: same query+params in any order, distinct otherwise") {
    val a = ResultCache.keyOf("SELECT 1", Seq("p1=2024-01-01", "p2=42"))
    val b = ResultCache.keyOf("SELECT 1", Seq("p2=42", "p1=2024-01-01"))
    val c = ResultCache.keyOf("SELECT 1", Seq("p2=43", "p1=2024-01-01"))
    val d = ResultCache.keyOf("SELECT 2", Seq("p1=2024-01-01", "p2=42"))
    assert(a === b)
    assert(a != c && a != d)
    assert(a.matches("[0-9a-f]{64}"))
  }

  test("hit within TTL short-circuits compute; expiry and invalidation recompute") {
    val dir = root()
    var clock = 1000L
    var computes = 0
    def cached(): org.apache.spark.sql.DataFrame =
      ResultCache.getOrCompute(spark, dir, ResultCache.keyOf("q", Seq("a")),
        ttlMs = 300000L, nowMs = () => clock) {
        computes += 1
        Seq((1L, "x"), (2L, "y")).toDF("k", "v")
      }
    val first = cached().as[(Long, String)].collect().toSet
    assert(computes === 1 && first === Set((1L, "x"), (2L, "y")))
    // second call inside the TTL: served from parquet, compute not run
    clock += 200000L
    assert(cached().as[(Long, String)].collect().toSet === first)
    assert(computes === 1, "a fresh entry must short-circuit the compute")
    // past the TTL: recompute and re-publish
    clock += 200000L
    assert(cached().as[(Long, String)].collect().toSet === first)
    assert(computes === 2, "an expired entry must recompute")
    // explicit invalidation forces a miss even inside the TTL
    assert(ResultCache.invalidate(spark, dir, ResultCache.keyOf("q", Seq("a"))))
    clock += 1000L
    assert(cached().as[(Long, String)].collect().toSet === first)
    assert(computes === 3, "invalidation must force a recompute")
  }

  test("cache round-trips a real query identically (correctness no-op)") {
    val dir = root()
    val ev = Tables.events(spark, sfDir)
    def agg() = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
    val direct = agg().as[(String, Long, Double)].collect().toSet
    val viaCache = ResultCache.getOrCompute(spark, dir,
      ResultCache.keyOf("agg_by_type", Seq(sfDir)), ttlMs = 60000L)(agg())
      .as[(String, Long, Double)].collect().toSet
    assert(viaCache === direct)
    // and the hit path too
    val viaHit = ResultCache.getOrCompute(spark, dir,
      ResultCache.keyOf("agg_by_type", Seq(sfDir)), ttlMs = 60000L)(
        sys.error("must not recompute"))
      .as[(String, Long, Double)].collect().toSet
    assert(viaHit === direct)
  }

  test("distinct params cache independently; clear drops everything") {
    val dir = root()
    var computes = 0
    def q(p: String) = ResultCache.getOrCompute(spark, dir,
      ResultCache.keyOf("q", Seq(p)), ttlMs = 60000L) {
      computes += 1; Seq(p).toDF("p")
    }
    q("a"); q("b"); q("a")
    assert(computes === 2, "one compute per distinct param set")
    ResultCache.clear(spark, dir)
    q("a")
    assert(computes === 3, "clear must empty the cache")
  }
}
