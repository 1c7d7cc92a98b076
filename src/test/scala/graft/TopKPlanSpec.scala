package graft

import graft.ops.Analytics
import graft.plans.TopK
import org.apache.spark.sql.functions._

class TopKPlanSpec extends SparkSpec {
  import spark.implicits._

  test("custom TopKPerKey plan matches the window formulation exactly") {
    val part = Tables.part(spark, sfDir)
    val fast = Analytics.topKPerGroupFast(part).collect().map(_.toSeq)
    val window = Analytics.topKPerGroup(part).collect().map(_.toSeq)
    assert(fast.toSeq === window.toSeq)
  }

  test("physical plan contains TopKPerKeyExec and no Sort before it") {
    val part = Tables.part(spark, sfDir)
    val df = TopK.perKey(part, Seq(col("p_brand")),
      Seq(col("p_retailprice").desc, col("p_partkey").asc), 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(500))
    // the operator itself requires only clustering, not sortedness
    val belowTopK = plan.substring(plan.indexOf("TopKPerKey"))
    assert(!belowTopK.contains("Sort "), belowTopK.take(500))
  }

  test("heap eviction is correct on a skewed key and ties break by the sort order") {
    val df = Seq(
      ("hot", 10.0, 1L), ("hot", 10.0, 2L), ("hot", 30.0, 3L), ("hot", 20.0, 4L),
      ("hot", 50.0, 5L), ("hot", 40.0, 6L), ("cold", 1.0, 7L)
    ).toDF("k", "price", "id")
    val out = TopK.perKey(df, Seq(col("k")), Seq(col("price").desc, col("id").asc), 3)
      .select("k", "rnk", "id").as[(String, Long, Long)].collect().toSet
    assert(out === Set(
      ("hot", 1L, 5L), ("hot", 2L, 6L), ("hot", 3L, 3L),
      ("cold", 1L, 7L)))
  }
}
