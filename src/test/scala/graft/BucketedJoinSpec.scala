package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Co-located join via bucketing: both sides pre-shuffled on the join
  * key at write time ⇒ the join plan contains no Exchange. The
  * shuffle-once-read-many layout for 100 TB fact tables.
  */
class BucketedJoinSpec extends SparkSpec {

  test("join of two bucketed tables runs without a shuffle") {
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate", "o_totalprice")
    Sources.writeBucketed(li, "li_b", s"$dir/li", "l_orderkey", 4, Some("l_orderkey"))
    Sources.writeBucketed(ord, "ord_b", s"$dir/ord", "o_orderkey", 4, Some("o_orderkey"))

    // hint("merge"): at this tiny SF AQE would broadcast (which ignores
    // bucketing); at real scale both sides exceed the threshold and the
    // sort-merge path below is what runs — with NO shuffle exchange.
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(800))
    assert(!plan.contains("Exchange"), plan.take(800))

    // and it computes the same result as the unbucketed join
    val expect = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
    assert(joined.orderBy("l_orderkey").collect().map(_.toSeq).toSeq ===
      expect.orderBy("l_orderkey").collect().map(_.toSeq).toSeq)

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
