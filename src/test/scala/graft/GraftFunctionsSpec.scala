package graft

import graft.functions.GraftFunctions

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT
        |  simhash64(split('alpha beta gamma', ' ')) AS sh,
        |  size(shingle_hashes(split('a b c d', ' '), 3)) AS nsh,
        |  size(minhash_sig(shingle_hashes(split('a b c d', ' '), 3), 8)) AS nmh,
        |  size(band_keys(minhash_sig(shingle_hashes(split('a b c d', ' '), 3), 8), 4, 2)) AS nbk,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  vec_norm2(array(3.0D, 4.0D)) AS n2,
        |  size(hyperplane_bands(array(1.0D, -2.0D, 0.5D), 4, 4)) AS nhp
        |""".stripMargin).collect().head
    assert(row.getAs[Long]("sh") !== 0L)
    assert(row.getAs[Int]("nsh") === 2)
    assert(row.getAs[Int]("nmh") === 8)
    assert(row.getAs[Int]("nbk") === 4)
    assert(row.getAs[Double]("dot") === 11.0)
    assert(row.getAs[Double]("n2") === 25.0)
    assert(row.getAs[Int]("nhp") === 4)
  }

  test("SQL simhash matches the Column-API simhash") {
    GraftFunctions.registerAll(spark)
    import org.apache.spark.sql.functions._
    val d = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    val viaCol = d.select(graft.functions.Hashes.simhash64(split(col("text"), " ")))
      .as[Long].head()
    val viaSql = d.createOrReplaceTempView("t")
    val s = spark.sql("SELECT simhash64(split(text, ' ')) FROM t").as[Long].head()
    assert(viaCol === s)
  }
}
