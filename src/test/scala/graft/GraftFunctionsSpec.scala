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

  test("simhash_keys kernel is bit-identical to the original expression layout") {
    // The keying step used to be a per-table expression forest whose
    // generated code grew with C(blocks, maxHamming) (Janino 64 KB
    // blowup at B=7); the kernel must reproduce its bit layout EXACTLY
    // so every committed candidate set stays byte-stable. Reference
    // model below = the old column semantics in plain Scala.
    import org.apache.spark.sql.functions._
    def reference(sim: Long, maxHamming: Int, blocks: Int): Seq[(Long, Seq[Long])] = {
      val widths = Array.tabulate(blocks)(i => 64 / blocks + (if (i < 64 % blocks) 1 else 0))
      val offsets = widths.scanLeft(0)(_ + _)
      val nSub = maxHamming + 1
      (0 until blocks).combinations(blocks - maxHamming).toSeq.zipWithIndex.map {
        case (subset, t) =>
          val bkey = subset.foldLeft(t.toLong) { (acc, b) =>
            (acc << widths(b)) | ((sim >>> offsets(b)) & ((1L << widths(b)) - 1))
          }
          val excluded = (0 until blocks).filterNot(subset.contains)
          val exWidth = excluded.map(widths).sum
          val exVal = excluded.foldLeft(0L) { (acc, b) =>
            (acc << widths(b)) | ((sim >>> offsets(b)) & ((1L << widths(b)) - 1))
          }
          val subWidths = Array.tabulate(nSub)(i => exWidth / nSub + (if (i < exWidth % nSub) 1 else 0))
          val subOffsets = subWidths.scanLeft(0)(_ + _)
          val skeys = (0 until nSub).map { s =>
            (s.toLong << 56) | ((exVal >>> subOffsets(s)) &
              (if (subWidths(s) >= 63) -1L else (1L << subWidths(s)) - 1))
          }
          (bkey, skeys)
      }
    }
    val rnd = new scala.util.Random(7)
    val sims = Seq(0L, -1L, 0x0123456789abcdefL) ++ Seq.fill(40)(rnd.nextLong())
    val df = sims.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "sim")
    for (b <- Seq(4, 5, 6, 7, 8)) {
      val got = df.select(col("doc_id"), col("sim"),
          posexplode(graft.functions.Hashes.simhashKeys(col("sim"), 3, b)))
        .select(col("sim"), col("pos"), col("col.bkey"), col("col.skeys"))
        .collect()
        .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getSeq[Long](3))))
        .toMap
      for (s <- sims; (exp, t) <- reference(s, 3, b).zipWithIndex) {
        assert(got((s, t)) === exp, s"B=$b table=$t sim=$s")
      }
    }
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
