package graft

import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("text stats computes token counts and ratios") {
    val d = Seq((1L, "The quick the fox the end")).toDF("doc_id", "text")
    val r = TextAnalysis.textStats(d).collect().head
    assert(r.getAs[Long]("n_tokens") === 6)
    assert(r.getAs[Long]("n_distinct_tokens") === 4) // the/quick/fox/end
    assert(r.getAs[Double]("stopword_ratio") === 0.5) // the,the,the / 6
  }

  test("token count splits BPE-ish pieces finer than whitespace words") {
    val d = Seq(
      (1L, "don't stop, it's 2024!"),
      (2L, "plain words only here")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCount(d).collect().map(x =>
      x.getAs[Long]("doc_id") -> x).toMap
    // don|'|t  stop|,  it|'|s  2024|! → 10 pieces over 4 words
    assert(r(1L).getAs[Long]("n_ws_tokens") === 4)
    assert(r(1L).getAs[Long]("n_bpe_tokens") === 10)
    assert(r(1L).getAs[Double]("tokens_per_word") === 2.5)
    assert(r(2L).getAs[Long]("n_bpe_tokens") === r(2L).getAs[Long]("n_ws_tokens"))
    // every whitespace word contains at least one piece
    val real = TextAnalysis.tokenCount(Tables.documents(spark, sfDir))
    import org.apache.spark.sql.functions.col
    assert(real.filter(col("n_bpe_tokens") < col("n_ws_tokens")).count() === 0)
  }

  test("lang id picks the language with most marker hits") {
    val d = Seq(
      (1L, "en", "the cat and the dog is here"),
      (2L, "es", "el gato de la casa que duerme"),
      (3L, "zz", "xyzzy plugh quux")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.langId(d).select("doc_id", "lang_guess")
      .as[(Long, String)].collect().toMap
    assert(r === Map(1L -> "en", 2L -> "es", 3L -> "und"))
  }

  test("fingerprint is stable under whitespace normalization") {
    val d = Seq((1L, "a  b\tc"), (2L, "a b c")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprint(d).select("fp_md5").as[String].collect()
    assert(fps(0) === fps(1))
  }

  test("quality filter keeps well-formed docs from the real table") {
    val kept = TextAnalysis.qualityFilter(Tables.documents(spark, sfDir)).count()
    val total = Tables.documents(spark, sfDir).count()
    assert(kept > 0 && kept <= total)
  }

  test("repetition ratio separates looped from varied text") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam spam"), // one distinct 3-gram
      (2L, "one two three four five six seven eight"), // all distinct
      (3L, "ab cd")                                    // too short: no shingles
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(d)
      .select("doc_id", "n_shingles_total", "n_shingles_distinct", "repetition_ratio")
      .as[(Long, Long, Long, Option[Double])].collect().map(x => x._1 -> x).toMap
    assert(r(1L)._4.get > 0.8 && r(1L)._3 === 1L)
    assert(r(2L)._4.get === 0.0 && r(2L)._2 === r(2L)._3)
    assert(r(3L)._2 === 0L && r(3L)._4.isEmpty)
    // invariants on the real corpus: distinct ≤ total, ratio ∈ [0,1]
    val real = TextAnalysis.repetition(Tables.documents(spark, sfDir))
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(real.forall(x => x._3 <= x._2))
    assert(real.forall(_._4.forall(v => v >= 0.0 && v <= 1.0)))
  }

  test("entropy: zero for constant docs, log2(n) for uniform, ranks skew below uniform") {
    val d = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),          // constant: H = 0
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),    // 8 uniform: H = 3
      (3L, "word word word word word word word other"),         // skewed mass
      (4L, "")                                                  // no tokens: absent
    ).toDF("doc_id", "text")
    val r = TextAnalysis.entropy(d)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(!r.contains(4L), "empty doc must be absent")
    assert(r(1L)._4 === 0.0 && r(1L)._5 === 0.0)
    assert(r(2L)._4 === 3.0 && r(2L)._5 === 1.0)
    // doc 3 has the same n_distinct as a 2-token uniform doc would, but
    // its mass is skewed: normalized entropy strictly below 1
    assert(r(3L)._5 > 0.0 && r(3L)._5 < 1.0, s"skewed norm was ${r(3L)._5}")
    // corpus invariants: 0 ≤ H ≤ log2(n_distinct), norm ∈ [0, 1]
    val real = TextAnalysis.entropy(Tables.documents(spark, sfDir))
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(real.nonEmpty)
    assert(real.forall(x => x._4 >= 0.0 &&
      x._4 <= math.log(x._3.toDouble) / math.log(2.0) + 1e-4))
    assert(real.forall(x => x._5 >= 0.0 && x._5 <= 1.0))
  }

  test("gopherQuality: each rule fires on its planted violator, pass is the conjunction") {
    val good = (1 to 60).map(i => s"word$i").mkString("the and ", " ", "")
    val d = Seq(
      (1L, good),                                    // passes every rule
      (2L, "the and tiny doc"),                      // fails word count
      (3L, ("12345 " * 60) + "the and"),             // fails alpha ratio
      (4L, ("a... b... c... " * 20) + "the and")     // fails symbol ratio
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherQuality(d)
      .select("doc_id", "flag_word_count", "flag_alpha_ratio", "flag_symbol_ratio",
        "flag_stopwords", "gopher_pass")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(x => x._1 -> x).toMap
    assert(r(1L) === ((1L, true, true, true, true, true)))
    assert(!r(2L)._2 && !r(2L)._6)
    assert(!r(3L)._3 && !r(3L)._6)
    assert(!r(4L)._4 && !r(4L)._6)
    // corpus invariants: flags recompute from the emitted ratios, and
    // gopher_pass is exactly the conjunction of the five flags
    val real = TextAnalysis.gopherQuality(Tables.documents(spark, sfDir))
      .as[(Long, Long, Double, Double, Double, Long,
           Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(real.nonEmpty)
    real.foreach { x =>
      assert(x._7 === (x._2 >= 50 && x._2 <= 100000))
      assert(x._8 === (x._3 >= 3.0 && x._3 <= 10.0))
      assert(x._9 === (x._4 <= 0.1))
      assert(x._10 === (x._5 >= 0.8))
      assert(x._11 === (x._6 >= 2))
      assert(x._12 === (x._7 && x._8 && x._9 && x._10 && x._11))
    }
  }
}
