package graft

import graft.ops.{Corpus, DsirServing, TextDedup}
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("normalize is idempotent and scrubs URLs/emails") {
    val out = Corpus.normalize(docs)
    assert(out.count() === docs.count())
    // idempotence: normalizing the normalized text is a fixpoint
    val renorm = Corpus.normalize(
      out.select(col("doc_id"), col("norm_text").as("text")))
    val drift = out.select("doc_id", "norm_text")
      .except(renorm.select("doc_id", "norm_text")).count()
    assert(drift === 0)
    // scrub behavior on synthetic rows
    val dirty = Seq(
      (1L, "Visit https://example.com/x?q=1 NOW"),
      (2L, "mail me at Bob.smith+spam@example.co.uk  please"),
      (3L, "  Plain   text  ")
    ).toDF("doc_id", "text")
    val n = Corpus.normalize(dirty).select("doc_id", "norm_text")
      .as[(Long, String)].collect().toMap
    assert(n(1L) === "visit <url> now")
    assert(n(2L) === "mail me at <email> please")
    assert(n(3L) === "plain text")
  }

  test("splitAssign partitions every doc into exactly one split, stably") {
    val out = Corpus.splitAssign(docs).cache()
    assert(out.count() === docs.count())
    val bySplit = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    val total = bySplit.values.sum.toDouble
    assert(bySplit("train") / total > 0.7 && bySplit("train") / total < 0.9)
    // stable under repartition: assignment is a pure function of doc_id
    val re = Corpus.splitAssign(docs.repartition(13))
    assert(out.except(re).count() === 0 && re.except(out).count() === 0)
    out.unpersist()
  }

  test("sampleStratified keeps exactly ceil(frac*n) docs per stratum") {
    val perLang = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sampled = Corpus.sampleStratified(docs, frac = 0.2)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    perLang.foreach { case (lang, n) =>
      assert(sampled.getOrElse(lang, 0L) === math.ceil(0.2 * n).toLong,
        s"stratum $lang")
    }
    // deterministic: same seed → same sample
    val again = Corpus.sampleStratified(docs.repartition(7), frac = 0.2)
    assert(Corpus.sampleStratified(docs, frac = 0.2).except(again).count() === 0)
  }

  test("ngramTopK returns k bigrams in strict descending, tie-broken order") {
    val top = Corpus.ngramTopK(docs, k = 20).as[(String, Long)].collect()
    assert(top.length === 20)
    top.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    case _ => }
    assert(top.forall(_._1.split(" ").length === 2))
  }

  test("tfidf ranks rare terms above common ones, k rows max per doc") {
    val d = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry durian cherry cherry")).toDF("doc_id", "text")
    val out = Corpus.tfidfTopTerms(d, k = 2)
      .select("doc_id", "term", "rnk").as[(Long, String, Long)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2)).toMap
    // per-doc output is capped at k and ranks are 1..n
    assert(out.groupBy(_._1).values.forall(_.length <= 2))
    // doc 1: apple (tf=2, df=1) beats banana (tf=1, df=2)
    assert(byDoc(1L).head === "apple")
    // doc 3: cherry's tf=3 overcomes its common-ness vs durian (tf=1, rare)
    assert(byDoc(3L).head === "cherry")
    // doc 2: equal tf and df → deterministic term tie-break
    assert(byDoc(2L) === Seq("banana", "cherry"))
  }

  test("sourceQuality aggregates per-source rates consistently") {
    val out = Corpus.sourceQuality(docs)
      .select("source", "n_docs", "n_quality", "n_dups", "quality_rate", "dup_rate")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall { case (_, n, q, d, qr, dr) =>
      q <= n && d <= n && qr >= 0 && qr <= 1 && dr >= 0 && dr <= 1 })
    // totals reconcile with the corpus
    assert(out.map(_._2).sum === docs.count())
    assert(out.map(_._3).sum ===
      graft.ops.TextAnalysis.qualityFilter(docs).count())
  }

  test("lmScore ranks corpus-typical prose above gibberish") {
    val d = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the cat sat on the sofa"),
      (4L, "zxq wvub plorth gnarf klepta vom"))
      .toDF("doc_id", "text")
    val out = Corpus.lmScore(d)
      .select("doc_id", "n_bigrams", "lm_score")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // n_bigrams = tokens - 1
    assert(out(1L)._2 === 5L && out(4L)._2 === 5L)
    // docs sharing the corpus's dominant bigrams outscore the unique-word doc
    assert(out(1L)._3 > out(4L)._3,
      s"common ${out(1L)._3} vs gibberish ${out(4L)._3}")
  }

  test("contamination flags a doc duplicated into the benchmark set") {
    val out = Corpus.contamination(docs).cache()
    // benchmark docs themselves are excluded from the report
    assert(out.filter(col("doc_id") % 20 === 0).count() === 0)
    val rates = out.select("contamination_rate").as[Double].collect()
    assert(rates.forall(r => r >= 0.0 && r <= 1.0))
    // a corpus doc that shares near-all shingles with a benchmark doc
    // (an exact dup pair straddling the % 20 boundary) must be flagged
    val exactDups = TextDedup.exact(docs)
      .filter(col("is_dup") && col("canonical_id") % 20 === 0 && col("doc_id") % 20 =!= 0)
      .select("doc_id").as[Long].collect()
    if (exactDups.nonEmpty) {
      val flagged = out.filter(col("doc_id").isin(exactDups: _*))
        .filter(col("is_contaminated")).count()
      assert(flagged === exactDups.length)
    }
    out.unpersist()
  }

  test("nearDupClusters labels components consistently with the pair graph") {
    val labels = Corpus.nearDupClusters(docs).cache()
    assert(labels.count() === docs.count())
    val byDoc = labels.select("doc_id", "cluster_id")
      .as[(Long, Long)].collect().toMap
    // every near-dup pair lands in one cluster
    val pairs = TextDedup.minhashLsh(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(byDoc(a) === byDoc(b), s"pair ($a,$b) split across clusters")
    }
    // cluster label is the min member, and exactly that member is canonical
    val members = byDoc.groupBy(_._2).view.mapValues(_.keys.min)
    members.foreach { case (label, minDoc) => assert(label === minDoc) }
    val canonicals = labels.filter(col("is_canonical")).select("doc_id")
      .as[Long].collect().toSet
    assert(canonicals === byDoc.values.toSet)
    // transitivity beyond pairs: chained pairs collapse to one cluster
    val adj = pairs.flatMap(p => Seq(p, (p._2, p._1))).groupBy(_._1)
    pairs.take(50).foreach { case (a, b) =>
      adj.getOrElse(b, Array.empty).map(_._2).foreach { c =>
        assert(byDoc(a) === byDoc(c), s"chain $a~$b~$c split")
      }
    }
    labels.unpersist()
  }

  test("sampleWeighted keeps length-proportionally and deterministically") {
    val out = Corpus.sampleWeighted(docs).cache()
    val total = docs.count()
    val kept = out.count()
    assert(kept > 0 && kept < total)
    // keep rate rises with weight: the long half of the corpus must be
    // kept strictly more often than the short half
    val median = docs.stat.approxQuantile("n_chars", Array(0.5), 0.0).head
    val longRate = out.filter(col("n_chars") > median).count().toDouble /
      math.max(docs.filter(col("n_chars") > median).count(), 1)
    val shortRate = out.filter(col("n_chars") <= median).count().toDouble /
      math.max(docs.filter(col("n_chars") <= median).count(), 1)
    assert(longRate > shortRate, s"long $longRate !> short $shortRate")
    // the longest doc is kept with p=1 (u16 < 65536 always)
    assert(out.filter(col("keep_p") === 1.0).count() >= 1)
    // pure function of (doc_id, n_chars): stable under repartition
    val re = Corpus.sampleWeighted(docs.repartition(9))
    assert(out.except(re).count() === 0 && re.except(out).count() === 0)
    out.unpersist()
  }

  test("docOverlap: exact dups overlap fully, synthetic template spans are caught") {
    val out = Corpus.docOverlap(docs).cache()
    // every doc with >=1 shingle appears; fractions in [0,1]
    val bad = out.filter(col("overlap_fraction") < 0 || col("overlap_fraction") > 1 ||
      col("n_shared") > col("n_shingles")).count()
    assert(bad === 0)
    // exact duplicates (same normalized text) share ALL their shingles
    val dupIds = TextDedup.exact(docs).filter(col("is_dup"))
      .select("doc_id").as[Long].collect()
    if (dupIds.nonEmpty) {
      val full = out.filter(col("doc_id").isin(dupIds.map(Long.box): _*))
        .filter(col("overlap_fraction") < 1.0).count()
      assert(full === 0, "an exact dup did not overlap fully")
    }
    // synthetic: half-template docs overlap ~half, unique doc ~zero
    val synth = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon unique1 unique2 unique3"),
      (3L, "totally different words without any shared span here")
    ).toDF("doc_id", "text")
    val m = Corpus.docOverlap(synth)
      .select("doc_id", "overlap_fraction").as[(Long, Double)].collect().toMap
    assert(m(1L) > 0.4 && m(2L) > 0.4, s"template spans missed: $m")
    assert(m(3L) === 0.0, s"unique doc flagged: $m")
    out.unpersist()
  }

  test("perplexity buckets tile each language into thirds ordered by lm score") {
    val out = Corpus.perplexityBuckets(docs)
      .as[(Long, String, Double, String)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._4).toSet.subsetOf(Set("head", "middle", "tail")))
    out.groupBy(_._2).foreach { case (lang, rows) =>
      // NTILE semantics: bucket sizes differ by at most one
      val sizes = rows.groupBy(_._4).map(_._2.length)
      assert(sizes.max - sizes.min <= 1, s"$lang bucket sizes $sizes")
      // the tiling respects the score order: every head score ≥ every
      // middle score ≥ every tail score
      def scores(b: String) = rows.filter(_._4 == b).map(_._3)
      for (Seq(hi, lo) <- Seq("head", "middle", "tail").combinations(2))
        if (scores(hi).nonEmpty && scores(lo).nonEmpty)
          assert(scores(hi).min >= scores(lo).max, s"$lang $hi/$lo out of order")
    }
  }

  test("splitLeakage: a held-out copy of a train doc leaks fully, unique docs don't") {
    // split assignment is hash(doc_id)-determined — recover which side
    // each id lands on first, then plant texts accordingly
    val ids = (0L until 200L).map(i => (i, s"placeholder $i")).toDF("doc_id", "text")
    val sides = Corpus.splitAssign(ids)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val trainId = sides.collectFirst { case (id, "train") => id }.get
    val testId = sides.collectFirst { case (id, s) if s != "train" => id }.get
    val uniqueId = sides.collectFirst { case (id, s) if s != "train" && id != testId => id }.get
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val d = Seq(
      (trainId, shared),
      (testId, shared),                                      // full leak
      (uniqueId, (1 to 10).map(i => s"only$i").mkString(" ")) // no leak
    ).toDF("doc_id", "text")
    val r = Corpus.splitLeakage(d)
      .as[(Long, String, Long, Long, Double, Boolean)].collect()
      .map(x => x._1 -> x).toMap
    assert(!r.contains(trainId), "train docs must not be audited rows")
    assert(r(testId)._5 === 1.0 && r(testId)._6)
    assert(r(uniqueId)._5 === 0.0 && !r(uniqueId)._6)
    // corpus invariants at the gate SF: every row is held-out, counts
    // are consistent, and the fraction recomputes
    val real = Corpus.splitLeakage(docs)
      .as[(Long, String, Long, Long, Double, Boolean)].collect()
    assert(real.nonEmpty)
    assert(real.forall(x => x._2 == "val" || x._2 == "test"))
    assert(real.forall(x => x._4 >= 0 && x._4 <= x._3))
    // Spark's round() is HALF_UP — recompute with the same mode (rint's
    // half-even disagrees on exact .5 ties, which DO occur here)
    assert(real.forall(x =>
      math.abs(x._5 - BigDecimal(x._4.toDouble / x._3)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9))
    assert(real.forall(x => x._6 === (x._4.toDouble / x._3 >= 0.5)))
  }

  test("clustersFromPairs hub salting spreads a star hub over tasks without changing labels") {
    // star graph: one template "hub" (doc 0) near-duplicating 400 leaves
    // that are NOT near-dups of each other — the pathological shape where
    // every propagation round funnels the hub's whole edge list through
    // one label-join task.
    val nLeaves = 400
    val members = spark.range(0, nLeaves + 1).toDF("doc_id")
    val starPairs = spark.range(1, nLeaves + 1)
      .select(lit(0L).as("a_id"), col("id").as("b_id"))
    // a disjoint ordinary component to prove non-hub handling coexists
    val sidePairs = Seq((1000L, 1001L), (1001L, 1002L)).toDF("a_id", "b_id")
    val sideMembers = Seq(1000L, 1001L, 1002L).toDF("doc_id")
    val allMembers = members.union(sideMembers)
    val allPairs = starPairs.union(sidePairs)

    // guard internals: with the threshold below the hub's degree, the hub
    // is detected and its edges span multiple salts (≥2 ⇒ the label join
    // cannot put all of the hub's rows in one task); non-hub edges stay
    // on salt 0 so healthy keys pay nothing
    val (salted, hubs) = Corpus.saltedEdgeView(allPairs, hubSalts = 8, hubDegree = 100L)
    assert(hubs.select("dst").as[Long].collect().toSet === Set(0L),
      "exactly the star hub should exceed the degree threshold")
    val hubSaltCount = salted.filter(col("dst") === 0L)
      .select("__salt").distinct().count()
    assert(hubSaltCount >= 2, s"hub edges spread over $hubSaltCount salts")
    val nonHubSalts = salted.filter(col("dst") =!= 0L)
      .select("__salt").distinct().as[Long].collect().toSet
    assert(nonHubSalts === Set(0L), "non-hub edges must not be salted")

    // propagation result identical with and without the guard active
    val saltedLabels = Corpus.clustersFromPairs(allMembers, allPairs,
      hubSalts = 8, hubDegree = 100L)
    val plainLabels = Corpus.clustersFromPairs(allMembers, allPairs,
      hubSalts = 8, hubDegree = Long.MaxValue)
    assert(saltedLabels.except(plainLabels).count() === 0)
    assert(plainLabels.except(saltedLabels).count() === 0)
    val byDoc = saltedLabels.select("doc_id", "cluster_id")
      .as[(Long, Long)].collect().toMap
    assert((0L to nLeaves.toLong).forall(byDoc(_) === 0L), "star collapses to hub's label")
    assert(Seq(1000L, 1001L, 1002L).forall(byDoc(_) === 1000L), "side chain keeps its own label")
  }

  test("clustersFromPairs releases superseded checkpoints (storage does not grow with diameter)") {
    // a 12-hop chain forces ≥12 propagation rounds — before the r7 fix
    // each round's label snapshot (plus the edge/hub views) stayed
    // persisted for the session; now only the RESULT's backing snapshot
    // may survive the call
    val members = spark.range(0, 13).toDF("doc_id")
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = Corpus.clustersFromPairs(members, chain, hubSalts = 4, hubDegree = 100L)
    assert(out.select("cluster_id").distinct().as[Long].collect().toSeq === Seq(0L),
      "chain collapses to one cluster")
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 1,
      s"expected at most the result's own snapshot to persist, found ${leaked.size}")
    // and the result must still be readable after the internal releases
    assert(out.count() === 13)
  }

  test("lengthPercentiles: histogram rank selection = naive sorted-list percentiles") {
    val out = Corpus.lengthPercentiles(docs)
      .as[(String, Long, Long, Long, Long)].collect()
    val bySource = docs.select(col("source"), col("n_chars"))
      .as[(String, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    assert(out.map(_._1).toSet === bySource.keySet)
    out.foreach { case (src, n, p50, p90, p99) =>
      val xs = bySource(src)
      assert(n === xs.length.toLong, src)
      // ceil(n*k/100)-th smallest (1-indexed) — the disc percentile
      def ref(k: Int) = xs(((xs.length * k + 99) / 100) - 1)
      assert(p50 === ref(50), s"$src p50")
      assert(p90 === ref(90), s"$src p90")
      assert(p99 === ref(99), s"$src p99")
    }
  }

  test("datacard metrics agree with their direct computations") {
    val card = Corpus.datacard(docs).as[(String, Double)].collect().toMap
    assert(card("n_docs") === docs.count().toDouble)
    assert(card("n_sources") === docs.select("source").distinct().count().toDouble)
    assert(card("n_langs") === docs.select("lang").distinct().count().toDouble)
    val lens = docs.select(col("n_chars")).as[Long].collect().sorted
    assert(card("p50_chars") === lens((lens.length * 50 + 99) / 100 - 1).toDouble)
    val qRate = graft.ops.TextAnalysis.qualityFilter(docs).count().toDouble / lens.length
    assert(math.abs(card("quality_pass_rate") - qRate) < 1e-3)
    val dRate = TextDedup.exact(docs).filter(col("is_dup")).count().toDouble / lens.length
    assert(math.abs(card("exact_dup_rate") - dRate) < 1e-3)
  }

  test("bloom-prefiltered split leakage is bit-identical to the exact form") {
    // no false negatives in the sketch + exact re-verification of
    // survivors ⇒ the pre-filter may only shrink join INPUT, never
    // change join OUTPUT — asserted as exact frame equality both ways
    val exact = Corpus.splitLeakage(docs)
    val bloom = Corpus.splitLeakageBloom(docs)
    assert(exact.except(bloom).count() === 0)
    assert(bloom.except(exact).count() === 0)
    assert(bloom.count() === exact.count())
    // plan lock: the sketch test survives into the physical plan (a
    // regression that folds it away would silently revert to shuffling
    // every probe shingle)
    assert(bloom.queryExecution.executedPlan.toString
      .contains("might_contain"), "bloom prefilter missing from plan")
  }

  test("vocabCoverage: OOV rate is exact against a hand-built vocabulary") {
    val out = Corpus.vocabCoverage(docs, vocabSize = 16).cache()
    // plan lock: vocabulary selection is a distributed top-V
    // (TakeOrderedAndProject) broadcast to the scoring join — never a
    // single-partition global window, never a shuffled scoring join
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
    assert(!plan.contains("Window"), plan.take(1500))
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
    // reference: count tokens per doc against the top-16 vocab built
    // naively on the driver
    val toks = docs.select(col("doc_id"),
        explode(split(TextDedup.normText, " ")).as("w"))
      .filter(col("w") =!= "")
      .as[(Long, String)].collect()
    val vocab = toks.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (w, c) => (-c, w) }.take(16).map(_._1).toSet
    val ref = toks.groupBy(_._1).map { case (id, ts) =>
      id -> ((ts.size.toLong, ts.count(t => vocab(t._2)).toLong))
    }
    out.as[(Long, Long, Long, Double)].collect().foreach {
      case (id, n, inV, oov) =>
        val (rn, rin) = ref(id)
        assert(n === rn, s"doc $id n_tokens")
        assert(inV === rin, s"doc $id n_in_vocab")
        assert(math.abs(oov - (BigDecimal(n - inV) / BigDecimal(n))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"doc $id oov")
    }
    out.unpersist()
  }

  test("DSIR: persisted model serves identically to the inline weights") {
    val path = java.nio.file.Files.createTempDirectory("graft_dsir_model").toString + "/m"
    Corpus.writeDsirModel(Corpus.dsirModel(docs), path)
    val model = Corpus.loadDsirModel(spark, path)
    // every bucket ships, zero-count smoothing included — serving must
    // never drop tokens from buckets the training corpus missed
    assert(model.count() === 1024)
    val served = Corpus.dsirScore(docs.filter(col("lang") =!= "en"), model)
    val inline = Corpus.dsirWeights(docs)
    assert(served.orderBy("doc_id").collect().toSeq ===
      inline.collect().toSeq)
    // the model is broadcast-sized and the scoring join must broadcast it
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    // a fully-OOV document still gets scored: all its tokens count and
    // each contributes the smoothed zero-count ratio
    val oov = Seq((999999L, "zzzqx zzzqy zzzqx")).toDF("doc_id", "text")
      .withColumn("lang", lit("xx")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val scored = Corpus.dsirScore(oov, model).collect()
    assert(scored.length === 1)
    assert(scored.head.getLong(1) === 3L, "all OOV tokens must count")
  }

  test("DSIR serving layer: train-once persisted model matches inline weights and sample") {
    // the gated entries serve through DsirServing — these equalities are
    // what keeps the driver's oracle valid for the serving path
    assert(DsirServing.dsirWeights(spark, sfDir).collect().toSeq ===
      Corpus.dsirWeights(docs).collect().toSeq)
    assert(DsirServing.dsirSample(spark, sfDir).collect().toSeq ===
      Corpus.dsirSample(docs).collect().toSeq)
    // second call must reuse the persisted model, not retrain: the
    // serving plan broadcasts a parquet-sourced model table
    val plan = DsirServing.dsirWeights(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    assert(plan.toLowerCase.contains("parquet"),
      "served weights must read the persisted model, not retrain inline")
  }

  test("DSIR: target-language docs outscore raw docs on average; draw keeps the argmax") {
    val w = Corpus.dsirScore(docs, Corpus.dsirModel(docs)).cache()
    val en = docs.select(col("doc_id"), (col("lang") === "en").as("t"))
    val byLang = w.join(en, Seq("doc_id"))
      .groupBy(col("t")).agg(avg(col("dsir_weight") / col("n_tokens")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // per-token average, so length differences don't mask the signal
    assert(byLang(true) > byLang(false),
      s"target ${byLang(true)} should exceed raw ${byLang(false)}")
    val kept = Corpus.dsirSample(docs).select("doc_id").as[Long].collect().toSet
    val top = Corpus.dsirWeights(docs)
      .orderBy(col("dsir_weight").desc).select("doc_id").as[Long].head()
    // keep_p(argmax) = exp(0) = 1 > u16/65536 for every u16 < 65536
    assert(kept.contains(top), s"argmax doc $top must survive the draw")
    w.unpersist()
  }
}
