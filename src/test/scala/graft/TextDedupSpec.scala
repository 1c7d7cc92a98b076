package graft

import graft.ops.TextDedup
import graft.functions.Hashes
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup maps whitespace-variant duplicates to one canonical id") {
    val d = docs(
      (1L, "hello  world  foo"),
      (2L, "Hello world foo"),     // case+space variant → dup of 1
      (3L, "different text entirely"))
    val out = TextDedup.exact(d).as[(Long, Long, Boolean)].collect().sorted
    assert(out === Array((1L, 1L, false), (2L, 1L, true), (3L, 3L, false)))
  }

  test("minhash LSH finds the same planted near-dups as exact jaccard") {
    val d = Tables.documents(spark, sfDir)
    val exact = TextDedup.ngramJaccard(d)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val approx = TextDedup.minhashLsh(d)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    // LSH verifies candidates with exact jaccard → no false positives;
    // recall on >=0.9-jaccard planted pairs should be total.
    assert(approx.subsetOf(exact))
    assert((exact -- approx).isEmpty, s"LSH missed: ${exact -- approx}")
  }

  test("simhash: identical token multisets collide, near-identical are close") {
    val d = docs(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "totally unrelated words about other things here now"))
    val sims = d.withColumn("sim", Hashes.simhash64(split(lower(col("text")), " ")))
      .select("doc_id", "sim").as[(Long, Long)].collect().toMap
    assert(sims(1L) === sims(2L))
    assert(java.lang.Long.bitCount(sims(1L) ^ sims(3L)) > 10)
    val pairs = TextDedup.simhashNearDups(d)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).contains((1L, 2L)))
  }

  test("simhash hot-bucket refinement: identical output, bounded within-bucket candidates") {
    // Zipf-hot adversarial corpus: ONE planted near-dup pair inside a
    // crowd of documents engineered to share fingerprint-correlated
    // head words (the r10 scale sweep's super-linear shape). The direct
    // self-join's candidates grow ~occupancy² on the hot bucket; the
    // sub-pigeonhole refinement must (a) keep the OUTPUT bit-identical
    // at every hotCap — the completeness proof — and (b) cut the
    // candidate count on the hot corpus.
    val head = "the of and to in that it is was for on are as with his they at be this"
    val crowd = (100L until 400L).map { i =>
      // shared Zipf head + a few per-doc tail words: correlated sign
      // bits, far in hamming
      (i, s"$head tail${i} tail${i * 7 % 1000} tail${i * 13 % 1000} tail${i * 31 % 1000}")
    }
    val planted = Seq( // identical text → hamming 0, found at ANY geometry
      (1L, s"$head unique story about a very specific thing entirely"),
      (2L, s"$head unique story about a very specific thing entirely"))
    val d = docs((crowd ++ planted): _*)
    val refined = TextDedup.simhashNearDups(d, hotCap = 8)
      .as[(Long, Long, Int)].collect().toSet
    val direct = TextDedup.simhashNearDups(d, hotCap = Int.MaxValue)
      .as[(Long, Long, Int)].collect().toSet
    assert(refined === direct,
      "hot-bucket refinement must move cost, never output")
    assert(refined.exists(p => p._1 == 1L && p._2 == 2L), "planted pair found")
    val candRefined = TextDedup.simhashCandidates(d, hotCap = 8).count()
    val candDirect = TextDedup.simhashCandidates(d, hotCap = Int.MaxValue).count()
    assert(candRefined < candDirect,
      s"refinement must cut hot-bucket candidates: $candRefined vs $candDirect")
  }

  test("simhash candidates are a superset of the answer at every (blocks, hotCap)") {
    // randomized fingerprint-level completeness: pairs planted at
    // hamming 0..4 with flips scattered adversarially; every <=3 pair
    // must appear in the candidate stage under refinement forced on
    // (hotCap=0 puts EVERY bucket on the sub-pigeonhole path).
    val rnd = new scala.util.Random(11)
    val base = 0x0123456789abcdefL
    val rows = (0 until 40).map { i =>
      var fp = base ^ (rnd.nextLong() & 0xffff) // cluster: hot-ish buckets
      val ham = i % 5
      rnd.shuffle((0 until 64).toList).take(ham).foreach(b => fp ^= (1L << b))
      (i.toLong, fp)
    }
    for (b <- Seq(4, 6)) {
      val simDf = spark.createDataFrame(rows).toDF("doc_id", "sim")
      val keyed = TextDedup.simhashKeysFor(simDf, maxHamming = 3, blocks = b)
      val cand = TextDedup.candidatesFromKeys(keyed, hotCap = 0)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val sims = rows.toMap
      for {
        (ia, fa) <- sims; (ib, fb) <- sims
        if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 3
      } assert(cand.contains((ia, ib)),
        s"B=$b hotCap=0 missed hamming-${java.lang.Long.bitCount(fa ^ fb)} pair ($ia,$ib)")
    }
  }

  test("ngram jaccard of planted pairs is high and symmetric-free (a<b)") {
    val out = TextDedup.ngramJaccard(Tables.documents(spark, sfDir))
      .as[(Long, Long, Double)].collect()
    assert(out.forall(p => p._1 < p._2))
    assert(out.forall(_._3 >= 0.5))
  }

  test("incremental dedup against a corpus index equals the composed reference") {
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 5 =!= 4)
    val batch = all.filter(col("doc_id") % 5 === 4)
    val survived = TextDedup.dedupIncremental(
      TextDedup.buildDedupIndex(corpus), batch)
      .select("doc_id").as[Long].collect().toSet
    // reference: full-set exact + near-dup pairs, restricted to
    // (corpus partner, batch member) relations
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    // removed-exact iff ANY corpus doc shares the normalized digest
    val digests = all
      .select(col("doc_id"), md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("h"))
      .as[(Long, String)].collect()
    val corpusDigests = digests.filterNot(d => batchIds.contains(d._1)).map(_._2).toSet
    val exactRemoved = digests
      .filter(d => batchIds.contains(d._1) && corpusDigests.contains(d._2))
      .map(_._1).toSet
    val nearRemoved = TextDedup.ngramJaccard(all)
      .select("a_id", "b_id").as[(Long, Long)].collect()
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (newer, older) =>
        batchIds.contains(newer) && !batchIds.contains(older) }
      .map(_._1).toSet
    val expect = batchIds -- exactRemoved -- nearRemoved
    assert(survived === expect,
      s"extra=${survived -- expect} missing=${expect -- survived}")
    assert(survived.nonEmpty && survived.size < batchIds.size)
  }

  test("persisted dedup index: same survivors, no Exchange on the index side") {
    val all = Tables.documents(spark, sfDir)
    val corpus = all.filter(col("doc_id") % 5 =!= 4)
    val batch = all.filter(col("doc_id") % 5 === 4)
    val built = TextDedup.buildDedupIndex(corpus)
    val dir = java.nio.file.Files.createTempDirectory("graft_dedup_idx").toString
    val loaded = TextDedup.writeDedupIndex(built, "dedup_idx_spec", dir)
    try {
      // geometry survives the round trip
      assert(loaded.bands === built.bands && loaded.rows === built.rows)
      // identical survivors from the in-memory and the persisted index
      val a = TextDedup.dedupIncremental(built, batch)
        .select("doc_id").as[Long].collect().toSet
      val b = TextDedup.dedupIncremental(loaded, batch)
        .select("doc_id").as[Long].collect().toSet
      assert(a === b && a.nonEmpty)
      // the near-dup candidate join (batch band buckets vs corpus-sized
      // index buckets): with broadcast off, the ONLY shuffle is the
      // batch side re-clustering to the index's bucketing — the index
      // (the 100 TB side) is read pre-shuffled from its buckets
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val newBuckets = batch
          .withColumn("shingles", Hashes.shingleHashes(
            split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "), 3))
          .filter(size(col("shingles")) > 0)
          .withColumn("minhash", Hashes.minhashSig(col("shingles"),
            loaded.bands * loaded.rows))
          .select(col("doc_id").as("new_id"),
            explode(Hashes.bandKeys(col("minhash"), loaded.bands, loaded.rows))
              .as("bucket"))
        val cand = newBuckets
          .join(loaded.buckets.withColumnRenamed("doc_id", "old_id"), Seq("bucket"))
        cand.count()
        val plan = cand.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan.take(1000))
        assert("Exchange".r.findAllIn(plan).size === 1,
          s"expected exactly one Exchange (batch side only): ${plan.take(1200)}")
        assert(plan.contains("Bucketed: true"), plan.take(1200))
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      Seq("digests", "buckets", "shingles").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS dedup_idx_spec_$t"))
    }
  }

  test("dedup serving split: served output ≡ inline composition, index built once") {
    val all = Tables.documents(spark, sfDir)
    val inline = TextDedup.dedupIncremental(
      TextDedup.buildDedupIndex(all.filter(col("doc_id") % 5 =!= 4)),
      all.filter(col("doc_id") % 5 === 4))
      .select("doc_id").as[Long].collect().toSet
    val served = graft.ops.DedupServing.dedupIncremental(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(served === inline && served.nonEmpty)
    // second call serves the SAME persisted index instance (no rebuild)
    val idx1 = graft.ops.DedupServing.servedIndex(spark, sfDir)
    val again = graft.ops.DedupServing.dedupIncremental(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(again === inline)
    assert(graft.ops.DedupServing.servedIndex(spark, sfDir) eq idx1)
  }

  test("span dedup: reassembly is the identity for untouched docs, total loss for exact dups") {
    val all = Tables.documents(spark, sfDir)
    val out = TextDedup.spanDedup(all)
    val joined = out.join(all.select(col("doc_id"), col("text")), "doc_id")
    // something in this corpus repeats (the planted near-dups share
    // aligned spans), and every removal is accounted for
    val removed = joined.agg(sum(col("segs_removed"))).as[Long].head()
    assert(removed > 0)
    // docs that lost nothing reassemble BIT-IDENTICAL to the original —
    // catches any segment-ordering or slicing bug
    assert(joined.filter(col("segs_removed") === 0 &&
      col("text_dedup") =!= col("text")).count() === 0)
    // an exact-duplicate doc (non-canonical copy) loses every span to
    // its earlier twin
    val dupIds = TextDedup.exact(all).filter(col("is_dup")).select("doc_id")
    assert(joined.join(dupIds, "doc_id")
      .filter(col("segs_removed") =!= col("segs_total")).count() === 0)
    // kept spans of a cleaned doc are a prefix-ordered subsequence:
    // word count conservation
    val words = joined
      .select((size(split(col("text"), " "))).as("n_orig"),
        when(col("text_dedup") === "", 0)
          .otherwise(size(split(col("text_dedup"), " "))).as("n_kept"),
        col("segs_removed"))
    assert(words.filter(col("n_kept") > col("n_orig")).count() === 0)
    assert(words.filter(col("segs_removed") === 0 &&
      col("n_kept") =!= col("n_orig")).count() === 0)
  }

  test("span dedup plan lock: winner selection is a combining aggregate, not a window") {
    val plan = TextDedup.spanDedup(Tables.documents(spark, sfDir))
      .queryExecution.executedPlan.toString
    // a digest-partitioned Window (or a winners-rejoin) would stream a
    // hot span's every copy through one task; partial_min_by before the
    // exchange is the property that makes boilerplate spans safe
    assert(plan.contains("partial_min_by"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("incremental span dedup ≡ batch span dedup when the corpus precedes the batch") {
    val all = Tables.documents(spark, sfDir)
    val cut = 250L
    val corpus = all.filter(col("doc_id") < cut)
    val batch = all.filter(col("doc_id") >= cut)
    // corpus keys all precede batch keys, so a span present in BOTH has
    // its global first occurrence in the corpus — incremental removal
    // (digest in index) and batch-global removal (winner key < batch)
    // agree exactly, and within-batch competition is the same rule
    val inc = TextDedup.spanDedupIncremental(TextDedup.buildSpanIndex(corpus), batch)
    val full = TextDedup.spanDedup(all).filter(col("doc_id") >= cut)
    assert(inc.except(full).count() === 0)
    assert(full.except(inc).count() === 0)
    assert(inc.count() === batch.count())

    // persisted index round-trip serves the identical result
    val dir = java.nio.file.Files.createTempDirectory("graft_span_idx").toString
    try {
      val loaded = TextDedup.writeSpanIndex(
        TextDedup.buildSpanIndex(corpus), "span_idx_spec", dir)
      val viaDisk = TextDedup.spanDedupIncremental(loaded, batch)
      assert(viaDisk.except(full).count() === 0)
      assert(full.except(viaDisk).count() === 0)
    } finally spark.sql("DROP TABLE IF EXISTS span_idx_spec_spans")
  }
}
