package graft

import graft.ops.{LshGeometry, Similarity, TextDedup}

/** The size-derived band geometry contract (round-10, the r8 verdict's
  * candidate (b)): formula-chosen geometry per corpus size, anchored so
  * driver-gate corpora reproduce the hand-tuned r1–r9 geometry exactly,
  * with recall floors re-derived per geometry and asserted here.
  */
class LshGeometrySpec extends SparkSpec {

  test("minhash geometry: legacy (16,4) at gate sizes, derived growth at scale") {
    // driver-gate corpora: bit-for-bit the r1-r9 geometry
    assert(LshGeometry.minhash(500) === (16, 4), "sf0.01")
    assert(LshGeometry.minhash(5000) === (16, 4), "sf0.1")
    // scale corpora: rows grow log4(n), bands re-derived
    assert(LshGeometry.minhash(50000) === (18, 5), "sf1")
    assert(LshGeometry.minhash(500000) === (24, 7), "sf10")
  }

  test("minhash recall floor at the minimum dup Jaccard holds at every derived geometry") {
    for (n <- Seq(500L, 5000L, 50000L, 500000L, 5000000L)) {
      val (b, r) = LshGeometry.minhash(n)
      val floor = LshGeometry.minhashRecall(0.889, b, r)
      assert(floor >= 1.0 - 1e-6, s"n=$n geometry=($b,$r) floor=$floor")
    }
  }

  test("minhash background suppression: derived geometry collides background pairs strictly less") {
    // a background pair at Jaccard 0.3: per-pair candidate probability
    // must FALL as the corpus grows (that is the point of deriving rows)
    val probs = Seq(5000L, 50000L, 500000L).map { n =>
      val (b, r) = LshGeometry.minhash(n)
      LshGeometry.minhashRecall(0.3, b, r)
    }
    assert(probs.sliding(2).forall { case Seq(a, c) => c < a },
      s"background collision probability must fall with n: $probs")
    // and by a lot across two decades (fixed geometry would hold it flat)
    assert(probs.last < probs.head / 4, s"two-decade suppression too weak: $probs")
  }

  test("hyperplane geometry: legacy (32,4) through the strict-gate regime, derived at scale") {
    assert(LshGeometry.hyperplane(200) === (32, 4), "sf0.01")
    assert(LshGeometry.hyperplane(2000) === (32, 4), "sf0.1 (strict-equality regime)")
    assert(LshGeometry.hyperplane(4000) === (32, 4), "anchor edge")
    assert(LshGeometry.hyperplane(20000) === (102, 14), "sf1")
    assert(LshGeometry.hyperplane(200000) === (225, 18), "sf10")
  }

  test("hyperplane floors: dup-level floor >= 0.999 at every scale geometry") {
    // the scale contract (what check_lsh_recall.py asserts): recall at
    // the corpus's true-dup similarity level
    for (n <- Seq(20000L, 200000L)) {
      val (b, k) = LshGeometry.hyperplane(n)
      assert(LshGeometry.hyperplaneRecall(0.85, b, k) >= 0.999,
        s"n=$n ($b,$k) dup floor")
      assert(LshGeometry.hyperplaneRecall(0.92, b, k) >= 0.9999,
        s"n=$n ($b,$k) primary near-dup floor")
    }
    // past the bands cost cap (~2M vectors) the 0.85 floor relaxes a
    // little by design (LSH theory: bands ~ n^0.28 for this gap; the
    // cap bounds per-vector cost) — the 0.92 primary-dup floor holds
    val (b2, k2) = LshGeometry.hyperplane(2000000L)
    assert(LshGeometry.hyperplaneRecall(0.85, b2, k2) >= 0.97, s"($b2,$k2)")
    assert(LshGeometry.hyperplaneRecall(0.92, b2, k2) >= 0.9999, s"($b2,$k2)")
  }

  test("hyperplane past-the-cap: bits clamp holds the declared dup floor (r12 verdict)") {
    // at 2M vectors the band cap binds but the clamp is inactive —
    // bit-for-bit the committed sf100 geometry
    assert(LshGeometry.hyperplane(2000000L) === (256, 22), "sf100")
    // a decade past the cap the UNCLAMPED fixed point would pick
    // (256, 25) (recall(0.85) ≈ 0.86, eroding to 0.67 a decade later):
    // the clamp freezes bits at the widest width whose any-of-256
    // recall still clears the 0.95 floor, and candidates/vec — not
    // recall — absorb further corpus growth
    assert(LshGeometry.hyperplane(20000000L) === (256, 22), "sf1000")
    assert(LshGeometry.hyperplane(200000000L) === (256, 22), "sf10000")
    for (n <- Seq(2000000L, 20000000L, 200000000L)) {
      val (b, k) = LshGeometry.hyperplane(n)
      assert(LshGeometry.hyperplaneRecall(0.85, b, k) >= 0.95,
        s"n=$n ($b,$k): dup floor must not erode past the cap")
    }
    // an UNSATISFIABLE floor fails loudly instead of silently returning
    // the 4-bit fallback below the contract (r13 advisor): 2 bands of
    // the minimum 4-bit width reach only ~0.71 recall at 0.85 cosine
    val e = intercept[IllegalArgumentException] {
      LshGeometry.hyperplane(20000000L, maxBands = 2, minDupRecall = 0.999)
    }
    assert(e.getMessage.contains("unsatisfiable"), e.getMessage)
  }

  test("hyperplane background candidates stay ~linear: bands*n/2^bits bounded per vector") {
    // a background (orthogonal) pair collides per band w.p. ~2^-bits,
    // so expected bg candidates per vector ~ bands*n/2^bits — the
    // quantity that made the fixed 32x4 geometry degenerate to
    // near-all-pairs at sf1. The derived geometry holds it ~flat.
    for (n <- Seq(20000L, 200000L, 2000000L)) {
      val (b, k) = LshGeometry.hyperplane(n)
      val bgPerVec = b.toDouble * n / math.pow(2, k)
      assert(bgPerVec <= 400.0,
        s"n=$n ($b,$k): $bgPerVec background candidates/vector")
    }
  }

  test("auto variants reproduce the legacy output exactly at gate sizes") {
    val docs = graft.Tables.documents(spark, sfDir)
    val auto = TextDedup.minhashLshAuto(docs).collect()
    val fixed = TextDedup.minhashLsh(docs).collect()
    assert(auto.toSeq === fixed.toSeq,
      "derived geometry must be the legacy (16,4) at this corpus size")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val autoE = Similarity.embeddingNearDupsLshAuto(emb).collect()
    val fixedE = Similarity.embeddingNearDupsLsh(emb).collect()
    assert(autoE.toSeq === fixedE.toSeq,
      "derived geometry must be the legacy (32,4) at this corpus size")
  }

  test("auto hyperplane path derives the DEFAULT dup-level geometry at scale sizes") {
    // r10 advisor: the auto operator passed its 0.45 verification
    // threshold positionally into dupSim, deriving (256,15) at sf1
    // instead of the documented/measured (102,14). The gate-size
    // equality test above cannot catch this (both regimes collapse to
    // (32,4) below 4k vectors), so lock the SCALE sizes to the shared
    // derivation path with defaults.
    for (n <- Seq(20000L, 200000L, 2000000L)) {
      assert(Similarity.hyperplaneGeometryFor(n) === LshGeometry.hyperplane(n),
        s"auto path must use hyperplane(n) with the dupSim DEFAULT at n=$n")
    }
    assert(Similarity.hyperplaneGeometryFor(20000L) === (102, 14), "sf1")
    assert(Similarity.hyperplaneGeometryFor(200000L) === (225, 18), "sf10")
  }

  test("IVF/PQ serving geometry: legacy anchors at gate sizes, derived growth at scale") {
    // driver-gate corpora (<= 4000 vectors): the r1-r10 hand geometry,
    // bit-for-bit — every strict-oracle and equivalence spec stays on it
    assert(LshGeometry.ivf(200) === (16, 4), "sf0.01")
    assert(LshGeometry.ivf(2000) === (16, 4), "sf0.1")
    assert(LshGeometry.pq(200) === 32)
    // scale: cells ~ sqrt(n) (pow2, capped), probe fraction fixed at 1/8,
    // full 8-bit PQ codebooks + deep rerank (the r11 sf1 measurement:
    // fixed gate geometry collapsed ivf_pq family recall to 0.22)
    assert(LshGeometry.ivf(20000) === (128, 16), "sf1")
    // past 128 cells the probe fraction doubles to 1/4 — the r11 sf10
    // AnnTune measurement: 1/8 fell through the 0.50 recall floor
    // (0.45), 1/4 restored 0.73
    assert(LshGeometry.ivf(200000) === (256, 64), "sf10")
    assert(LshGeometry.ivf(20000000) === (4096, 1024), "cells capped")
    assert(LshGeometry.pq(20000) === 256)
    // query-side derivations key off the SERVED layout's cell count
    assert(LshGeometry.ivfProbe(16) === 4, "legacy layout probed at legacy width")
    assert(LshGeometry.ivfProbe(128) === 16)
    assert(LshGeometry.pqRerank(16) === 50)
    assert(LshGeometry.pqRerank(128) === 500)
    assert(LshGeometry.pqRerank(256) === 2000, "deep pools need a deeper shortlist")
    // sub-quantizer width: legacy 8 at gate sizes; 8 dims/sub at scale
    // (m=16 for the 128-dim corpus — the sf10 ADC-distortion fix),
    // snapped down to a divisor of dim
    assert(LshGeometry.pqSubs(128, 2000) === 8, "gate sizes keep m=8")
    assert(LshGeometry.pqSubs(128, 200000) === 16)
    assert(LshGeometry.pqSubs(96, 200000) === 12, "m divides dim")
  }

  test("simhash blocks: legacy B=4 at gate sizes, key width tracks log2 n") {
    // driver-gate corpora keep the r1-r9 candidate sets bit-for-bit
    assert(LshGeometry.simhashBlocks(500) === 4, "sf0.01")
    assert(LshGeometry.simhashBlocks(4096) === 4, "smallN edge")
    // at scale the key must carry >= log2 n + margin bits
    assert(LshGeometry.simhashBlocks(50000) === 6, "sf1")
    assert(LshGeometry.simhashBlocks(500000) === 6, "sf10")
    assert(LshGeometry.simhashBlocks(5000000L) === 7, "sf100")
    for (n <- Seq(5000L, 50000L, 500000L, 5000000L, 50000000L)) {
      val b = LshGeometry.simhashBlocks(n)
      val keyBits = 64 * (b - 3) / b
      assert(b == 4 || keyBits >= math.log(n.toDouble) / math.log(2.0),
        s"n=$n B=$b: $keyBits-bit keys under log2 n")
      // table count stays a small constant (C(B,3) <= C(10,3) = 120)
      val tables = (1 to 3).map(i => b - 3 + i).product / 6
      assert(tables <= 120, s"n=$n B=$b: $tables tables")
    }
  }

  test("simhash pigeonhole: every hamming<=3 pair shares a bucket key at any B") {
    // exhaustive-by-construction check of the blocked-subset scheme:
    // plant fingerprint pairs at hamming 0..4 with the flips scattered
    // to land in distinct blocks (the adversarial placement), and
    // assert every pair <= 3 collides in some table while the scheme
    // stays a candidate filter (hamming-4 pairs MAY collide, the exact
    // verify drops them — so only completeness is asserted).
    import org.apache.spark.sql.functions._
    val base = 0x5a5a3c3cf0f01234L
    val rnd = new scala.util.Random(7)
    val rows = (0 to 4).flatMap { ham =>
      (0 until 8).map { i =>
        var fp = base ^ (i.toLong << 48)
        val bits = rnd.shuffle((0 until 64).toList).take(ham)
        bits.foreach(b => fp ^= (1L << b))
        (ham.toLong * 100 + i, fp, ham)
      }
    } :+ ((9999L, base ^ (0L << 48), 0))
    for (b <- Seq(4, 5, 6, 8)) {
      // drive the keying step directly on the planted fingerprints
      val simDf = spark.createDataFrame(rows).toDF("doc_id", "sim", "ham")
      val keyed = TextDedup.simhashKeysFor(simDf, maxHamming = 3, blocks = b)
      val collide = keyed.as("a").join(keyed.as("b"),
          col("a.bkey") === col("b.bkey") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sims = rows.map(r => r._1 -> r._2).toMap
      for {
        (idA, fpA) <- sims; (idB, fpB) <- sims
        if idA < idB && java.lang.Long.bitCount(fpA ^ fpB) <= 3
      } assert(collide.contains((idA, idB)),
        s"B=$b missed pair ($idA,$idB) at hamming ${java.lang.Long.bitCount(fpA ^ fpB)}")
    }
  }
}
