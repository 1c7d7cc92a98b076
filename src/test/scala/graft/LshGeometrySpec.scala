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

  test("hyperplane geometry: legacy (32,4) at gate sizes, derived growth at scale") {
    assert(LshGeometry.hyperplane(200) === (32, 4), "sf0.01")
    assert(LshGeometry.hyperplane(800) === (32, 4), "anchor edge")
    assert(LshGeometry.hyperplane(2000) === (81, 6), "sf0.1")
    assert(LshGeometry.hyperplane(20000) === (128, 9), "sf1 (bands capped)")
    assert(LshGeometry.hyperplane(200000) === (128, 12), "sf10 (bands capped)")
  }

  test("hyperplane floors: threshold floor holds until the cap; dup-level floor stays ~1 at scale") {
    // uncapped sizes: the 0.45-threshold floor meets the target
    for (n <- Seq(200L, 2000L)) {
      val (b, k) = LshGeometry.hyperplane(n)
      assert(LshGeometry.hyperplaneRecall(0.45, b, k) >= 0.998,
        s"n=$n ($b,$k)")
    }
    // capped sizes: the dup-level (0.85) floor — what the scale recall
    // gate asserts — stays essentially 1 even as the threshold floor
    // honestly degrades
    for (n <- Seq(20000L, 200000L)) {
      val (b, k) = LshGeometry.hyperplane(n)
      assert(LshGeometry.hyperplaneRecall(0.85, b, k) >= 0.999,
        s"n=$n ($b,$k) dup floor")
    }
  }

  test("hyperplane bucket occupancy stays bounded: 2^bits grows at least with n/100") {
    for (n <- Seq(2000L, 20000L, 200000L, 2000000L)) {
      val (_, k) = LshGeometry.hyperplane(n)
      assert(math.pow(2, k) >= n / 100.0,
        s"n=$n bits=$k: expected bucket occupancy must stay bounded")
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
}
