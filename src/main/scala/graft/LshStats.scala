package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Hashes
import graft.ops.{LshGeometry, Similarity, TextDedup}

/** Scale-campaign diagnostic: measure the LSH CANDIDATE load against
  * the TRUE near-dup load for a corpus — the number the size-derived
  * geometry story stands on. The r8 campaign could only reason about
  * candidate growth indirectly (via query wall-times over the
  * saturated 30-word corpus); this main measures it directly so
  * SCALE.md can assert "banded candidates ∝ true dups" with data:
  *
  *   - minhash: distinct candidate pairs from the derived band-bucket
  *     index vs verified pairs at Jaccard ≥ 0.5, plus docs-per-shingle
  *     (the Heaps-law flatness witness — the r8 corpus measured 9.6 →
  *     95.2 across one decade; a Heaps corpus must stay ~flat);
  *   - simhash: distinct candidate pairs from the derived blocked-
  *     pigeonhole tables vs verified pairs at hamming ≤ 3;
  *   - hyperplane: distinct candidate pairs from the derived geometry
  *     vs verified pairs at cosine ≥ 0.45.
  *
  * Prints ONE JSON line; `runMain graft.LshStats <sfDir> [out.json]`.
  * Candidate counting uses the same public kernels as the operators
  * (bucket join on ids only), so the measured load is the operators'
  * actual shuffle load, not a proxy.
  */
object LshStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    // GRAFT_LSHSTATS_ONLY=minhash,simhash,hyperplane — family filter so
    // a big-SF sweep can bound each family's shuffle/sort spill in its
    // own JVM (the all-families sf100 run overflowed the host's ~45 GB
    // free disk; one family per JVM reclaims the spill between them).
    val fams = sys.env.get("GRAFT_LSHSTATS_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set("minhash", "simhash", "hyperplane"))
    // GRAFT_LSHSTATS_MODE=occupancy: report the NON-DISTINCT candidate
    // mass Σ_buckets C(occupancy, 2) from one groupBy over the keyed
    // rows — no pair self-join, no distinct, no verify. This is the
    // exact number of bucket-cojoined row pairs the operator's shuffle
    // PRODUCES (distinct-deduped downstream), so it is the honest load
    // number when the full candidates/true measurement exceeds the
    // host (sf100: the hyperplane self-join + exact verify needs ~1 TB
    // of distributed spill — routine for a cluster, not for one box).
    val occupancyOnly = sys.env.get("GRAFT_LSHSTATS_MODE").contains("occupancy")
    val spark = GraftSession.builder(defaultCpus = "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir)
    lazy val nDocs = docs.count()
    def ratio(c: Long, t: Long): Double = c.toDouble / math.max(1L, t)
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    parts += s""""sf":"$sfDir""""

    // (Σ C(occupancy,2), max occupancy, n buckets) of a keyed frame —
    // the occupancy-mode load measure: one groupBy, no self-join.
    // Takes Columns so composite join keys (simhash's (bkey, skey)
    // refined regime) are measured exactly as the operator joins them.
    def occupancy(keyed: org.apache.spark.sql.DataFrame,
                  keys: org.apache.spark.sql.Column*): (Long, Long, Long) = {
      val r = keyed.groupBy(keys: _*).agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) DIV 2")).as("mass"),
          max(col("c")).as("mx"), count(lit(1)).as("nb")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    if (fams("minhash")) {
      val (mBands, mRows) = LshGeometry.minhash(nDocs)
      val shingles = docs
        .withColumn("shingles", Hashes.shingleHashes(
          split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "), 3))
        .filter(size(col("shingles")) > 0)
        .select(col("doc_id"), col("shingles"))
      val docsPerShingle = shingles
        .select(explode(col("shingles")).as("s"))
        .groupBy("s").agg(count(lit(1)).as("c"))
        .agg(avg(col("c")).as("a"), count(lit(1)).as("nsh"))
        .head()
      val buckets = shingles
        .withColumn("minhash", Hashes.minhashSig(col("shingles"), mBands * mRows))
        .select(col("doc_id"),
          explode(Hashes.bandKeys(col("minhash"), mBands, mRows)).as("bucket"))
      parts += s""""n_docs":$nDocs"""
      if (occupancyOnly) {
        val (mass, mx, nb) = occupancy(buckets, col("bucket"))
        parts += s""""minhash_geometry":[$mBands,$mRows],"minhash_cand_mass":$mass,""" +
          s""""minhash_max_bucket":$mx,"minhash_buckets":$nb,""" +
          s""""docs_per_shingle":${f"${docsPerShingle.getDouble(0)}%.2f"},""" +
          s""""distinct_shingles":${docsPerShingle.getLong(1)}"""
      } else {
        val mCand = buckets.as("a")
          .join(buckets.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
          .distinct().count()
        val mTrue = TextDedup.minhashLsh(docs, mBands, mRows).count()
        parts += s""""minhash_geometry":[$mBands,$mRows],"minhash_candidates":$mCand,""" +
          s""""minhash_true":$mTrue,"minhash_cand_per_true":${f"${ratio(mCand, mTrue)}%.1f"},""" +
          s""""docs_per_shingle":${f"${docsPerShingle.getDouble(0)}%.2f"},""" +
          s""""distinct_shingles":${docsPerShingle.getLong(1)}"""
      }
    }

    if (fams("simhash")) {
      // ---- simhash side (r10: blocked-pigeonhole geometry) ----
      val sBlocks = LshGeometry.simhashBlocks(nDocs)
      // through the operator's own candidate stage (incl. the hot-bucket
      // sub-pigeonhole refinement), so the measured load IS the shuffle
      // the driver path pays — the same no-proxy rule as the hyperplane
      // side (r10 advisor)
      if (!fams("minhash")) parts += s""""n_docs":$nDocs"""
      if (occupancyOnly) {
        // Measure over the operator's REAL join keys (r12 advisor): the
        // driver path self-joins refinedKeys' (bkey, skey) — skey = 0 in
        // small buckets, the sub-pigeonhole key in hot ones — at the
        // SAME derived hotCap, so Σ C(occ,2) here IS the bucket-cojoined
        // pair mass simhashCandidates' shuffle produces. The bare-bkey
        // mass (the pre-refinement upper bound r12's artifact recorded)
        // is kept alongside as simhash_bkey_mass for cross-round
        // comparability. maxHamming comes from the operator's own
        // default, not a re-hardcoded literal.
        val keyed = TextDedup.simhashBuckets(docs,
          maxHamming = TextDedup.DefaultMaxHamming, blocks = Some(sBlocks))
        val refined = TextDedup.refinedKeys(keyed, TextDedup.hotCapFor(nDocs))
        val (mass, mx, nb) = occupancy(refined, col("bkey"), col("skey"))
        val (bMass, bMx, _) = occupancy(keyed, col("bkey"))
        parts += s""""simhash_blocks":$sBlocks,"simhash_cand_mass":$mass,""" +
          s""""simhash_max_bucket":$mx,"simhash_buckets":$nb,""" +
          s""""simhash_bkey_mass":$bMass,"simhash_bkey_max":$bMx"""
      } else {
        def simhashCand(blocks: Option[Int]): Long =
          TextDedup.simhashCandidates(docs, blocks = blocks).count()
        val sCand = simhashCand(None)
        // legacy fixed 4×16-bit chunks — the before-picture the derived
        // geometry is graded against (skipped when it IS the derived one)
        val sCandLegacy = if (sBlocks == 4) sCand else simhashCand(Some(4))
        val sTrue = TextDedup.simhashNearDups(docs).count()
        parts += s""""simhash_blocks":$sBlocks,"simhash_candidates":$sCand,""" +
          s""""simhash_candidates_legacy4":$sCandLegacy,""" +
          s""""simhash_true":$sTrue,"simhash_cand_per_true":${f"${ratio(sCand, sTrue)}%.1f"}"""
      }
    }

    if (fams("hyperplane")) {
      val emb = Tables.embeddings(spark, sfDir)
      val nVecs = emb.count()
      // derived through the SAME code path the operator uses
      // (Similarity.hyperplaneGeometryFor), so diagnostics and driver
      // can never diverge (r10 advisor)
      val (hBands, hBits) = Similarity.hyperplaneGeometryFor(nVecs)
      val base = Similarity.prepared(emb)
      val vb = base.select(col("vec_id"),
        explode(graft.functions.VectorOps.hyperplaneBands(col("v"), hBands, hBits)).as("bucket"))
      if (occupancyOnly) {
        val (mass, mx, nb) = occupancy(vb, col("bucket"))
        parts += s""""n_vecs":$nVecs,"hyperplane_geometry":[$hBands,$hBits],""" +
          s""""hyperplane_cand_mass":$mass,"hyperplane_max_bucket":$mx,""" +
          s""""hyperplane_buckets":$nb"""
      } else {
        val hCand = vb.as("a")
          .join(vb.as("b"),
            col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
          .distinct().count()
        val hTrue = Similarity.embeddingNearDupsLsh(emb, 0.45, hBands, hBits).count()
        parts += s""""n_vecs":$nVecs,"hyperplane_geometry":[$hBands,$hBits],""" +
          s""""hyperplane_candidates":$hCand,"hyperplane_true":$hTrue,""" +
          s""""hyperplane_cand_per_true":${f"${ratio(hCand, hTrue)}%.1f"}"""
      }
    }

    val json = parts.mkString("""{"metric":"lsh_candidate_load",""", ",", "}")
    println(json)
    args.lift(1).foreach(p => java.nio.file.Files.writeString(
      java.nio.file.Paths.get(p), json + "\n"))
    spark.stop()
  }
}
