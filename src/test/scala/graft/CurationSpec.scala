package graft

import graft.ops.{Curation, TextDedup}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("curated corpus excludes near-dup later docs and keeps earlier ones") {
    val docs = Tables.documents(spark, sfDir)
    val out = Curation.curate(docs).select("doc_id").as[Long].collect().toSet
    val pairs = TextDedup.ngramJaccard(docs)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (_, b) => assert(!out.contains(b), s"near-dup $b survived") }
    assert(out.nonEmpty && out.size < docs.count())
  }

  test("cluster-consistent curation keeps exactly one survivor per component") {
    val docs = Tables.documents(spark, sfDir)
    val cc = Curation.curateClustered(docs).select("doc_id").as[Long].collect().toSet
    val pairwise = Curation.curate(docs).select("doc_id").as[Long].collect().toSet
    // component removal is at least as aggressive as pairwise removal
    assert(cc.subsetOf(pairwise))
    // survivors per near-dup component: exactly the canonical (when it
    // passes quality) and nothing else from that component
    val labels = graft.ops.Corpus.nearDupClusters(docs)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
    val comps = labels.groupBy(_._2).filter(_._2.length > 1)
    assert(comps.nonEmpty)
    comps.foreach { case (label, members) =>
      val survivors = members.map(_._1).filter(cc.contains)
      assert(survivors.forall(_ == label),
        s"non-canonical survivor(s) ${survivors.filterNot(_ == label).toSeq} in cluster $label")
    }
  }

  test("keep-best curation keeps the highest-quality member per component") {
    val docs = Tables.documents(spark, sfDir)
    val kept = Curation.curateKeepBest(docs).select("doc_id").as[Long].collect().toSet
    val quality = graft.ops.TextAnalysis.qualityFilter(docs, minScore = 0.0)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val gate = quality.filter(_._2 >= 0.75).keySet
    val labels = graft.ops.Corpus.nearDupClusters(docs)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
    labels.groupBy(_._2).foreach { case (_, members) =>
      val ids = members.map(_._1)
      val bestId = ids.minBy(id => (-quality(id), id))
      val survivors = ids.filter(kept.contains)
      // survivor set is exactly {best} if best passes the gate, else ∅
      val expected = if (gate.contains(bestId)) Set(bestId) else Set.empty[Long]
      assert(survivors.toSet === expected,
        s"cluster ${members.head._2}: survivors $survivors, expected $expected")
    }
    // planted cluster where best ≠ lowest id: doc 1 lacks a stopword
    // (score 0.75), doc 2 is the same text + "the" (score 1.0, jaccard
    // 0.9 — same near-dup component). keep-best must invert the
    // keep-lowest-id choice.
    val content = "quick brown foxes jump over lazy sleeping dogs near quiet rivers"
    val planted = Seq(
      (1L, content, "en", "web", content.length.toLong),
      (2L, content + " the", "en", "web", (content.length + 4).toLong),
      (3L, "completely different words about astronomy telescopes and galaxies tonight here", "en", "web", 80L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val keptP = Curation.curateKeepBest(planted).select("doc_id").as[Long].collect().toSet
    val lowP = Curation.curateClustered(planted).select("doc_id").as[Long].collect().toSet
    assert(keptP.contains(2L) && !keptP.contains(1L), s"keep-best kept $keptP, want 2 not 1")
    assert(lowP.contains(1L) && !lowP.contains(2L), s"keep-lowest kept $lowP, want 1 not 2")
  }

  test("minhash LSH is a drop-in for the exact near-dup stage on this corpus") {
    val docs = Tables.documents(spark, sfDir)
    val exact = TextDedup.ngramJaccard(docs).select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    val lsh = TextDedup.minhashLsh(docs).select("a_id", "b_id")
      .as[(Long, Long)].collect().toSet
    assert(exact === lsh)
  }

  test("IVF ANN returns k ranked candidates per query with sane recall") {
    val e = Tables.embeddings(spark, sfDir)
    val ivf = graft.ops.Similarity.knnIvf(e)
      .as[(Long, Long, Double, Long)].collect().groupBy(_._1)
    assert(ivf.size === 10)
    assert(ivf.values.forall(_.length === 5))
    val exact = graft.ops.Similarity.knnBruteForce(e)
      .as[(Long, Long, Double, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, nbrs) =>
      ivf.get(q).map(a => (a.map(_._2).toSet intersect nbrs).size / 5.0).getOrElse(0.0)
    }
    assert(recalls.sum / recalls.size > 0.3, s"IVF mean recall ${recalls.sum / recalls.size}")
  }

  test("curateRewrite: curation survivors, span-rewritten over the surviving set only") {
    val docs = Tables.documents(spark, sfDir)
    val out = Curation.curateRewrite(docs).cache()
    // exactly the curation survivor set, no more, no fewer
    val surv = Curation.curate(docs).select("doc_id")
    assert(out.select("doc_id").except(surv).count() === 0)
    assert(surv.except(out.select("doc_id")).count() === 0)
    // rewrite matches the span pass over the survivor subset (NOT over
    // the full corpus — spans of removed near-dups must not poison kept
    // docs)
    val ref = graft.ops.TextDedup.spanDedup(
      docs.join(surv, Seq("doc_id"), "left_semi"))
    assert(out.select("doc_id", "text_dedup", "segs_total", "segs_removed")
      .except(ref).count() === 0)
    // untouched docs carry their original text through the whole pipeline
    assert(out.join(docs.select(col("doc_id"), col("text")), "doc_id")
      .filter(col("segs_removed") === 0 && col("text_dedup") =!= col("text"))
      .count() === 0)
    out.unpersist()
  }
}
