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
}
