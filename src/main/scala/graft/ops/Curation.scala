package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the composition a pre-training
  * data pipeline actually runs (SURVEY.md §2D): quality gate → exact
  * dedup → near-dup removal, emitting the surviving corpus.
  *
  * The near-dup stage is [[TextDedup.minhashLsh]] — the banded,
  * collision-proportional 100 TB path. The DuckDB oracle expresses the
  * same semantics with exact n-gram Jaccard; CurationSpec proves the
  * two produce the identical pair set on the planted near-dups, so the
  * pipeline output matches the SQL oracle while the plan is the one
  * you'd actually run at scale. Every stage is a semi/anti join on
  * doc_id — no data columns move through the dedup machinery, and no
  * stage collapses to a single partition (the driver canonicalizes row
  * order itself).
  */
object Curation {

  def curate(documents: DataFrame): DataFrame = {
    val quality = TextAnalysis.qualityFilter(documents).select("doc_id")
    val exactDups = TextDedup.exact(documents)
      .filter(col("is_dup")).select("doc_id")
    val nearDups = TextDedup.minhashLshAuto(documents)
      .select(col("b_id").as("doc_id")) // keep the earlier doc of each pair
    val removed = exactDups.unionByName(nearDups).distinct()
    documents
      .join(quality, Seq("doc_id"), "left_semi")
      .join(removed, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** Cluster-consistent curation: near-dup removal keeps exactly ONE
    * doc per CONNECTED COMPONENT ([[Corpus.nearDupClusters]]'s
    * canonical), not merely one per pair. The pairwise rule of
    * [[curate]] under-removes on chains whose similarity is not
    * transitive at the threshold — e.g. pairs (2,3) and (1,3) leave
    * doc 2 alive (no smaller DIRECT neighbor) even though 2 is
    * near-dup-connected to 1 via 3; the component rule keeps only
    * doc 1. This is the semantics large-scale pipelines actually want:
    * a dup CLUSTER contributes one representative, regardless of which
    * particular pairs cleared the threshold.
    */
  def curateClustered(documents: DataFrame): DataFrame = {
    val quality = TextAnalysis.qualityFilter(documents).select("doc_id")
    val exactDups = TextDedup.exact(documents)
      .filter(col("is_dup")).select("doc_id")
    val nonCanonical = Corpus.nearDupClusters(documents)
      .filter(!col("is_canonical")).select("doc_id")
    val removed = exactDups.unionByName(nonCanonical).distinct()
    documents
      .join(quality, Seq("doc_id"), "left_semi")
      .join(removed, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** The COMPLETE C4/RefinedWeb-style rewrite pipeline in one call:
    * [[curate]]'s survivor set (quality gate → exact dedup → banded
    * near-dup removal) fed through [[TextDedup.spanDedup]], so
    * boilerplate repeated ACROSS surviving documents is also cut and
    * the output carries the cleaned text itself — the frame a training
    * job actually tokenizes. Doc-level stages stay id-only joins; text
    * is touched exactly twice (survivor semi-join, span segmentation),
    * and the span winner is the combining min_by aggregate (hot-digest
    * safe). Span semantics are over SURVIVORS only — a span whose first
    * occurrence was in a removed near-dup does not poison its kept
    * twin.
    */
  def curateRewrite(documents: DataFrame): DataFrame = {
    val survivors = documents
      .join(curate(documents).select("doc_id"), Seq("doc_id"), "left_semi")
    TextDedup.spanDedup(survivors)
      .join(documents.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("lang"), col("source"), col("text_dedup"),
        col("segs_total"), col("segs_removed"))
      .orderBy(col("doc_id"))
  }

  /** Keep-BEST curation: like [[curateClustered]], one survivor per
    * near-dup connected component — but the survivor is the HIGHEST
    * QUALITY member (tie → lowest doc_id), not the lowest id. This is
    * the rule production pipelines actually want: when a Wikipedia page
    * and three scraped mirrors form one cluster, keep the clean copy,
    * whichever crawled first. Exact duplicates need no separate stage:
    * identical text ⇒ Jaccard-1 pairs ⇒ same component (and identical
    * scores, so the id tie-break picks one deterministically). A
    * cluster whose best member still fails the quality gate contributes
    * nothing — the representative must stand on its own.
    *
    * Cost over [[curateClustered]]: one extra keyed window on
    * cluster_id (clusters are tiny — near-dup groups, mostly
    * singletons) and the quality scores it ranks by; all joins remain
    * doc_id-only.
    */
  def curateKeepBest(documents: DataFrame): DataFrame = {
    // ONE quality pass serves both consumers (r16): minScore = 0.0
    // keeps every doc (scores are ≥ 0 by construction), so the ranking
    // input is unchanged and the gate is the same `≥ 0.75` cut the
    // default qualityFilter applies — previously the full textStats
    // kernel ran twice over the corpus (once for scores, once for the
    // gate). Lazily materialized: the scores frame feeds the ranking
    // join AND the gate semi-join in one plan, and Catalyst has no
    // cross-branch subplan reuse.
    val scores = TextAnalysis.qualityFilter(documents, minScore = 0.0)
      .select(col("doc_id"), col("quality_score"))
      .localCheckpoint(false)
    val best = Corpus.nearDupClusters(documents)
      .select(col("doc_id"), col("cluster_id"))
      .join(scores, Seq("doc_id"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("quality_score").desc, col("doc_id"))))
      .filter(col("__rn") === 1)
      .select("doc_id")
    documents
      .join(scores.filter(col("quality_score") >= 0.75).select("doc_id"),
        Seq("doc_id"), "left_semi")
      .join(best, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }

  /** Curation funnel report: per source, how many docs each stage of
    * [[curate]] removes (quality gate → exact dedup → near-dup) and how
    * many survive — the observability view a production ingest runs
    * after every batch, and the first thing to look at when one crawl
    * source starts polluting the corpus. Stages attribute
    * SEQUENTIALLY (a doc failing quality is not also counted as a dup),
    * so the five counts sum to n_docs per source and n_surviving
    * matches [[curate]]'s cardinality exactly. Each stage contributes a
    * doc_id-only flag frame; the report is one left-join chain over
    * ids + a source-keyed count — no text moves, and the output is
    * source-cardinality-sized.
    */
  def curationReport(documents: DataFrame): DataFrame = {
    val quality = TextAnalysis.qualityFilter(documents)
      .select(col("doc_id"), lit(1).as("__q"))
    val exactDups = TextDedup.exact(documents).filter(col("is_dup"))
      .select(col("doc_id"), lit(1).as("__e"))
    val nearDups = TextDedup.minhashLshAuto(documents)
      .select(col("b_id").as("doc_id")).distinct()
      .withColumn("__n", lit(1))
    documents.select(col("doc_id"), col("source"))
      .join(quality, Seq("doc_id"), "left")
      .join(exactDups, Seq("doc_id"), "left")
      .join(nearDups, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("__q").isNull, 1)).as("n_quality_fail"),
        count(when(col("__q").isNotNull && col("__e").isNotNull, 1)).as("n_exact_dup"),
        count(when(col("__q").isNotNull && col("__e").isNull && col("__n").isNotNull, 1))
          .as("n_near_dup"),
        count(when(col("__q").isNotNull && col("__e").isNull && col("__n").isNull, 1))
          .as("n_surviving"))
      .orderBy(col("source"))
  }
}
