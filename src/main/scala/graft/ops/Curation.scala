package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus curation — the composition a pre-training
  * data pipeline actually runs (SURVEY.md §2D): quality gate → exact
  * dedup → near-dup removal, emitting the surviving corpus.
  *
  * The near-dup stage here uses the EXACT n-gram Jaccard operator so the
  * whole pipeline stays SQL-expressible for the oracle; at 100 TB the
  * drop-in replacement is [[TextDedup.minhashLsh]], which the spec
  * proves produces identical pairs on the planted near-dups. Every
  * stage is a semi/anti join on doc_id — no data columns move through
  * the dedup machinery.
  */
object Curation {

  def curate(documents: DataFrame): DataFrame = {
    val quality = TextAnalysis.qualityFilter(documents).select("doc_id")
    val exactDups = TextDedup.exact(documents)
      .filter(col("is_dup")).select("doc_id")
    val nearDups = TextDedup.ngramJaccard(documents)
      .select(col("b_id").as("doc_id")) // keep the earlier doc of each pair
    val removed = exactDups.unionByName(nearDups).distinct()
    documents
      .join(quality, Seq("doc_id"), "left_semi")
      .join(removed, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      // global orderBy range-samples, which executes the whole pipeline
      // a second time; the survivors are small, so a single-partition
      // sort gives the same deterministic order for one execution.
      .coalesce(1)
      .sortWithinPartitions(col("doc_id"))
  }
}
