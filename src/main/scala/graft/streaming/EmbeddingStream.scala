package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.ops.Similarity

/** Continuous vector ingest — the streaming face of
  * [[graft.ops.Similarity.appendToIvfPartitioned]]: embedding batches
  * land as files and each micro-batch is assigned against the stored
  * coarse quantizer and appended into only the affected `cell=`
  * partitions of the persisted IVF index. This is how a vector store
  * grows under continuous embedding production (the crawl→embed→index
  * tail of the pipeline) without ever rebuilding or re-shuffling the
  * indexed corpus: per-batch cost ∝ batch size, and serving queries
  * ([[graft.ops.Similarity.queryIvf]]) see new vectors as soon as
  * their files land.
  *
  * Exactly-once is layered: the checkpoint makes each FILE processed
  * once per checkpoint lineage, and the append's vec_id anti-join
  * guard makes redelivery with a fresh/lost checkpoint a no-op rather
  * than a duplicate-candidate source — both layers are spec-driven.
  * The quantizer stays FIXED across appends (spec-proven ≡
  * KMeans.transform); drift shows up in ivf_cell_stats and triggers an
  * offline retrain, never an in-stream one.
  */
object EmbeddingStream {

  /** Drain all staged embedding files into the persisted index at
    * `indexPath` ([[graft.ops.Similarity.writeIvfPartitioned]] layout).
    * `Trigger.AvailableNow` processes the backlog and terminates; a
    * live deployment swaps in a processing-time trigger on the same
    * DAG and checkpoint.
    */
  def ingestOnce(spark: SparkSession, srcDir: String, indexPath: String,
                 checkpointDir: String): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    spark.readStream
      .schema(schema)
      .parquet(srcDir)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Similarity.appendToIvfPartitioned(indexPath, batch)
        ()
      }
      .start()
      .awaitTermination()
  }
}
