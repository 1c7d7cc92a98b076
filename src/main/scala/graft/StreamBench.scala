package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Streaming throughput/latency bench (r10 verdict item 6: the E-family
  * was equivalence-proven but never MEASURED). Drives the two
  * continuous-ingest paths a deployment actually runs — each through
  * its REAL entry point, split into many micro-batches via
  * maxFilesPerTrigger=1 so per-batch latency is observable:
  *
  *   - '''corpus ingest''' ([[streaming.CorpusStream.ingestOnce]]):
  *     document batches through validate→dedup-vs-index→append;
  *   - '''embedding ingest''' ([[streaming.EmbeddingStream.ingestOnce]]):
  *     vector batches assigned against the stored coarse quantizer and
  *     appended into affected `cell=` partitions;
  *   - '''ANN query serving''' ([[streaming.EmbeddingStream.queryOnce]]):
  *     query batches probing the persisted index.
  *
  * Per-workload metrics, from the engine's own StreamingQueryListener
  * progress events (the numbers a Structured Streaming operator
  * monitors in production): sustained rows/s over the drain, and
  * p50/p99 micro-batch latency (triggerExecution, data batches only).
  * Prints ONE JSON line; `runMain graft.StreamBench [sfDir] [nBatches]`,
  * out file via SPARK_GRAFT_STREAM_OUT.
  */
object StreamBench {

  private final class ProgressTap extends StreamingQueryListener {
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val rows = e.progress.numInputRows
      val dur = Option(e.progress.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L)
      if (rows > 0) batches.add((rows, dur))
    }
  }

  private def stats(tap: ProgressTap, wallSec: Double): (Long, Int, Double, Long, Long) = {
    import scala.jdk.CollectionConverters._
    val bs = tap.batches.asScala.toSeq
    val rows = bs.map(_._1).sum
    val durs = bs.map(_._2).sorted
    def pct(p: Double): Long =
      if (durs.isEmpty) 0L else durs(math.min(durs.length - 1, (p * durs.length).toInt))
    (rows, bs.length, if (wallSec > 0) rows / wallSec else 0.0, pct(0.5), pct(0.99))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/data/sf1")
    val nBatches = args.lift(1).map(_.toInt).getOrElse(20)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STREAM_OUT", "stream_bench.json")
    // SPARK_GRAFT_STREAM_WORKLOADS selects workloads (default all): at
    // sf100 the ANN-serving campaign runs embedding+query alone — the
    // corpus-ingest funnel is measured at sf1/sf10 where its doc volume
    // fits a bench window.
    val workloads = sys.env.getOrElse("SPARK_GRAFT_STREAM_WORKLOADS",
      "corpus,embedding,query").split(",").map(_.trim).toSet
    val spark = GraftSession.builder(defaultCpus = "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = Files.createTempDirectory("graft_stream_bench").toString

    def staged(df: org.apache.spark.sql.DataFrame, name: String): String = {
      val dir = s"$work/$name"
      df.repartition(nBatches).write.parquet(dir)
      dir
    }

    def timed(tap: ProgressTap)(run: => Unit): Double = {
      spark.streams.addListener(tap)
      val t0 = System.nanoTime()
      try run finally spark.streams.removeListener(tap)
      (System.nanoTime() - t0) / 1e9
    }

    def block(rows: Long, batches: Int, rps: Double, p50: Long, p99: Long, wall: Double) =
      s"""{"rows":$rows,"batches":$batches,"rows_per_sec":${f"$rps%.0f"},""" +
        s""""batch_p50_ms":$p50,"batch_p99_ms":$p99,"wall_sec":${f"$wall%.1f"}}"""
    val parts = scala.collection.mutable.ArrayBuffer[String]()

    // ---- workload 1: corpus ingest (dedup-vs-index funnel) ----
    if (workloads("corpus")) {
      val docs = Tables.documents(spark, sfDir)
      val index = graft.ops.TextDedup.buildDedupIndex(docs)
      // new docs: fresh ids, text perturbed so the stream does real
      // near-dup work instead of exact-digest short-circuits
      val maxId = docs.agg(max("doc_id")).head.getLong(0)
      val newDocs = docs.select((col("doc_id") + maxId + 1).as("doc_id"),
        concat(col("text"), lit(" streamed suffix")).as("text"))
      val docsSrc = staged(newDocs, "docs_src")
      val corpusTap = new ProgressTap
      // per-stage attribution (r11 item 5): WHERE a tail batch spends its
      // time — gate (quality+dedup materialization) vs append vs report
      val stageTimes = new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()
      val corpusWall = timed(corpusTap) {
        graft.streaming.CorpusStream.ingestOnce(spark, docsSrc, index,
          s"$work/docs_dest", s"$work/docs_ckpt", maxFilesPerTrigger = 1,
          timingSink = (_, stage, ms) => stageTimes.add((stage, ms)))
      }
      val (cRows, cBatches, cRps, cP50, cP99) = stats(corpusTap, corpusWall)
      val stageJson = {
        import scala.jdk.CollectionConverters._
        stageTimes.asScala.toSeq.groupBy(_._1).toSeq.sortBy(_._1).map { case (stage, xs) =>
          val sorted = xs.map(_._2).sorted
          def pct(p: Double) = sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))
          s""""$stage":{"p50_ms":${f"${pct(0.5)}%.0f"},"p99_ms":${f"${pct(0.99)}%.0f"},"max_ms":${f"${sorted.last}%.0f"}}"""
        }.mkString("{", ",", "}")
      }
      parts += s""""corpus_ingest":${block(cRows, cBatches, cRps, cP50, cP99, corpusWall)}"""
      parts += s""""corpus_stage_ms":$stageJson"""
    }

    // ---- workload 2+3 share the served index, built at the DERIVED
    // geometry (the stored layout a deployment at this corpus size
    // would actually serve — 16 cells at gate SFs, 1024 at sf100) ----
    if (workloads("embedding") || workloads("query")) {
      val embTable = Tables.embeddings(spark, sfDir)
      val emb = graft.ops.Similarity.prepared(embTable)
      val nCells = graft.ops.LshGeometry.ivf(embTable.count())._1
      val idxPath = s"$work/ivf_index"
      graft.ops.Similarity.writeIvfPartitioned(
        graft.ops.Similarity.buildIvf(embTable, nCells), idxPath)
      parts += s""""n_cells":$nCells"""
      val maxVec = emb.agg(max("vec_id")).head.getLong(0)

      // ---- workload 2: embedding ingest (append into stored IVF cells) ----
      if (workloads("embedding")) {
        val newVecs = embTable.withColumn("vec_id", col("vec_id") + maxVec + 1)
        val embSrc = staged(newVecs, "emb_src")
        val embTap = new ProgressTap
        val embWall = timed(embTap) {
          graft.streaming.EmbeddingStream.ingestOnce(spark, embSrc, idxPath,
            s"$work/emb_ckpt", maxFilesPerTrigger = 1)
        }
        val (eRows, eBatches, eRps, eP50, eP99) = stats(embTap, embWall)
        parts += s""""embedding_ingest":${block(eRows, eBatches, eRps, eP50, eP99, embWall)}"""
      }

      // ---- workload 3: ANN query serving over the (grown) index ----
      if (workloads("query")) {
        val querySrc = staged(embTable
          .filter(col("vec_id") < nBatches * 4), "query_src")
        val qTap = new ProgressTap
        var qLoads = 0
        val qWall = timed(qTap) {
          qLoads = graft.streaming.EmbeddingStream.queryOnce(spark, querySrc, idxPath,
            s"$work/query_dest", s"$work/query_ckpt", maxFilesPerTrigger = 1)
        }
        val (qRows, qBatches, qRps, qP50, qP99) = stats(qTap, qWall)
        parts += s""""ann_query":${block(qRows, qBatches, qRps, qP50, qP99, qWall)}"""
        // the stamp-poll observable: a quiescent drain reloads the index
        // exactly once no matter how many micro-batches it serves
        parts += s""""ann_query_index_loads":$qLoads"""
        // ingest-while-serving proof: every streamed-in vector is an
        // exact twin (id + maxVec + 1) of an original, so a query's
        // top-2 must contain its own twin at cos 1.0 — served results
        // that include the appended vectors are the point of the
        // stamp-bump reload
        if (workloads("embedding")) {
          val res = spark.read.parquet(s"$work/query_dest")
          val nQ = res.select("query_id").distinct().count()
          val twins = res.filter(col("rnk") <= 2 &&
              col("neighbor_id") === col("query_id") + maxVec + 1)
            .select("query_id").distinct().count()
          parts += s""""appended_twin_in_top2_share":${
            f"${twins.toDouble / math.max(1L, nQ)}%.3f"}"""
        }
      }
    }

    val json =
      s"""{"metric":"stream_bench","sf":"$sfDir","n_batches":$nBatches,""" +
        parts.mkString(",") + "}"
    println(json)
    Files.write(Paths.get(outPath), (json + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }
}
