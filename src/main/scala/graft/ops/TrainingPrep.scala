package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-set assembly operators — the last mile of an LLM data
  * pipeline, after cleaning/dedup (SURVEY.md §2D extensions): sequence
  * packing into fixed token budgets, temperature-based source mixture
  * weighting, deterministic shard assignment for training shuffle, and
  * a C4-style blocklist filter.
  *
  * Scale rules: global order statistics (the packing prefix sum) use a
  * two-level scan — per-bucket partial sums plus a broadcast of the
  * tiny bucket-offset table — never a single-partition global window;
  * assignments are content-hash-deterministic (stable under
  * repartition, retry, and cluster size); mixture math is decimal-exact
  * where cross-engine float summation order could bite.
  */
object TrainingPrep {

  import TextDedup.normText

  private def words = filter(split(normText, " "), w => w =!= "")

  /** Sequence packing: concatenate documents in doc_id order into an
    * infinite token stream and chunk it at `budget`-token boundaries —
    * the GPT-style pretraining pack (each doc learns its stream offset,
    * pack id, offset within the pack, and whether it straddles a pack
    * boundary). The heart is a global prefix sum over token counts.
    *
    * A naive `sum().over(Window.orderBy(doc_id))` funnels the corpus
    * through ONE task. Instead this is the classic two-level scan:
    * docs map to `buckets` contiguous doc_id ranges; within-bucket
    * cumsums run as `buckets`-way parallel window partitions, and the
    * bucket offset table (one row per bucket) is prefix-summed on the
    * driver-adjacent tiny frame and broadcast back. At 100 TB, set
    * `buckets` ≈ the cluster's task count: each bucket is one
    * task-sized sort, and nothing ever converges to a single partition.
    */
  def seqPack(documents: DataFrame, budget: Int = 256,
              buckets: Int = 32): DataFrame = {
    // lazily materialized: the max-id scalar, the main scan branch and
    // the offsets branch all derive from this frame — without it the
    // tokenize kernel runs three times per call (lazy, so the seq_pack
    // plan-audit construction still runs no job)
    val toks = documents
      .select(col("doc_id"), size(words).cast("long").as("n_tokens"))
      .localCheckpoint(false)
    val maxId = toks.agg(max(col("doc_id")).as("__max_id"))
    val bucketed = toks
      .join(broadcast(maxId))
      // monotone doc_id → bucket map; doc_id*buckets stays far below 2^53
      .withColumn("__b",
        floor(col("doc_id") * buckets / (col("__max_id") + 1)).cast("long"))
      .drop("__max_id")
    val localCum = sum(col("n_tokens"))
      .over(Window.partitionBy(col("__b")).orderBy(col("doc_id")))
    // one row per bucket: the single-partition window is over a
    // `buckets`-sized frame, by construction
    val offsets = bucketed
      .groupBy(col("__b")).agg(sum(col("n_tokens")).as("__bt"))
      .withColumn("__prev", coalesce(
        sum(col("__bt")).over(
          Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__b"), col("__prev"))
    bucketed
      .withColumn("__cum", localCum)
      .join(broadcast(offsets), Seq("__b"))
      .withColumn("stream_offset",
        (col("__prev") + col("__cum") - col("n_tokens")).cast("long"))
      .withColumn("pack_id", floor(col("stream_offset") / budget).cast("long"))
      .withColumn("pack_offset", (col("stream_offset") % budget).cast("long"))
      .withColumn("spans_boundary",
        (col("pack_offset") + col("n_tokens") > budget).cast("boolean"))
      .select(col("doc_id"), col("n_tokens"), col("stream_offset"),
        col("pack_id"), col("pack_offset"), col("spans_boundary"))
  }

  /** Temperature-based source mixture weighting (the multilingual/
    * multi-domain sampling scheme: p_s ∝ n_s^α with α<1 upweights small
    * sources): per source, its raw share, its α-tempered sampling
    * weight, the document budget it receives, and the implied epoch
    * count over its data. One tiny aggregation on `source`.
    *
    * Cross-engine determinism: Σ n_s^α is a float sum whose value
    * depends on summation ORDER, and Spark's partial aggregation order
    * is not DuckDB's — so the tempered terms are rounded then summed as
    * DECIMAL (exact, order-free); only the final scalar division is
    * float, on identical inputs.
    */
  def mixWeights(documents: DataFrame, alpha: Double = 0.5,
                 budgetDocs: Long = 1000L): DataFrame = {
    val counts = documents.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val term = round(pow(col("n_docs"), alpha), 6).cast("decimal(28,6)")
    val totals = counts.agg(
      sum(col("n_docs")).as("__tot"),
      sum(term).as("__ptot"))
    counts
      .join(broadcast(totals))
      .withColumn("raw_share",
        round(col("n_docs").cast("double") / col("__tot"), 6))
      .withColumn("weight",
        round(term.cast("double") / col("__ptot").cast("double"), 6))
      .withColumn("target_n",
        round(col("weight") * budgetDocs).cast("long"))
      .withColumn("epochs",
        round(col("target_n").cast("double") / col("n_docs"), 4))
      .select(col("source"), col("n_docs"), col("raw_share"), col("weight"),
        col("target_n"), col("epochs"))
  }

  /** Materialize [[mixWeights]]'s tempered budgets into an actual
    * training-corpus manifest: per doc, how many COPIES it contributes
    * (multiple epochs of an up-weighted source are repetitions; a
    * fractional epoch is realized by giving +1 copy to exactly
    * `target_n mod n_docs` docs, chosen by deterministic per-source
    * hash rank). Per-source copy sums hit `target_n` EXACTLY — all
    * integer arithmetic, no sampling RNG, stable under repartition and
    * engine. The per-source rank uses the [[epochShuffle]] two-level
    * scan keyed by (source, hash-prefix bucket), so a 100 TB source is
    * never one window partition; budgets join in as a broadcast.
    */
  def mixSample(documents: DataFrame, alpha: Double = 0.5,
                budgetDocs: Long = 1000L): DataFrame = {
    val weights = mixWeights(documents, alpha, budgetDocs)
      .select(col("source"), col("n_docs"), col("target_n"))
    // lazily materialized: the rank branch and the offsets branch both
    // consume the hashed keying — without it the md5 keying pass runs
    // twice per call
    val keyed = documents
      .select(col("doc_id"), col("source"))
      .withColumn("__h",
        md5(concat_ws("|", col("doc_id").cast("string"), lit("graft-mix-v1"))))
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
      .localCheckpoint(false)
    val ranked = keyed.withColumn("__rn",
      row_number().over(
        Window.partitionBy(col("source"), col("__b"))
          .orderBy(col("__h"), col("doc_id"))).cast("long"))
    val offsets = keyed
      .groupBy(col("source"), col("__b")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        Window.partitionBy(col("source")).orderBy(col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("source"), col("__b"), col("__off"))
    ranked
      .join(broadcast(offsets), Seq("source", "__b"))
      .withColumn("sample_rank", col("__off") + col("__rn"))
      .join(broadcast(weights), Seq("source"))
      .withColumn("n_copies",
        expr("target_n div n_docs") +
          when(col("sample_rank") <= expr("target_n % n_docs"), lit(1L))
            .otherwise(lit(0L)))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("source"), col("sample_rank"), col("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** The packed MIXED stream — [[mixSample]]'s manifest expanded into
    * per-epoch copies, ordered epoch-major with a per-epoch
    * deterministic reshuffle (each copy of a doc lands at an
    * independent hash position, so epoch k is a fresh permutation),
    * and run through the [[seqPack]] two-level prefix scan: the final
    * (doc, copy) → (stream_offset, pack) frame is literally the read
    * plan a trainer executes against the token stream. Everything
    * upstream is ids + token counts — text is never expanded
    * `n_copies` times. The scan partitions by (copy, hash-prefix
    * bucket), so neither a big source nor a high epoch count ever
    * converges to one task; the offsets frame is epochs×256 rows.
    */
  def mixPack(documents: DataFrame, alpha: Double = 0.5,
              budgetDocs: Long = 1000L, budget: Int = 256): DataFrame = {
    val toks = documents
      .select(col("doc_id"), size(words).cast("long").as("n_tokens"))
    val units = mixSample(documents, alpha, budgetDocs)
      .select(col("doc_id"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_idx"))
      .join(toks, Seq("doc_id"))
      .withColumn("__h", md5(concat_ws("|",
        col("copy_idx").cast("string"), col("doc_id").cast("string"),
        lit("graft-mixpack-v1"))))
      .withColumn("__b", conv(substring(col("__h"), 1, 2), 16, 10).cast("int"))
      // lazily materialized: the prefix-scan branch and the offsets
      // branch both consume the expanded copy units — without it the
      // whole mixSample manifest + tokenize + explode subtree runs
      // twice per call
      .localCheckpoint(false)
    val localCum = sum(col("n_tokens")).over(
      Window.partitionBy(col("copy_idx"), col("__b"))
        .orderBy(col("__h"), col("doc_id")))
    val offsets = units
      .groupBy(col("copy_idx"), col("__b"))
      .agg(sum(col("n_tokens")).as("__bt"))
      .withColumn("__prev", coalesce(sum(col("__bt")).over(
        Window.orderBy(col("copy_idx"), col("__b"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("copy_idx"), col("__b"), col("__prev"))
    units
      .withColumn("__cum", localCum)
      .join(broadcast(offsets), Seq("copy_idx", "__b"))
      .withColumn("stream_offset",
        (col("__prev") + col("__cum") - col("n_tokens")).cast("long"))
      .withColumn("pack_id", floor(col("stream_offset") / budget).cast("long"))
      .withColumn("pack_offset", (col("stream_offset") % budget).cast("long"))
      .withColumn("spans_boundary",
        (col("pack_offset") + col("n_tokens") > budget).cast("boolean"))
      .select(col("doc_id"), col("copy_idx"), col("n_tokens"),
        col("stream_offset"), col("pack_id"), col("pack_offset"),
        col("spans_boundary"))
      .orderBy(col("stream_offset"))
  }

  /** Deterministic global shuffle + shard assignment for training-data
    * writing: shard = content-hash bucket of doc_id (engine-portable
    * md5-hex arithmetic, same trick as [[Corpus.splitAssign]]), position
    * within shard = rank by the full hash. The "shuffled" read order is
    * (shard, pos) — reproducible across runs, engines, and cluster
    * layouts, with no RNG state anywhere. One shuffle on shard; each
    * shard's rank is one window partition, so `nShards` should scale
    * with the cluster (shards ≈ output files, the usual layout).
    */
  def shardAssign(documents: DataFrame, nShards: Int = 8,
                  salt: String = "graft-shard-v1"): DataFrame = {
    val h = md5(concat_ws("|", col("doc_id").cast("string"), lit(salt)))
    val bucket = (md5HexDigit(salt, 1) * 16 + md5HexDigit(salt, 2)).cast("long")
    documents
      .select(col("doc_id"), (bucket % nShards).as("shard"), h.as("__h"))
      .withColumn("pos", row_number()
        .over(Window.partitionBy(col("shard")).orderBy(col("__h"), col("doc_id")))
        .cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Blocklist terms for [[badwordFilter]] — stand-ins for the C4/RTP
    * "bad words" list (the real list is a config file, not engine
    * semantics). Shared verbatim with the DuckDB oracle.
    */
  val Blockwords: Seq[String] = Seq("slow", "dup", "error", "bad")

  /** C4-style blocklist filter: per doc, its blocklisted-token count
    * and rate, and the drop flag at `threshold`. Emits EVERY doc with
    * its counts (filtering is the caller's one-line `.filter` away) so
    * the audit view and the gate share one pass. The blocklist is a
    * broadcast-sized constant folded into the row predicate: narrow,
    * codegen'd, zero shuffle at any scale.
    */
  def badwordFilter(documents: DataFrame,
                    threshold: Double = 0.05): DataFrame = {
    val inList = Blockwords.map(w => s"'$w'").mkString("(", ",", ")")
    documents
      .withColumn("__w", words)
      .select(
        col("doc_id"),
        size(col("__w")).cast("long").as("n_tokens"),
        expr(s"size(filter(__w, t -> t IN $inList))").cast("long").as("n_bad"))
      .withColumn("bad_ratio",
        when(col("n_tokens") === 0, lit(null).cast("double"))
          .otherwise(round(col("n_bad").cast("double") / col("n_tokens"), 4)))
      .withColumn("is_flagged",
        coalesce(col("bad_ratio") > threshold, lit(false)).cast("boolean"))
  }

  /** Fixed-token-window document chunking with overlap — the context-
    * window prep step for both training (long docs split to the model's
    * sequence budget) and retrieval (RAG passage windows). Chunk c of a
    * doc covers tokens [c·stride, c·stride + chunkSize); chunks start
    * every `stride` tokens while the start is inside the doc, so
    * consecutive chunks share `chunkSize − stride` tokens and the tail
    * chunk may be short (kept — dropping it would lose text).
    *
    * Per-row fan-out (explode over a per-doc `sequence`), no shuffle:
    * chunk count and content are pure functions of the token array, so
    * the op is embarrassingly parallel at any scale and deterministic
    * under repartition. Empty docs produce no chunks.
    */
  /** Deterministic global training-order shuffle for one epoch: every
    * doc gets a dense position 1..N in the order of a seeded content
    * hash — the reproducible permutation a trainer replays to resume
    * mid-epoch on any cluster size (no RNG state, no `rand()`:
    * md5(seed, doc_id) IS the order, so epoch k is the same permutation
    * on every engine and every retry).
    *
    * The dense rank uses the [[seqPack]] two-level scan: positions are
    * per-bucket row_numbers (bucket = first hash byte, so bucket order
    * IS hash-prefix order) plus a broadcast cumulative offset over the
    * 256-row bucket-count table — never a single-partition global
    * window. At 100 TB this is one ids-only shuffle on the hash.
    */
  def epochShuffle(documents: DataFrame, seed: Int = 0): DataFrame = {
    val keyed = documents
      .select(col("doc_id"))
      .withColumn("__key",
        md5(concat(lit(s"epoch$seed:"), col("doc_id").cast("string"))))
      .withColumn("__b", conv(substring(col("__key"), 1, 2), 16, 10).cast("int"))
    val ranked = keyed.withColumn("__rn",
      row_number().over(
        Window.partitionBy(col("__b")).orderBy(col("__key"), col("doc_id"))).cast("long"))
    val offsets = keyed
      .groupBy(col("__b")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        Window.orderBy(col("__b")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__b"), col("__off"))
    ranked
      .join(broadcast(offsets), Seq("__b"))
      .select(col("doc_id"), (col("__off") + col("__rn")).as("position"))
      .orderBy(col("position"))
  }

  def chunk(documents: DataFrame, chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    require(stride > 0 && chunkSize >= stride, "need 0 < stride <= chunkSize")
    val chunkToks = slice(col("__w"), col("chunk_id") * stride + 1, lit(chunkSize))
    documents
      .withColumn("__w", words)
      .filter(size(col("__w")) > 0)
      .withColumn("chunk_id",
        explode(sequence(lit(0), floor((size(col("__w")) - 1) / stride).cast("int"))))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        size(chunkToks).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", chunkToks).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }
}
