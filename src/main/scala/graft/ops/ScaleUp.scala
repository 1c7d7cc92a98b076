package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-out generator: synthesize an sfN corpus from the
  * driver's sf0.1 tables (TESTDATA.md) so the 100×-scale design claims
  * can be validated EMPIRICALLY, not just by plan audits — the round-7
  * verdict's top ask. Two synthesis modes, chosen per table for the one
  * property that matters at each:
  *
  *  - **Relational tables + events: replicate-with-key-offset.** Copy
  *    `c` of a row offsets every primary/foreign key by `c × keyBase`
  *    (base = max(key)+1 of the source), leaving all other columns
  *    untouched. This preserves EVERY value distribution, null rate,
  *    per-key fan-out and join selectivity of the driver's data exactly
  *    — so a query's work grows exactly ×K and its sf0.1→sf1 wall-time
  *    ratio is a clean linearity measurement. FK integrity holds
  *    because parent and child tables offset the shared key by the same
  *    base (the TPC-H scaling model: more customers/orders/parts, same
  *    densities; nation/region stay fixed like TPC-H).
  *  - **documents + embeddings: fresh model-based generation.**
  *    Replicating text/vectors would make every row an exact cross-copy
  *    duplicate of K−1 others, exploding near-dup candidate counts
  *    ~K× per row (quadratic pair growth) and turning every dedup
  *    operator's scaling curve into an artifact of the generator.
  *    Instead documents/embeddings are regenerated from the measured
  *    model of the driver's own data (same vocabulary, length law, dup
  *    and near-dup injection rates, unit-norm random vectors), keyed
  *    purely on (seed, id) — embarrassingly parallel, no driver-side
  *    RNG state, reproducible at any scale, like [[Generator]].
  *
  * Measured model of the driver's documents (sf0.1, 5 000 docs):
  * 30-word uniform vocabulary; word count uniform in [10,100];
  * lang P(en)=0.41 and fr/de/es/zh ≈ 0.1475 each, independent of the
  * text; sources src0..src19 uniform; ~5% of docs are NEAR-DUPS (a copy
  * of an earlier doc with the rare token " dup" appended — 250/5 000
  * docs contain "dup") and ~0.2% are EXACT dups of an earlier doc
  * (8 dup groups / 5 000). Embeddings are 64-dim unit-norm isotropic
  * random vectors (measured: ‖v‖=1±1e-7, within-label mean pairwise
  * cos ≈ 0.003 — labels are NOT geometric clusters) with labels
  * uniform in 0..9.
  *
  * Output layout: each table is a DIRECTORY `<out>/<name>.parquet/`
  * of range-partitioned files clustered on its primary key (events on
  * `ts` — the time axis the partition-pruning queries cut on), sized
  * `targetRowsPerFile`. At 100 TB a table IS a partitioned directory;
  * a single coalesced file would cap scan parallelism at its row-group
  * count and make every sfN timing an artifact of the writer.
  */
object ScaleUp {

  /** Uniform double in [0,1) from (id column, tag, seed) — same hash
    * mixing as [[Generator.u]]. */
  private def u(id: Column, tag: Int, seed: Long): Column =
    pmod(xxhash64(id, lit(tag), lit(seed)), lit(1L << 52)).cast("double") /
      lit((1L << 52).toDouble)

  /** Replicate `df` K times, adding `copy * base` to each listed key
    * column. Non-key columns (including NULL keys — NULL + x = NULL)
    * pass through untouched, so every distribution survives exactly.
    */
  def replicate(df: DataFrame, k: Int, keyBases: Map[String, Long]): DataFrame = {
    require(k >= 1, s"scale factor k=$k must be >= 1")
    val copies = explode(sequence(lit(0L), lit(k - 1L))).as("__copy")
    val out = df.select(col("*"), copies)
    out.select(df.columns.map { c =>
      keyBases.get(c) match {
        case Some(base) => (col(c) + col("__copy") * base).as(c)
        case None       => col(c)
      }
    }.toIndexedSeq: _*)
  }

  /** max(key)+1 of the source table — the offset stride that keeps
    * replicated key ranges disjoint. Metadata-sized driver fetch (one
    * long), same class as a snapshot-manifest read.
    */
  private def keyBase(df: DataFrame, key: String): Long =
    df.agg(max(col(key))).head.getLong(0) + 1L

  /** The 30-word vocabulary measured from the driver's documents (each
    * ≈ 9 000 occurrences at sf0.1; "dup" is the near-dup marker token,
    * not vocabulary). Includes the [[TrainingPrep.Blockwords]] "slow"
    * so badword/quality filters see realistic hit rates.
    */
  val Vocab: Seq[String] = Seq(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch")

  /** Word-salad text as a PURE function of (sid, seed): word count
    * uniform in [10,100], each word an independent uniform draw from
    * [[Vocab]]. Purity is what makes dup injection joinless — a dup's
    * text is recomputed from its source id, not copied via a self-join.
    */
  private def textOf(sid: Column, seed: Long): Column = {
    val vocabArr = array(Vocab.map(lit): _*)
    val wc = (pmod(xxhash64(sid, lit(10), lit(seed)), lit(91L)) + 10L).cast("int")
    array_join(
      transform(sequence(lit(1), wc), i =>
        element_at(vocabArr,
          (pmod(xxhash64(sid, i, lit(11), lit(seed)), lit(Vocab.size.toLong)) + 1L)
            .cast("int"))),
      " ")
  }

  /** Generate `n` documents with the measured driver model. Dup
    * structure is blockwise: within each block of 1 000 ids, slots
    * 0..949 are originals, 950..997 (4.8%) are near-dups (an original
    * of the same block + " dup"), 998..999 (0.2%) exact dups — rates
    * matching the measured 5% / 0.16%. Blocks make the source-doc
    * choice local and joinless while keeping dup pairs spread across
    * the whole id range like the driver's (pair distance is uniform
    * within a block).
    */
  def documents(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val id = col("doc_id")
    val block = (id - pmod(id, lit(1000L)))
    val slot = pmod(id, lit(1000L))
    // originals available to copy in this block (short final block safe)
    val origs = least(lit(950L), lit(n) - block)
    val src = block + pmod(xxhash64(id, lit(12), lit(seed)), origs)
    val isNear = slot >= 950 && slot < 998
    val isExact = slot >= 998
    val sid = when(isNear || isExact, src).otherwise(id)
    val text = when(isNear, concat(textOf(sid, seed), lit(" dup")))
      .otherwise(textOf(sid, seed))
    val lu = u(id, 13, seed)
    val lang = when(lu < 0.41, "en")
      .when(lu < 0.5575, "fr")
      .when(lu < 0.705, "de")
      .when(lu < 0.8525, "es")
      .otherwise("zh")
    spark.range(n).select(col("id").as("doc_id"))
      .withColumn("text", text)
      .withColumn("lang", lang)
      .withColumn("source",
        concat(lit("src"), pmod(xxhash64(id, lit(14), lit(seed)), lit(20L)).cast("string")))
      .withColumn("n_chars", length(col("text")))
  }

  /** Generate `n` unit-norm isotropic random `dim`-vectors (Box-Muller
    * gaussians from hash-uniforms, normalized in double, stored float —
    * the driver's ‖v‖=1±1e-7 shape) with labels uniform in 0..9.
    */
  def embeddings(spark: SparkSession, n: Long, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val id = col("vec_id")
    val gauss = transform(sequence(lit(0), lit(dim - 1)), i => {
      // u1 in (0,1] so log(u1) is finite; u2 in [0,1)
      val u1 = (pmod(xxhash64(id, i, lit(20), lit(seed)), lit(1L << 52)).cast("double") + 1.0) /
        lit((1L << 52).toDouble)
      val u2 = pmod(xxhash64(id, i, lit(21), lit(seed)), lit(1L << 52)).cast("double") /
        lit((1L << 52).toDouble)
      sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
    })
    spark.range(n).select(col("id").as("vec_id"))
      .withColumn("__raw", gauss)
      .withColumn("__norm",
        sqrt(aggregate(col("__raw"), lit(0.0), (acc, x) => acc + x * x)))
      .withColumn("embedding",
        transform(col("__raw"), x => (x / col("__norm")).cast("float")))
      .withColumn("label", pmod(xxhash64(id, lit(22), lit(seed)), lit(10L)).cast("int"))
      .select("vec_id", "embedding", "label")
  }

  /** Write `df` as `<outDir>/<name>.parquet/` range-partitioned (and so
    * clustered) on `clusterKey`, ~`targetRowsPerFile` rows per file.
    */
  def writeTable(df: DataFrame, outDir: String, name: String,
                 clusterKey: String, rows: Long,
                 targetRowsPerFile: Long = 500000L): Unit = {
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val clustered =
      if (nFiles == 1) df.coalesce(1)
      else df.repartitionByRange(nFiles, col(clusterKey))
    clustered.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
  }

  /** Synthesize a ×`k` corpus from `srcDir` into `outDir`: relational
    * tables + events replicated with consistent key offsets,
    * documents/embeddings regenerated at ×`k` row counts.
    */
  def scaleCorpus(spark: SparkSession, srcDir: String, outDir: String,
                  k: Int, seed: Long = 42L): Unit = {
    import graft.Tables
    // fixed dimensions: same 5 regions / 25 nations at every SF (TPC-H)
    writeTable(Tables.region(spark, srcDir), outDir, "region", "r_regionkey", 5)
    writeTable(Tables.nation(spark, srcDir), outDir, "nation", "n_nationkey", 25)

    val customer = Tables.customer(spark, srcDir)
    val supplier = Tables.supplier(spark, srcDir)
    val part = Tables.part(spark, srcDir)
    val orders = Tables.orders(spark, srcDir)
    val lineitem = Tables.lineitem(spark, srcDir)
    val events = Tables.events(spark, srcDir)
    val custBase = keyBase(customer, "c_custkey")
    val suppBase = keyBase(supplier, "s_suppkey")
    val partBase = keyBase(part, "p_partkey")
    val orderBase = keyBase(orders, "o_orderkey")
    val eventBase = keyBase(events.filter(col("event_id").isNotNull), "event_id")
    val userBase = keyBase(events.filter(col("user_id").isNotNull), "user_id")

    def n(df: DataFrame): Long = df.count() * k
    writeTable(replicate(customer, k, Map("c_custkey" -> custBase)),
      outDir, "customer", "c_custkey", n(customer))
    writeTable(replicate(supplier, k, Map("s_suppkey" -> suppBase)),
      outDir, "supplier", "s_suppkey", n(supplier))
    writeTable(replicate(part, k, Map("p_partkey" -> partBase)),
      outDir, "part", "p_partkey", n(part))
    writeTable(replicate(orders, k,
      Map("o_orderkey" -> orderBase, "o_custkey" -> custBase)),
      outDir, "orders", "o_orderkey", n(orders))
    writeTable(replicate(lineitem, k,
      Map("l_orderkey" -> orderBase, "l_partkey" -> partBase, "l_suppkey" -> suppBase)),
      outDir, "lineitem", "l_orderkey", n(lineitem))
    // events cluster on the time axis — the partition-pruning dimension
    writeTable(replicate(events, k,
      Map("event_id" -> eventBase, "user_id" -> userBase)),
      outDir, "events", "ts", n(events))

    val nDocs = Tables.documents(spark, srcDir).count() * k
    val nVecs = Tables.embeddings(spark, srcDir).count() * k
    writeTable(documents(spark, nDocs, seed), outDir, "documents", "doc_id", nDocs)
    writeTable(embeddings(spark, nVecs, seed = seed), outDir, "embeddings", "vec_id", nVecs)
  }
}
