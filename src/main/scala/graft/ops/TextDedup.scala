package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Hashes

/** Document deduplication for LLM-training-data pipelines (SURVEY.md
  * §2D): exact, MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale design: the exact all-pairs Jaccard exists as the small-scale
  * oracle; the 100 TB paths are the banded ones (MinHash bands, SimHash
  * chunks), where candidate generation is an equi-join on band keys —
  * collision-proportional, never O(n²) — followed by exact verification
  * only on candidates. All hashing uses codegen'd builtins
  * (xxhash64/concat) or the custom one-pass [[graft.functions.SimHash64]]
  * expression.
  */
object TextDedup {

  /** Whitespace-normalized lowercase text — the canonical form. */
  def normText = lower(trim(regexp_replace(col("text"), "\\s+", " ")))

  private def tokens = split(normText, " ")

  /** Word n-gram shingles (default 3), distinct per doc. */
  def shingles(n: Int = 3) =
    array_distinct(expr(
      s"transform(sequence(0, greatest(size(split(lower(trim(regexp_replace(text, '\\\\s+', ' '))), ' ')) - $n, -1)), " +
        s"i -> concat_ws(' ', slice(split(lower(trim(regexp_replace(text, '\\\\s+', ' '))), ' '), i + 1, $n)))"))

  /** Exact dedup: group identical normalized text, canonical = min
    * doc_id. Output one row per doc with its canonical id + dup flag.
    * At scale this is one hash shuffle on a 64-bit digest of the
    * normalized text (not the text itself).
    */
  def exact(documents: DataFrame): DataFrame = {
    val w = Window.partitionBy(xxhash64(normText), normText)
    documents
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", (col("doc_id") =!= col("canonical_id")).cast("boolean"))
      .select(col("doc_id"), col("canonical_id"), col("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** Exact n-gram Jaccard near-dup pairs via an inverted shingle index:
    * explode distinct shingles, equi-join on shingle, count common,
    * Jaccard from sizes. This is exact and serves as the oracle for the
    * approximate variants; at 100 TB frequent shingles make the index
    * join skewed — that is what [[minhashLsh]] is for.
    */
  def ngramJaccard(documents: DataFrame, n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = documents
      .select(col("doc_id"), explode(shingles(n)).as("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("doc_id").as("a_id"), col("n_sh").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n_sh").as("nb")), "b_id")
      .withColumn("jaccard_raw", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("jaccard_raw") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard_raw"), 4).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** MinHash signatures: k independent hash functions simulated by
    * seeding xxhash64 with the permutation index; signature element i =
    * min over shingles. Computed per-row with codegen'd array exprs (no
    * explode/shuffle for the signature itself).
    */
  def minhashSignatures(documents: DataFrame, k: Int = 64): DataFrame = {
    val sig = array((0 until k).map { i =>
      array_min(expr(s"transform(__sh, s -> xxhash64(s, $i))"))
    }: _*)
    documents
      .withColumn("__sh", shingles())
      .filter(size(col("__sh")) > 0)
      .withColumn("minhash", sig)
      .select(col("doc_id"), col("__sh").as("shingles"), col("minhash"))
  }

  /** MinHash + LSH banding: b bands of r rows (k = b*r); docs sharing a
    * band bucket become candidates; candidates are verified with exact
    * Jaccard on their shingle sets. One explode to (doc × band), one
    * equi-join on (band, bucket) — collision-proportional work, the
    * 100 TB-safe shape.
    */
  def minhashLsh(documents: DataFrame, bands: Int = 16, rows: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    val sigs = minhashSignatures(documents, bands * rows)
    val banded = sigs.select(
      col("doc_id"), col("shingles"),
      posexplode(array((0 until bands).map { b =>
        xxhash64(concat_ws(",",
          (0 until rows).map(r => col("minhash").getItem(b * rows + r)): _*), lit(b))
      }: _*)).as(Seq("band", "bucket")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.shingles").as("sh_a"), col("b.shingles").as("sh_b"))
      .dropDuplicates("a_id", "b_id")
    cand
      .withColumn("jaccard_raw",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard_raw") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard_raw"), 4).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** SimHash near-dups: one-pass 64-bit simhash (custom codegen
    * expression), banded into 4×16-bit chunks — two docs within hamming
    * distance 3 must share at least one chunk — then exact hamming
    * verification on candidates.
    */
  def simhashNearDups(documents: DataFrame, maxHamming: Int = 3): DataFrame = {
    val sh = documents
      .withColumn("sim", Hashes.simhash64(tokens))
      .select(col("doc_id"), col("sim"))
    val chunked = sh.select(col("doc_id"), col("sim"),
      posexplode(array((0 until 4).map { c =>
        shiftrightunsigned(col("sim"), c * 16).bitwiseAND(lit(0xffffL))
      }: _*)).as(Seq("chunk", "ckey")))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ckey") === col("b.ckey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", expr("bit_count(sim_a ^ sim_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }
}
