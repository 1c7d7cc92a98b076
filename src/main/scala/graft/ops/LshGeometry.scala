package graft.ops

/** Corpus-size-derived LSH band geometry — the round-9 verdict's ask:
  * stop hard-coding (bands, rows) and derive them from n with the
  * recall floor re-derived per geometry, so the same entry point is
  * correctly tuned at sf0.01 and at 100 TB.
  *
  * Two families, two knobs each:
  *
  * '''MinHash (Jaccard) banding''' — b bands of r minhashes; a pair at
  * Jaccard j collides in one band with probability j^r, in any band
  * with 1−(1−j^r)^b (Leskovec/Rajaraman/Ullman, MMDS ch. 3). The band
  * KEY space is an unbounded hash, so bucket occupancy never
  * saturates; what grows with n is the number of low-similarity pairs
  * that sneak past r minhash agreements. Rows therefore grow
  * logarithmically with the corpus (each extra row multiplies a
  * background pair's collision odds by j_bg < 1), and bands are then
  * re-derived so the recall floor at the corpus's minimum true-dup
  * Jaccard stays put. With j_bg ≈ 0.3, r(n) = log4(n/50) suppresses
  * background collisions by ~n⁻¹·⁰ relative to fixed geometry —
  * candidates stay ∝ true dups instead of ∝ n²/|shingle space|.
  *
  * '''Random-hyperplane (cosine) banding''' — b bands of k sign bits;
  * p_bit(c) = 1 − acos(c)/π, band collision p_bit^k. Here the band key
  * space IS 2^k, so k must grow as log2(n/occupancy) to keep bucket
  * occupancy (and with it the n²/2^k background candidate mass)
  * bounded; bands are re-derived for the recall target at the
  * verification threshold, under a hard cost cap (bands·bits planes
  * per vector). Past the cap the floor at the THRESHOLD honestly
  * degrades — by design: at 0.45 cosine the LSH exponent
  * ρ = ln(1/p1)/ln(1/p2) ≈ 0.63 makes threshold-recall exponentially
  * expensive at scale, while real corpora put true near-dups at
  * 0.85+, where the same geometry's floor stays ≈ 1 (report both with
  * [[hyperplaneRecall]]; the scale gate measures recall against the
  * exact oracle and asserts the dup-level floor).
  *
  * The constants are anchored so the DRIVER-gate corpora reproduce the
  * r1–r9 hand-tuned geometries exactly — (16, 4) minhash below ~6k
  * docs, (32, 4) hyperplane below ~800 vectors — so every strict
  * oracle gate keeps its measured behavior, and the formula only
  * changes what was never gate-locked: the geometry at scale.
  */
object LshGeometry {

  /** Per-bit collision probability of a hyperplane for a pair at
    * cosine c (Goemans–Williamson / Charikar 2002). */
  def pBit(cos: Double): Double = 1.0 - math.acos(cos) / math.Pi

  /** Any-of-b-bands collision probability for a pair at cosine `cos`
    * under (bands, bitsPerBand) — the per-pair recall floor. */
  def hyperplaneRecall(cos: Double, bands: Int, bitsPerBand: Int): Double =
    1.0 - math.pow(1.0 - math.pow(pBit(cos), bitsPerBand), bands)

  /** Any-of-b-bands collision probability for a pair at Jaccard `j`
    * under (bands, rows) — the per-pair recall floor. */
  def minhashRecall(j: Double, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(j, rows), bands)

  /** (bands, rows) for an n-document corpus.
    *
    * rows = max(4, ⌈log₄(n/50)⌉): every extra row costs a background
    * pair (j_bg ≲ 0.3 in any non-degenerate corpus) ≥ 4× collision
    * odds, so growing rows with log₄ n keeps expected false candidates
    * per doc ~flat as n grows. bands is then the smallest b with
    * 1−(1−j₀^r)^b ≥ 1−targetMiss at j₀ = the minimum Jaccard of a pair
    * the op must find (the " dup"-suffix injection floor (w−2)/(w−1) ≥
    * 0.889 at w = 10 — and any REAL near-dup definition sits at 0.8+).
    * Floored at the r1–r9 geometry (16, 4) so driver-gate corpora are
    * bit-for-bit unchanged.
    */
  def minhash(n: Long, minDupJaccard: Double = 0.889,
              targetMiss: Double = 1e-6): (Int, Int) = {
    val rows = math.max(4, math.ceil(math.log(n / 50.0) / math.log(4.0)).toInt)
    val pBand = math.pow(minDupJaccard, rows)
    val bands = math.max(16,
      math.ceil(math.log(1.0 / targetMiss) / -math.log1p(-pBand)).toInt)
    (bands, rows)
  }

  /** (bands, bitsPerBand) for an n-vector corpus.
    *
    * bits = max(4, ⌈log₂(n/occupancy)⌉) keeps expected bucket
    * occupancy (and the n²/2^bits background candidate mass per band)
    * bounded; bands = smallest b with recall ≥ 1−targetMiss at the
    * verification `threshold`, capped at `maxBands` (the per-vector
    * cost ceiling — past it the threshold floor degrades honestly
    * while the 0.85+ true-dup floor stays ≈ 1; see the header).
    * targetMiss = 0.002 anchors bits=4 → bands=32, the r1–r9 geometry,
    * so sub-800-vector (driver-gate) corpora are unchanged.
    */
  def hyperplane(n: Long, threshold: Double = 0.45,
                 targetMiss: Double = 0.002, occupancy: Int = 50,
                 maxBands: Int = 128): (Int, Int) = {
    val bits = math.max(4, math.ceil(math.log(n / occupancy.toDouble) / math.log(2.0)).toInt)
    val pBand = math.pow(pBit(threshold), bits)
    val bands = math.min(maxBands,
      math.max(1, math.ceil(math.log(1.0 / targetMiss) / -math.log1p(-pBand)).toInt))
    (bands, bits)
  }
}
