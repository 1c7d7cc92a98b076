package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for LLM-training-data pipelines (SURVEY.md §2D):
  * per-document quality metrics, a marker-word language heuristic,
  * content fingerprinting, and a composite quality filter.
  *
  * Everything is per-row (narrow — no shuffle, embarrassingly parallel
  * at any scale) and built from codegen'd string/array builtins.
  */
object TextAnalysis {

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for", "on", "with")

  private def norm = lower(trim(regexp_replace(col("text"), "\\s+", " ")))
  private def toks = split(norm, " ")

  /** Token/char statistics + quality ratios per document. */
  def textStats(documents: DataFrame): DataFrame =
    documents
      .withColumn("__t", toks)
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        size(col("__t")).cast("long").as("n_tokens"),
        size(array_distinct(col("__t"))).cast("long").as("n_distinct_tokens"),
        round((length(regexp_replace(norm, " ", "")).cast("double") / size(col("__t"))), 4)
          .as("avg_token_len"),
        round(expr(s"size(filter(__t, t -> t IN ${Stopwords.map(w => s"'$w'").mkString("(", ",", ")")}))")
          .cast("double") / size(col("__t")), 4).as("stopword_ratio"),
        round((length(col("text")) - length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
          .cast("double") / length(col("text")), 4).as("punct_ratio"))

  /** Subword-ish tokenizer pattern: letter runs, digit runs, single
    * punctuation marks — the pre-tokenization split a BPE vocabulary is
    * trained over (the byte-pair merges themselves are model weights,
    * not engine semantics). Deliberately RE2-compatible (no lookahead)
    * so the same pattern runs in Spark's codegen'd regexp and the
    * DuckDB oracle.
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Token counting both ways a training pipeline needs it: whitespace
    * words (quality ratios, length caps) and BPE-ish subword pieces
    * (the cost model — tokens-per-word is the usual compression
    * signal). Narrow, codegen'd, no shuffle.
    */
  def tokenCount(documents: DataFrame): DataFrame = {
    // split("") yields [""] — guard so empty/whitespace-only docs count
    // 0 words (and a NULL ratio), not a phantom token
    val nWs = when(length(trim(col("text"))) === 0, 0L)
      .otherwise(size(split(trim(col("text")), "\\s+")).cast("long"))
    val nBpe = size(regexp_extract_all(col("text"), lit(BpePattern), lit(0))).cast("long")
    documents.select(
      col("doc_id"),
      nWs.as("n_ws_tokens"),
      nBpe.as("n_bpe_tokens"),
      when(nWs === 0, lit(null).cast("double"))
        .otherwise(round(nBpe.cast("double") / nWs, 4)).as("tokens_per_word"))
  }

  /** Marker-word language ID. Scores each candidate language by counting
    * tokens from a small marker list; argmax with a fixed precedence
    * order (en > es > de > fr), 'und' when no marker hits. A real system
    * swaps in char-n-gram profiles; the operator shape (score → argmax,
    * per-row, no shuffle) is identical.
    */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "es" -> Seq("el", "la", "los", "de", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "est", "une"))

  def langId(documents: DataFrame): DataFrame = {
    def score(lang: String): Column = {
      val set = Markers(lang).map(w => s"'$w'").mkString("(", ",", ")")
      expr(s"size(filter(__t, t -> t IN $set))").cast("long")
    }
    documents
      .withColumn("__t", toks)
      .withColumn("s_en", score("en"))
      .withColumn("s_es", score("es"))
      .withColumn("s_de", score("de"))
      .withColumn("s_fr", score("fr"))
      .withColumn("lang_guess",
        when(col("s_en") + col("s_es") + col("s_de") + col("s_fr") === 0, "und")
          .when(col("s_en") >= greatest(col("s_es"), col("s_de"), col("s_fr")), "en")
          .when(col("s_es") >= greatest(col("s_de"), col("s_fr")), "es")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr"))
      .select(col("doc_id"), col("lang").as("lang_label"), col("lang_guess"),
        col("s_en"), col("s_es"), col("s_de"), col("s_fr"))
  }

  /** Language-ID confusion matrix — the dataset-card view of
    * [[langId]]'s heuristic against the labeled corpus: per
    * (label, guess) cell, the doc count and its share of the label's
    * total (row-normalized recall diagonal). Two tiny aggregations over
    * the per-row scores; the label-total reuse is a keyed window over
    * the ≤ |labels|×|guesses| grouped frame, so nothing corpus-sized
    * ever re-shuffles.
    */
  def langConfusion(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    langId(documents)
      .groupBy(col("lang_label"), col("lang_guess"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("label_total",
        sum(col("n_docs")).over(Window.partitionBy(col("lang_label"))))
      .withColumn("share",
        round(col("n_docs").cast("double") / col("label_total"), 4))
      .select(col("lang_label"), col("lang_guess"), col("n_docs"),
        col("label_total"), col("share"))
      .orderBy(col("lang_label"), col("lang_guess"))
  }

  /** Content fingerprints: md5 of the normalized text (exact-dup key)
    * plus basic shape stats. The 64-bit rolling-hash variant lives in
    * the rows-only simhash path (graft.functions.HashKernels).
    */
  def fingerprint(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      md5(norm).as("fp_md5"),
      length(norm).cast("long").as("fp_len"),
      substring(norm, 1, 16).as("fp_head"))

  /** Within-document repetition: the fraction of a doc's word 3-gram
    * occurrences that are repeats of an earlier shingle in the same doc
    * (1 − distinct/total). High values flag boilerplate/template spam —
    * a standard pre-training quality signal orthogonal to the
    * cross-document dedup family. Per-row (narrow, one pass via the
    * ShingleHashes kernel), no shuffle at any scale.
    */
  def repetition(documents: DataFrame, n: Int = 3): DataFrame = {
    val total = greatest(size(toks) - (n - 1), lit(0)).cast("long")
    documents
      .select(
        col("doc_id"),
        total.as("n_shingles_total"),
        size(graft.functions.Hashes.shingleHashes(toks, n)).cast("long")
          .as("n_shingles_distinct"))
      .withColumn("repetition_ratio",
        when(col("n_shingles_total") === 0, lit(null).cast("double"))
          .otherwise(round(lit(1.0) -
            col("n_shingles_distinct").cast("double") / col("n_shingles_total"), 4)))
  }

  /** Composite quality score: four independent indicators, 0.25 each.
    * Filter keeps docs scoring ≥ 0.75 (at most one failed check) — the
    * usual pre-training corpus gate.
    */
  /** Per-document unigram Shannon entropy (bits) + entropy normalized
    * by its per-doc maximum log2(n_distinct) — the information-density
    * quality signal: template spam and keyword-stuffed pages score low
    * normalized entropy even when [[textStats]]' distinct-ratio looks
    * healthy (many distinct tokens, but a few dominate the mass).
    * Computed as H = log2(N) − (Σ c·log2(c))/N over the per-(doc,token)
    * counts — one narrow explode + two keyed aggregations on doc_id,
    * map-side partials absorb the token fan-out; rounded at the output
    * boundary (float summation order). Docs with no non-empty tokens
    * are absent (no mass to measure), matching the oracle.
    */
  def entropy(documents: DataFrame): DataFrame = {
    val counts = documents
      .select(col("doc_id"), explode(toks).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("__c"))
    counts.groupBy(col("doc_id"))
      .agg(
        sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("__c").cast("double") * log(2.0, col("__c"))).as("__clog"))
      // + 0.0 normalizes IEEE -0.0 (a ±1-ulp difference in either
      // engine's log2 can round to a signed zero) so both engines hash
      // the same bits
      .withColumn("entropy_bits", round(
        log(2.0, col("n_tokens")) - col("__clog") / col("n_tokens"), 4) + lit(0.0))
      .withColumn("entropy_norm", round(
        when(col("n_distinct") > 1,
          (log(2.0, col("n_tokens")) - col("__clog") / col("n_tokens"))
            / log(2.0, col("n_distinct"))).otherwise(0.0), 4) + lit(0.0))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("entropy_bits"), col("entropy_norm"))
      .orderBy(col("doc_id"))
  }

  def qualityFilter(documents: DataFrame, minScore: Double = 0.75): DataFrame = {
    val stats = textStats(documents)
    stats
      .withColumn("quality_score",
        when(col("n_tokens").between(10, 2000), 0.25).otherwise(0.0) +
          when(col("stopword_ratio").between(0.01, 0.6), 0.25).otherwise(0.0) +
          when(col("avg_token_len").between(2.0, 12.0), 0.25).otherwise(0.0) +
          when(col("n_distinct_tokens").cast("double") / col("n_tokens") >= 0.3, 0.25)
            .otherwise(0.0))
      .filter(col("quality_score") >= minScore)
      .select(col("doc_id"), col("n_tokens"), col("stopword_ratio"),
        col("avg_token_len"), col("quality_score"))
  }

  /** The "required word" list of the Gopher quality rules (Rae et al.
    * 2021, §A1.1): a doc must contain at least two of these to pass the
    * stopword check. Shared with the DuckDB oracle via
    * [[RequiredWords]]' literal rendering in SparkEntry.
    */
  val RequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style rule-based quality report (Rae et al. 2021, the
    * standard pre-training document gate; reference anchor: the
    * reference validates per-record field bounds the same way,
    * consumer/main.py's range checks — this is the text-corpus
    * analog). Emits one row per document with each rule's measured
    * ratio, its pass flag, and the conjunction `gopher_pass` — a REPORT
    * rather than a filter so downstream can audit which rule fired.
    *
    * Rules (token-level subset; the line-shape rules are vacuous on
    * single-line corpora): word count within [minWords, maxWords],
    * mean word length in [3, 10], symbol-word ratio ≤ 0.1, fraction of
    * words containing a letter ≥ 0.8, and ≥ 2 occurrences of the
    * required-stopword list. Flags are computed from the ROUNDED
    * ratios so both engines decide boundaries on identical values.
    * Per-row, codegen'd, zero shuffle at any scale.
    */
  def gopherQuality(documents: DataFrame,
                    minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val nWords = size(col("__t")).cast("long")
    val meanLen = round(
      length(regexp_replace(norm, " ", "")).cast("double") / nWords, 4)
    val symbolRatio = round(
      size(filter(col("__t"), x => x.rlike("#|\\.\\.\\.")))
        .cast("double") / nWords, 4)
    val alphaRatio = round(
      size(filter(col("__t"), x => x.rlike("[a-z]")))
        .cast("double") / nWords, 4)
    val reqHits = size(filter(col("__t"), x => x.isin(RequiredWords: _*))).cast("long")
    documents
      .withColumn("__t", toks)
      .select(
        col("doc_id"),
        nWords.as("n_words"),
        meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"),
        alphaRatio.as("alpha_ratio"),
        reqHits.as("n_required_hits"))
      .withColumn("flag_word_count",
        col("n_words").between(minWords, maxWords).cast("boolean"))
      .withColumn("flag_mean_word_len",
        col("mean_word_len").between(3.0, 10.0).cast("boolean"))
      .withColumn("flag_symbol_ratio", (col("symbol_ratio") <= 0.1).cast("boolean"))
      .withColumn("flag_alpha_ratio", (col("alpha_ratio") >= 0.8).cast("boolean"))
      .withColumn("flag_stopwords", (col("n_required_hits") >= 2).cast("boolean"))
      .withColumn("gopher_pass",
        (col("flag_word_count") && col("flag_mean_word_len") &&
          col("flag_symbol_ratio") && col("flag_alpha_ratio") &&
          col("flag_stopwords")).cast("boolean"))
      .orderBy(col("doc_id"))
  }

  // PII patterns, in application order (more-specific first so an SSN is
  // not half-eaten by the phone pattern). Written in the regex subset
  // that Java and RE2 interpret identically (no backrefs, no lookaround)
  // so the DuckDB oracle runs the very same patterns.
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\\.[A-Za-z0-9.-]+", "<EMAIL>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"),
    ("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("phone", "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b", "<PHONE>"))

  /** PII redaction — the scrub stage every pretraining pipeline runs
    * before text leaves the ingest boundary: emails, IPv4s, SSNs and
    * phone numbers replaced by typed placeholder tokens, with per-class
    * match counts for audit. Narrow and codegen'd (regexp_replace /
    * regexp_count chains); patterns applied most-specific-first so
    * overlapping classes resolve deterministically.
    */
  def piiRedact(documents: DataFrame): DataFrame = {
    val counts = PiiPatterns.map { case (name, pat, _) =>
      regexp_count(col("text"), lit(pat)).cast("long").as(s"n_$name")
    }
    val redacted = PiiPatterns.foldLeft(col("text")) {
      case (c, (_, pat, tok)) => regexp_replace(c, pat, tok)
    }
    documents
      .select(Seq(col("doc_id")) ++ counts :+ redacted.as("redacted_text"): _*)
  }
}
