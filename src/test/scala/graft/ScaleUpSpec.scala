package graft

import graft.ops.ScaleUp
import org.apache.spark.sql.functions._

/** Contract tests for the scale-out generator: replication preserves
  * distributions and FK integrity with disjoint key ranges; generated
  * documents/embeddings match the measured driver model (dup rates,
  * vocabulary, unit norms); everything is deterministic from (seed, id).
  */
class ScaleUpSpec extends SparkSpec {
  import spark.implicits._

  test("replicate: xK rows, disjoint key ranges, non-key columns untouched") {
    val src = Tables.customer(spark, sfDir)
    val n = src.count()
    val base = src.agg(max($"c_custkey")).head.getLong(0) + 1
    val out = ScaleUp.replicate(src, 3, Map("c_custkey" -> base))
    assert(out.count() === 3 * n)
    assert(out.select($"c_custkey").distinct().count() === 3 * n,
      "offset keys must stay unique across copies")
    // every non-key distribution is copied exactly: per-copy value
    // multisets equal the source's
    val perSeg = out.groupBy($"c_mktsegment").count().as[(String, Long)]
      .collect().toMap
    val srcSeg = src.groupBy($"c_mktsegment").count().as[(String, Long)]
      .collect().toMap
    assert(perSeg === srcSeg.map { case (k, v) => k -> v * 3 })
  }

  test("replicate: null keys stay null (events DLQ rate survives scaling)") {
    val ev = Tables.events(spark, sfDir)
    val nulls = ev.filter($"user_id".isNull).count()
    val out = ScaleUp.replicate(ev, 2, Map("user_id" -> 10000L, "event_id" -> 100000L))
    assert(out.filter($"user_id".isNull).count() === 2 * nulls)
  }

  test("replicated orders/lineitem keep FK integrity") {
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    val oBase = orders.agg(max($"o_orderkey")).head.getLong(0) + 1
    val o2 = ScaleUp.replicate(orders, 2, Map("o_orderkey" -> oBase))
    val l2 = ScaleUp.replicate(lineitem, 2, Map("l_orderkey" -> oBase))
    val orphans = l2.join(o2, l2("l_orderkey") === o2("o_orderkey"), "left_anti")
    assert(orphans.count() === 0, "every scaled lineitem must join an order")
    // fan-out preserved: lineitems per order distribution is unchanged
    val fan = l2.groupBy($"l_orderkey").count().groupBy($"count").count()
      .as[(Long, Long)].collect().toMap
    val srcFan = lineitem.groupBy($"l_orderkey").count().groupBy($"count").count()
      .as[(Long, Long)].collect().toMap
    assert(fan === srcFan.map { case (k, v) => k -> v * 2 })
  }

  test("documents: model rates (length, near-dup, exact-dup, langs) and determinism") {
    val docs = ScaleUp.documents(spark, 5000L).cache()
    assert(docs.count() === 5000)
    // near-dups: slots 950..997 of each 1000-block = 4.8%, all end " dup"
    val nears = docs.filter($"text".endsWith(" dup")).count()
    assert(nears === 48 * 5, s"expected 240 near-dups, got $nears")
    // exact dups: each 998/999 slot shares its text with an original
    val dupDocs = docs.groupBy($"text").count().filter($"count" > 1)
    assert(dupDocs.count() >= 8, "exact-dup groups must exist at the driver's rate")
    // word count law 10..100
    val wc = docs.select(size(split($"text", " ")).as("wc"))
      .agg(min($"wc"), max($"wc")).as[(Int, Int)].head()
    assert(wc._1 >= 10 && wc._2 <= 101) // +1 for the " dup" suffix
    // Zipf head: the curated stopword/domain head must all occur, and
    // "the" (rank 0) must be the most frequent token overall
    val freq = docs.select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").count().as[(String, Long)].collect().toMap
    ScaleUp.HeadVocab.foreach(w => assert(freq.contains(w), s"head word $w missing"))
    assert(freq("the") === freq.filterKeys(_ != "dup").values.max,
      "Zipf rank 0 must dominate")
    // langs complete and en-heavy, like the driver's 41/14.75×4 split
    val langs = docs.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(langs.keySet === Set("en", "fr", "de", "es", "zh"))
    assert(langs("en") > langs("fr"))
    assert(docs.select($"n_chars" === length($"text")).as[Boolean].collect().forall(identity))
    // a near-dup's language follows its SOURCE text: its lang-marker
    // words must be consistent with the label (spot-check: fr-labeled
    // docs carry fr markers at the injection rate)
    val frMarked = docs.filter($"lang" === "fr" && size(split($"text", " ")) >= 50)
      .filter($"text".rlike("\\b(le|les|et|est|une)\\b")).count()
    val frTotal = docs.filter($"lang" === "fr" && size(split($"text", " ")) >= 50).count()
    assert(frMarked.toDouble / frTotal > 0.8, "fr docs must carry fr markers")
    // pure function of (seed, id): regeneration is bit-identical
    val again = ScaleUp.documents(spark, 5000L)
    assert(docs.except(again).count() === 0 && again.except(docs).count() === 0)
    docs.unpersist()
  }

  test("documents: Heaps-law vocabulary keeps docs-per-shingle flat as the corpus grows") {
    // THE property the r8 generator lacked (SCALE.md §3: 30 words →
    // docs-per-shingle grew 9.6 → 95.2 at ×10, making every
    // signature-collision candidate count ~n²). Under Heaps' law the
    // shingle space outgrows the corpus: average docs-per-distinct-
    // 3-shingle must stay ~flat across a 4× corpus growth.
    def docsPerShingle(n: Long): Double = {
      val rows = ScaleUp.documents(spark, n)
        .select($"doc_id", explode(expr(
          "array_distinct(transform(sequence(1, size(split(text,' ')) - 2)," +
            " i -> concat_ws(' ', slice(split(text,' '), i, 3))))")).as("s"))
      val (nRows, nDistinct) = (rows.count(), rows.select($"s").distinct().count())
      nRows.toDouble / nDistinct
    }
    val small = docsPerShingle(2000L)
    val large = docsPerShingle(8000L)
    assert(large / small < 1.6,
      s"docs-per-shingle must stay ~flat under 4x growth: $small -> $large")
    // vocabulary actually grows (Heaps), it is not a fixed list
    assert(ScaleUp.vocabSize(8000) > ScaleUp.vocabSize(2000))
  }

  test("embeddings: unit-norm 256-dim, micro-clustered, linear dup structure, deterministic") {
    val e = ScaleUp.embeddings(spark, 2000L).cache()
    assert(e.count() === 2000)
    val norms = e.select(
      sqrt(aggregate($"embedding", lit(0.0), (a, x) => a + x * x)).as("n"))
      .agg(min($"n"), max($"n")).as[(Double, Double)].head()
    assert(math.abs(norms._1 - 1.0) < 1e-5 && math.abs(norms._2 - 1.0) < 1e-5)
    assert(e.select(size($"embedding")).distinct().as[Int].head() === 256)
    val labels = e.select($"label").distinct().as[Int].collect().toSet
    assert(labels.subsetOf((0 to 9).toSet) && labels.size === 10)
    // dup slots sit far above the 0.45 threshold; everything else far
    // below — the bimodal margin that makes the ≥0.45 pair set linear
    val pairs = graft.ops.Similarity.embeddingNearDups(e, threshold = 0.45)
      .select($"a_id", $"b_id", $"cos_sim").as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty, "injected dup pairs must exist")
    assert(pairs.forall(_._3 >= 0.80),
      s"no background pair may sit near the threshold: min=${pairs.map(_._3).min}")
    // every ≥0.45 pair involves a dup slot (slot >= 950 in its block)
    assert(pairs.forall { case (a, b, _) => a % 1000 >= 950 || b % 1000 >= 950 },
      "the over-threshold mass must be the injected dup structure")
    // exact-dup slots (998/999) are bit-identical to their source
    val exacts = pairs.filter { case (_, b, c) => b % 1000 >= 998 && c >= 0.9999 }
    assert(exacts.nonEmpty, "exact-dup copies must exist")
    val again = ScaleUp.embeddings(spark, 2000L)
    assert(e.select($"vec_id", $"label").except(again.select($"vec_id", $"label")).count() === 0)
    e.unpersist()
  }

  test("scaleCorpus writes a complete, loadable xK corpus") {
    val out = java.nio.file.Files.createTempDirectory("graft_sfgen").toString
    ScaleUp.scaleCorpus(spark, sfDir, out, 2)
    val li = Tables.lineitem(spark, out)
    assert(li.count() === 2 * Tables.lineitem(spark, sfDir).count())
    assert(Tables.region(spark, out).count() === 5)
    assert(Tables.nation(spark, out).count() === 25)
    assert(Tables.documents(spark, out).count() ===
      2 * Tables.documents(spark, sfDir).count())
    assert(Tables.embeddings(spark, out).count() ===
      2 * Tables.embeddings(spark, sfDir).count())
    // events normalize through Tables.events at both ends
    val ev = Tables.events(spark, out)
    assert(ev.count() === 2 * Tables.events(spark, sfDir).count())
    assert(ev.schema("ts").dataType.typeName === "timestamp_ntz")
  }
}
