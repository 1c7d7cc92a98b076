package graft

import graft.ops.TrainingPrep
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  test("seqPack two-level scan equals the naive global prefix sum") {
    val out = TrainingPrep.seqPack(docs).cache()
    assert(out.count() === docs.count())
    // reference: the single-window global cumsum the oracle also uses
    val naive = out
      .select(col("doc_id"), col("n_tokens"))
      .withColumn("ref_offset", coalesce(
        sum(col("n_tokens")).over(
          Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val drift = out.join(naive, Seq("doc_id", "n_tokens"))
      .filter(col("stream_offset") =!= col("ref_offset")).count()
    assert(drift === 0)
    out.unpersist()
  }

  test("seqPack offsets tile the stream exactly and flags straddlers") {
    val out = TrainingPrep.seqPack(docs, budget = 256).cache()
    // offsets are the exclusive prefix sum: sorted by doc_id, each row's
    // offset is the previous row's offset + tokens (no gaps, no overlap)
    val rows = out.orderBy("doc_id")
      .select("stream_offset", "n_tokens", "pack_id", "pack_offset", "spans_boundary")
      .as[(Long, Long, Long, Long, Boolean)].collect()
    var expected = 0L
    rows.foreach { case (off, n, packId, packOff, spans) =>
      assert(off === expected)
      assert(packId === off / 256 && packOff === off % 256)
      assert(spans === (packOff + n > 256))
      expected = off + n
    }
    // pack ids are dense from 0
    val packs = out.select("pack_id").distinct().as[Long].collect().sorted
    assert(packs.head === 0L && packs.last === packs.length - 1)
    out.unpersist()
  }

  test("seqPack plan lock: the corpus-sized window is bucket-partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate}
    val ws = TrainingPrep.seqPack(docs).queryExecution.optimizedPlan
      .collect { case w: LWindow => w }
    assert(ws.nonEmpty, "expected Window nodes in the plan")
    // exactly the bucket-offset window (over a `buckets`-row aggregate)
    // may be globally ordered; the corpus cumsum must partition on __b
    val (global, bucketed) = ws.partition(_.partitionSpec.isEmpty)
    assert(global.size <= 1, s"found ${global.size} unpartitioned windows")
    assert(bucketed.nonEmpty, "corpus cumsum window lost its bucket partitioning")
    // the one global window sits above an aggregate (bucket totals), so
    // its input is `buckets`-sized, never corpus-sized
    global.foreach { w =>
      assert(w.collectFirst { case a: Aggregate => a }.nonEmpty,
        "unpartitioned window is not over the bucket-totals aggregate")
    }
  }

  test("seqPack is stable under repartition and bucket-count choice") {
    val base = TrainingPrep.seqPack(docs)
    val re = TrainingPrep.seqPack(docs.repartition(13), buckets = 7)
    assert(base.except(re).count() === 0 && re.except(base).count() === 0)
  }

  test("mixWeights: weights sum to ~1 and budget is honored") {
    val out = TrainingPrep.mixWeights(docs, alpha = 0.5, budgetDocs = 1000L)
      .as[(String, Long, Double, Double, Long, Double)].collect()
    assert(out.length === docs.select("source").distinct().count())
    val wSum = out.map(_._4).sum
    assert(math.abs(wSum - 1.0) < 1e-3, s"weights sum $wSum")
    val targetSum = out.map(_._5).sum
    assert(math.abs(targetSum - 1000L) <= out.length, s"targets sum $targetSum")
    // α<1 upweights small sources: weight ordering follows n_docs ordering
    // but compressed — check monotonicity
    val sorted = out.sortBy(_._2)
    assert(sorted.map(_._4).zip(sorted.map(_._4).drop(1)).forall { case (a, b) => a <= b })
  }

  test("mixWeights α=1 recovers raw shares") {
    val out = TrainingPrep.mixWeights(docs, alpha = 1.0, budgetDocs = 1000L)
      .select("raw_share", "weight").as[(Double, Double)].collect()
    out.foreach { case (raw, w) => assert(math.abs(raw - w) < 2e-6) }
  }

  test("shardAssign: dense positions per shard, deterministic, balanced-ish") {
    val out = TrainingPrep.shardAssign(docs, nShards = 8).cache()
    assert(out.count() === docs.count())
    assert(out.select("doc_id").distinct().count() === docs.count())
    // positions are 1..n_s dense within each shard
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .as[(Long, Long, Long, Long)].collect()
    perShard.foreach { case (_, n, lo, hi) => assert(lo === 1L && hi === n) }
    assert(perShard.map(_._1).toSet.subsetOf((0L until 8L).toSet))
    // hash balance: no shard holds more than 3x its fair share
    val fair = docs.count().toDouble / 8
    perShard.foreach { case (s, n, _, _) =>
      assert(n < 3 * fair, s"shard $s holds $n of fair $fair") }
    // stable under repartition
    val re = TrainingPrep.shardAssign(docs.repartition(11), nShards = 8)
    assert(out.except(re).count() === 0 && re.except(out).count() === 0)
    out.unpersist()
  }

  test("badwordFilter emits every doc and flags exactly ratio > threshold") {
    val out = TrainingPrep.badwordFilter(docs, threshold = 0.05).cache()
    assert(out.count() === docs.count())
    val bad = out.filter(col("is_flagged") &&
      (col("bad_ratio").isNull || col("bad_ratio") <= 0.05)).count()
    val good = out.filter(!col("is_flagged") && col("bad_ratio") > 0.05).count()
    assert(bad === 0 && good === 0)
    // synthetic: a pure-blocklist doc flags, a clean doc doesn't
    val synth = Seq((1L, "slow dup error bad"), (2L, "fast clean text here"))
      .toDF("doc_id", "text")
    val m = TrainingPrep.badwordFilter(synth)
      .select("doc_id", "is_flagged").as[(Long, Boolean)].collect().toMap
    assert(m(1L) && !m(2L))
    out.unpersist()
  }

  test("chunk: windows tile with the declared overlap and reconstruct every doc") {
    // planted: 5 tokens, size 4 / stride 2 → starts 0,2,4 with the tail
    // chunk short but kept
    val synth = Seq((1L, "t0 t1 t2 t3 t4")).toDF("doc_id", "text")
    val s = TrainingPrep.chunk(synth, chunkSize = 4, stride = 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    assert(s.map(x => (x._2, x._4)).toSeq === Seq(
      (0L, "t0 t1 t2 t3"), (1L, "t2 t3 t4"), (2L, "t4")))
    // corpus: chunk counts match the geometry, consecutive full chunks
    // share exactly chunkSize − stride tokens, and taking the first
    // `stride` tokens of every chunk plus the tail of the last one
    // reconstructs the doc's token stream
    val toks = docs.select(col("doc_id"),
      filter(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))), " "),
        w => w =!= "").as("ws"))
      .as[(Long, Seq[String])].collect().toMap
    val out = TrainingPrep.chunk(docs).as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).map { case (id, rows) => id -> rows.sortBy(_._2).map(_._4) }
    assert(out.nonEmpty)
    out.foreach { case (id, chunks) =>
      val ws = toks(id)
      assert(chunks.length === (ws.length - 1) / 24 + 1, s"doc $id chunk count")
      val rebuilt = chunks.init.flatMap(_.split(" ").take(24)) ++
        chunks.last.split(" ")
      assert(rebuilt.toSeq === ws, s"doc $id reconstruction")
      chunks.sliding(2).foreach {
        case Array(a, b) if a.split(" ").length == 32 =>
          assert(a.split(" ").drop(24).toSeq === b.split(" ").take(8).toSeq,
            s"doc $id overlap")
        case _ =>
      }
    }
  }

  test("mixSample realizes data_mix budgets exactly, copies in {base, base+1}, layout-stable") {
    val out = TrainingPrep.mixSample(docs).cache()
    val budgets = TrainingPrep.mixWeights(docs)
      .select(col("source"), col("n_docs"), col("target_n"))
      .as[(String, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // per-source copy sums hit target_n EXACTLY — the property that
    // makes the manifest a faithful realization of the mixture
    val sums = out.groupBy(col("source")).agg(sum(col("n_copies")).as("s"))
      .as[(String, Long)].collect().toMap
    budgets.foreach { case (src, (_, target)) =>
      assert(sums.getOrElse(src, 0L) === target, s"$src copy sum")
    }
    // every doc's copy count is base or base+1 for its source
    val bad = out.as[(Long, String, Long, Long)].collect().count {
      case (_, src, _, copies) =>
        val (n, target) = budgets(src)
        copies != target / n && copies != target / n + 1
    }
    assert(bad === 0)
    // deterministic under input layout
    assert(TrainingPrep.mixSample(docs.repartition(11)).except(out).count() === 0)
    out.unpersist()
  }

  test("mixPack tiles the mixed stream exactly and reshuffles per epoch") {
    val out = TrainingPrep.mixPack(docs).cache()
    val rows = out.select("doc_id", "copy_idx", "n_tokens", "stream_offset")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._4)
    // one unit per manifest copy
    val totalCopies = TrainingPrep.mixSample(docs)
      .agg(sum(col("n_copies"))).as[Long].head()
    assert(rows.length.toLong === totalCopies)
    // offsets tile: each unit starts where the previous ended
    assert(rows.head._4 === 0L)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._4 === a._4 + a._3, s"gap after ${a._1}/${a._2}")
      case _ =>
    }
    // epoch 2 is a DIFFERENT permutation of its docs than epoch 1
    // (per-copy hash), yet both contain each doc at most once
    val e1 = rows.filter(_._2 == 1L).map(_._1)
    val e2 = rows.filter(_._2 == 2L).map(_._1)
    assert(e1.distinct.length === e1.length)
    assert(e2.distinct.length === e2.length)
    if (e2.length > 2) assert(!e2.sameElements(e1.take(e2.length)))
    // layout-stable
    assert(TrainingPrep.mixPack(docs.repartition(9)).except(out).count() === 0)
    out.unpersist()
  }

  test("epochShuffle is a dense deterministic permutation; two-level scan = global rank") {
    val n = docs.count()
    val out = TrainingPrep.epochShuffle(docs).cache()
    // dense permutation: positions are exactly 1..N, one per doc
    assert(out.count() === n)
    assert(out.select("position").distinct().count() === n)
    assert(out.agg(min(col("position")), max(col("position")))
      .as[(Long, Long)].head() === ((1L, n)))
    // bucketed two-level rank equals the naive single-window global rank
    val naive = docs
      .select(col("doc_id"),
        row_number().over(Window.orderBy(
          md5(concat(lit("epoch0:"), col("doc_id").cast("string"))),
          col("doc_id"))).cast("long").as("ref_pos"))
    assert(out.join(naive, Seq("doc_id"))
      .filter(col("position") =!= col("ref_pos")).count() === 0)
    // deterministic across invocations; a different seed reorders
    assert(out.except(TrainingPrep.epochShuffle(docs)).count() === 0)
    assert(TrainingPrep.epochShuffle(docs, seed = 1)
      .except(out).count() > 0)
    // layout-independent: the permutation is a pure function of doc_id,
    // so input partitioning must not leak into positions
    assert(TrainingPrep.epochShuffle(docs.repartition(7))
      .except(out).count() === 0)
    out.unpersist()
  }
}
