package graft

import org.apache.spark.sql.functions._

/** ANN serving-geometry tuner: measures recall@k of the served IVF
  * families against exact brute force across a grid of query-time
  * knobs (nProbe, rerank) on one corpus — the experiment that decides
  * the [[graft.ops.LshGeometry]] probe/rerank schedules. Layouts are
  * the SERVED ones (AnnServing), so the grid probes the real stored
  * geometry; nProbe/rerank are query-time parameters and need no
  * rebuild. More queries than the gate report (default 50) so a
  * schedule decision rests on ~250 hit samples, not 50.
  *
  * Usage: runMain graft.AnnTune <sfDir> [nQueries]
  * Env: SPARK_GRAFT_CPUS, GRAFT_SERVE_ROOT (layout root to reuse).
  */
object AnnTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQ = args.lift(1).map(_.toInt).getOrElse(50)
    val k = 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builderFor(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{AnnServing, Similarity}

    val exact = Similarity.knnBruteForce(Tables.embeddings(spark, sfDir), nQ, k)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count()

    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      ann.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "semi").count().toDouble / nExact

    val probeGrid = Seq(16, 32, 48, 64, 96)
    for (p <- probeGrid) {
      val r = recall(AnnServing.knnIvf(spark, sfDir, nQ, k, nProbe = p))
      println(f"TUNE ivf     nProbe=$p%3d                recall@$k = $r%.3f")
    }
    for (p <- probeGrid) {
      val r = recall(AnnServing.knnIvfSq8(spark, sfDir, nQ, k, nProbe = p))
      println(f"TUNE ivf_sq8 nProbe=$p%3d                recall@$k = $r%.3f")
    }
    val mSubs = args.lift(2).map(_.toInt).getOrElse(-1)
    for (p <- Seq(32, 64); rr <- Seq(500, 2000, 5000)) {
      val r = recall(AnnServing.knnIvfPq(spark, sfDir, nQ, k, nProbe = p,
        mSubs = mSubs, rerank = rr))
      println(f"TUNE ivf_pq  m=$mSubs%2d nProbe=$p%3d rerank=$rr%5d   recall@$k = $r%.3f")
    }
    spark.stop()
  }
}
