package graft

import org.apache.spark.sql.SparkSession

/** Perf-loop helper: print the formatted physical plan of one (or all)
  * SparkEntry queries and time execution. SPARK_GRAFT_EXPLAIN_REPS
  * times each query N times (this host shows large one-off flukes;
  * per-run times are printed so outliers are visible).
  *
  *   runMain graft.Explain <queryName|all> [sfDir] [--no-plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("all")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val showPlan = !args.contains("--no-plan")
    val reps = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_REPS", "1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(defaultCpus = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val targets =
      if (name == "all") SparkEntry.queries.toSeq.sortBy(_._1)
      else Seq(name -> SparkEntry.queries(name))
    targets.foreach { case (n, fn) =>
      val df = fn(spark, sfDir)
      if (showPlan) {
        println(s"===== $n =====")
        df.explain("formatted")
      }
      // reps=0: plan-dump only (the r16 plans/ artifact capture)
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val cnt = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[explain] $n%-24s run $r: rows=$cnt%-8d ${sec}%.2f s")
      }
    }
    spark.stop()
  }
}
