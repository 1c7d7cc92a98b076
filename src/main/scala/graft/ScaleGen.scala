package graft

import org.apache.spark.sql.SparkSession

/** Scale-corpus synthesis main: `runMain graft.ScaleGen <srcDir> <outDir> <k>`
  * replicates the driver corpus at `srcDir` ×k into `outDir` (see
  * [[graft.ops.ScaleUp]]). Used to manufacture the sf1 (×10) corpus the
  * empirical scale gate runs on; deterministic for a given (src, k, seed).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, kStr) = args.take(3)
    val seed = if (args.length > 3) args(3).toLong else 42L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(defaultCpus = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.ScaleUp.scaleCorpus(spark, srcDir, outDir, kStr.toInt, seed)
    println(s"[scalegen] wrote x$kStr corpus from $srcDir to $outDir")
    spark.stop()
  }
}
