package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types.IntegerType

/** SQL registration for the graft custom expressions, so `spark.sql`
  * users get the same kernels as the Column API:
  *
  *   SELECT simhash64(split(text, ' ')), vec_dot(a, b) FROM ...
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal INT argument, got $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    Shims.registerFunction(spark, "simhash64", es => SimHash64(es.head))
    Shims.registerFunction(spark, "shingle_hashes",
      es => ShingleHashes(es.head, intArg(es(1), "shingle_hashes")))
    Shims.registerFunction(spark, "minhash_sig",
      es => MinHashSig(es.head, intArg(es(1), "minhash_sig")))
    Shims.registerFunction(spark, "band_keys",
      es => BandKeys(es.head, intArg(es(1), "band_keys"), intArg(es(2), "band_keys")))
    Shims.registerFunction(spark, "vec_dot", es => DotProduct(es.head, es(1)))
    Shims.registerFunction(spark, "vec_norm2", es => Norm2(es.head))
    Shims.registerFunction(spark, "hyperplane_bands",
      es => HyperplaneBands(es.head, intArg(es(1), "hyperplane_bands"),
        intArg(es(2), "hyperplane_bands")))
  }
}
