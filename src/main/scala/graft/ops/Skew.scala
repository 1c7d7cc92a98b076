package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join handling
  * (spark.sql.adaptive.skewJoin, on by default) is the first line of
  * defense; explicit salting is for aggregations and for joins where a
  * handful of hot keys dominate (e.g. a viral document's shingle, a
  * null-heavy foreign key).
  */
object Skew {

  /** Salted two-phase aggregation: count/sum-style aggregates over a
    * skewed key. Phase 1 aggregates on (key, salt) — spreading a hot key
    * over `salts` reducers — phase 2 combines the partials. Only valid
    * for decomposable aggregates (sum/count/min/max).
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id().cast("long"), lit(salts.toLong)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col("key"))
      .agg(sum(col("__partial")).as("total"), sum(col("__n")).as("n"))

  /** Deterministic salt in [0, salts): a stable hash of the full row —
    * invariant under repartition and task retry, unlike
    * monotonically_increasing_id(), which depends on partition layout.
    * Identical rows co-salt — acceptable, since exact duplicates of a
    * hot key are rare relative to the key's row count.
    */
  def stableSalt(df: DataFrame, salts: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(salts.toLong))

  /** Salted broadcast-replicated join: the big side gets a stable salt
    * in [0, salts); the small side is exploded `salts` times so every
    * (key, salt) pair still matches. Use when the small side fits in a
    * broadcast ×salts and the big side's key histogram is too spiky for
    * AQE to split well.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt", stableSalt(big, salts))
    val saltedSmall = small.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedBig.join(broadcast(saltedSmall), Seq(key, "__salt")).drop("__salt")
  }
}
