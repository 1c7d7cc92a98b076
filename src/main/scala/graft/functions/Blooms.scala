package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.Shims

/** Spark's own runtime-filter machinery (the `BloomFilterAggregate` /
  * `BloomFilterMightContain` pair behind
  * `spark.sql.optimizer.runtime.bloomFilter.*`, i.e. InjectRuntimeFilter)
  * exposed as library functions, so an operator can build a semi-join
  * pre-filter EXPLICITLY when it — not the optimizer — knows the
  * reference side is the small one. Both sides are codegen'd native
  * expressions: the aggregate builds the sketch distributedly (merge of
  * per-partition filters), membership tests run inside whole-stage
  * codegen. No UDF, no driver-side loop — the only driver touch is the
  * finished sketch bytes (size ∝ bits, never data).
  */
object Blooms {

  /** Aggregate column producing serialized bloom-filter bytes over the
    * xxhash64 of `value`. `expectedItems`/`fpp` size the sketch via the
    * standard optimal-bits formula (same helper Spark's own runtime
    * filter uses).
    */
  def bloomAgg(value: Column, expectedItems: Long, fpp: Double = 0.03): Column = {
    val bits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(math.max(expectedItems, 1L), fpp)
    Shims.column(new BloomFilterAggregate(
      new XxHash64(Seq(Shims.expression(value))),
      Shims.expression(lit(math.max(expectedItems, 1L))),
      Shims.expression(lit(bits))).toAggregateExpression())
  }

  /** Membership predicate against a built sketch (pass the bytes from
    * [[bloomAgg]] as a literal — it broadcasts with the task binary).
    * False positives possible (callers re-verify exactly), false
    * negatives impossible — so `filter(mightContain…)` before an exact
    * semi-join never changes the join's result, only its input volume.
    */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    Shims.column(BloomFilterMightContain(
      Shims.expression(lit(bloomBytes)),
      new XxHash64(Seq(Shims.expression(value)))))
}
