package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hash kernels used by the dedup operators. Self-contained (no
  * dependence on Spark-internal hash objects) so the semantics are
  * stable across Spark versions.
  */
object HashKernels {

  /** splitmix64 finalizer — strong 64-bit avalanche. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit hash of raw bytes (FNV-1a folded through splitmix64). */
  def hashBytes(b: Array[Byte], seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xffL)) * 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  /** One-pass SimHash over a token array: per token take a 64-bit hash,
    * vote ±1 per bit position, sign of the vote becomes the output bit.
    * Duplicate tokens vote multiple times (term-frequency weighting).
    */
  def simhash(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = hashBytes(arr.getUTF8String(t).getBytes, 0L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }
}

/** Custom Catalyst expression: 64-bit SimHash of an ARRAY<STRING> of
  * tokens, computed in ONE pass per row with proper whole-stage codegen
  * (the composed-builtins alternative is 64 separate aggregates).
  *
  * Used by the near-dup operator graft.ops.TextDedup.simhashNearDups
  * (SURVEY.md §2D, dedup_simhash).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StringType, _) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${child.dataType.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    HashKernels.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

object Hashes {
  /** Column API for [[SimHash64]]. */
  def simhash64(tokens: Column): Column = Shims.column(SimHash64(Shims.expression(tokens)))
}
