package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Shims
import org.apache.spark.sql.types._

/** Vector kernels for the similarity operators. Sequential left-to-right
  * double accumulation — bit-identical to the equivalent
  * aggregate(zip_with(...)) higher-order-function formulation (and to
  * the DuckDB oracle on DOUBLE[]), but ~two orders of magnitude faster:
  * higher-order functions are CodegenFallback (interpreted per pair),
  * these are inlined into whole-stage codegen.
  */
object VectorKernels {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def norm2(a: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    acc
  }

  /** Argmin cell over a fixed centroid matrix — the assignment kernel
    * for continuous vector ingest ([[graft.ops.Similarity]]
    * `assignCells`). Each candidate distance uses the same sequential
    * (a−c)² accumulation as `norm2(zip_with(v, c, _-_))`, and the
    * (cells, centroids) arrays arrive sorted by cell ascending with a
    * strict-improvement compare, so ties keep the LOWEST cell — the
    * exact semantics of the previous crossJoin + row_number window
    * over (d2, cell), without exploding nCells rows per vector
    * through a shuffle (at an sf100 ingest batch: 102 M window rows
    * per 100 k-vector append).
    *
    * Degenerate inputs FAIL FAST instead of leaking the internal -1
    * sentinel into a persisted `cell=-1` partition: an empty centroid
    * matrix or a vector whose every candidate distance is NaN (NaN
    * never beats the running best) has no defensible assignment — it
    * is corrupt model metadata or a NaN embedding, and the error names
    * the row's geometry so the bad input is findable.
    */
  def nearestCell(v: ArrayData, cells: Array[Int],
                  centroids: Array[Array[Double]]): Int = {
    var best = -1
    var bestD2 = Double.PositiveInfinity
    var k = 0
    while (k < centroids.length) {
      val c = centroids(k)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) { val d = v.getDouble(i) - c(i); acc += d * d; i += 1 }
      if (acc < bestD2) { bestD2 = acc; best = cells(k) }
      k += 1
    }
    if (best < 0)
      throw new IllegalStateException(
        s"nearest_cell: no assignable cell for a ${v.numElements()}-dim vector " +
          s"over ${centroids.length} centroid(s) — empty centroid matrix or " +
          "all-NaN distances (NaN embedding?)")
    best
  }

  /** All m PQ codes of a vector in one pass — the product-quantizer
    * encoder ([[graft.ops.Similarity.encodePq]]). Per subspace s, the
    * nearest codebook centroid of v[s·subDim … s·subDim+subDim) by the
    * same left-to-right (a−b)² accumulation as the HOF formulation it
    * replaces, with per-sub (cid, centroid) arrays sorted by cid
    * ascending and a strict-improvement compare — ties keep the LOWEST
    * cid, exactly the old array_min over struct(d2, cid).
    */
  def pqEncode(v: ArrayData, cids: Array[Array[Int]],
               cents: Array[Array[Array[Double]]], subDim: Int): ArrayData = {
    val m = cents.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val ks = cents(s)
      val ids = cids(s)
      val off = s * subDim
      var best = -1
      var bestD2 = Double.PositiveInfinity
      var k = 0
      while (k < ks.length) {
        val c = ks(k)
        val n = math.min(math.min(subDim, c.length),
          math.max(0, v.numElements() - off))
        var acc = 0.0
        var i = 0
        while (i < n) { val d = v.getDouble(off + i) - c(i); acc += d * d; i += 1 }
        if (acc < bestD2) { bestD2 = acc; best = ids(k) }
        k += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Asymmetric-distance (ADC) score of one PQ-coded candidate against
    * one query's flattened m×k lookup tables — the IVF-PQ scoring
    * kernel ([[graft.ops.Similarity.queryIvfPq]]). `tdot`/`tnorm` are
    * (sub, cid)-ordered flat arrays (index s·k + code), so the score is
    * m indexed lookups summed left-to-right: adot/√anorm2, the cosine
    * numerator/denominator the rerank ordering uses. The previous shape
    * posexploded every candidate into m (query, sub, code) rows, joined
    * the exploded stream against the table and re-aggregated — at an
    * sf100 probe that was ~80 M exploded rows through a join and a
    * hash-agg shuffle PER 10-query batch (measured r16: 31 s of the
    * 31.5 s serving wall). This form is one codegen'd projection over
    * the candidate rows: zero explosion, zero re-aggregation.
    */
  def pqAdcScore(codes: ArrayData, tdot: ArrayData, tnorm: ArrayData,
                 k: Int): Double = {
    val m = codes.numElements()
    var adot = 0.0
    var an2 = 0.0
    var s = 0
    while (s < m) {
      val idx = s * k + codes.getInt(s)
      adot += tdot.getDouble(idx)
      an2 += tnorm.getDouble(idx)
      s += 1
    }
    adot / math.sqrt(an2)
  }

  /** Plane-sign tables for [[hyperplaneBands]], cached per (planes,
    * dims): the ±1 entries depend only on (plane, dim), but the first
    * implementation recomputed the mix64 parity PER ROW — at the
    * size-derived sf1 geometry (102×14 planes, 256 dims) that is 365k
    * hash calls per vector, measured as ~2 min of single-core work for
    * one 20k-vector corpus. The table is ~3 MB, built once per JVM per
    * geometry, read-only across executor threads.
    */
  private val signTables =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def signTable(planes: Int, dims: Int): Array[Double] =
    signTables.computeIfAbsent((planes, dims), { case (p, d) =>
      val t = new Array[Double](p * d)
      var j = 0
      while (j < p) {
        var i = 0
        while (i < d) {
          t(j * d + i) =
            if ((HashKernels.mix64(i.toLong * 0x1fffffL + j) & 1L) == 0L) 1.0 else -1.0
          i += 1
        }
        j += 1
      }
      t
    })

  /** See [[HyperplaneBands]]. */
  def hyperplaneBands(v: ArrayData, bands: Int, bitsPerBand: Int): ArrayData = {
    val dims = v.numElements()
    val signs = signTable(bands * bitsPerBand, dims)
    val keys = new Array[Long](bands)
    var g = 0
    while (g < bands) {
      var key = 0L
      var b = 0
      while (b < bitsPerBand) {
        val j = g * bitsPerBand + b
        var proj = 0.0
        var i = 0
        val off = j * dims
        while (i < dims) {
          proj += v.getDouble(i) * signs(off + i)
          i += 1
        }
        if (proj > 0) key |= (1L << b)
        b += 1
      }
      keys(g) = (g.toLong << 32) | key
      g += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }
}

/** dot(array<double>, array<double>) → double, whole-stage-codegen'd. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot requires array<double>, got ${l.catalogString}, ${r.catalogString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** norm2(array<double>) → double (squared L2 norm), codegen'd. */
case class Norm2(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"norm2 requires array<double>, got ${t.catalogString}")
  }
  override def nullSafeEval(a: Any): Any =
    VectorKernels.norm2(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.norm2($a)")
  override protected def withNewChildInternal(c: Expression): Norm2 = copy(child = c)
  override def prettyName: String = "vec_norm2"
}

/** Random-hyperplane LSH band keys for an array<double> vector: plane
  * j's entries are deterministic ±1 from a hash of (dimension, plane);
  * each band of `bitsPerBand` sign bits (plus the band index) packs into
  * one long. One pass over bands×bits×dims in generated code.
  */
case class HyperplaneBands(child: Expression, bands: Int, bitsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bands requires array<double>, got ${t.catalogString}")
  }
  override def nullSafeEval(a: Any): Any =
    VectorKernels.hyperplaneBands(a.asInstanceOf[ArrayData], bands, bitsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.hyperplaneBands($a, $bands, $bitsPerBand)")
  override protected def withNewChildInternal(c: Expression): HyperplaneBands =
    copy(child = c)
  override def prettyName: String = "hyperplane_bands"
}

/** nearest_cell(array<double>) → int: argmin over a FIXED centroid
  * matrix captured at plan construction (model metadata, like the
  * hyperplane sign table — nCells ≤ 4096 × dim doubles, a few MB that
  * ship with the plan). See [[VectorKernels.nearestCell]] for the
  * distance/tie-break contract.
  */
case class NearestCell(child: Expression, cells: Array[Int],
                       centroids: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cell requires array<double>, got ${t.catalogString}")
  }
  override def nullSafeEval(a: Any): Any =
    VectorKernels.nearestCell(a.asInstanceOf[ArrayData], cells, centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "int[]")
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.nearestCell($a, $cellsRef, $centsRef)")
  }
  override protected def withNewChildInternal(c: Expression): NearestCell =
    copy(child = c)
  override def prettyName: String = "nearest_cell"
}

/** pq_encode(array<double>) → array<int>: all m PQ codes in one
  * codegen'd pass over a FIXED per-sub codebook matrix captured at
  * plan construction. See [[VectorKernels.pqEncode]] for the
  * distance/tie-break contract.
  */
case class PqEncode(child: Expression, cids: Array[Array[Int]],
                    centroids: Array[Array[Array[Double]]], subDim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<double>, got ${t.catalogString}")
  }
  override def nullSafeEval(a: Any): Any =
    VectorKernels.pqEncode(a.asInstanceOf[ArrayData], cids, centroids, subDim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "int[][]")
    val centsRef = ctx.addReferenceObj("centroids", centroids, "double[][][]")
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorKernels.pqEncode($a, $cidsRef, $centsRef, $subDim)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

/** pq_adc_score(codes, tdot, tnorm) → double: one candidate's ADC
  * cosine score from its m codes and the query's flattened (sub,
  * cid)-ordered lookup tables. `k` (codebook width) is plan-time
  * geometry. See [[VectorKernels.pqAdcScore]].
  */
case class PqAdcScore(codes: Expression, tdot: Expression, tnorm: Expression,
                      k: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = codes
  override def second: Expression = tdot
  override def third: Expression = tnorm
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, tdot.dataType, tnorm.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score requires (array<int>, array<double>, array<double>), " +
          s"got ${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    VectorKernels.pqAdcScore(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.functions.VectorKernels.pqAdcScore($a, $b, $c, $k)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): PqAdcScore =
    copy(codes = f, tdot = s, tnorm = t)
  override def prettyName: String = "pq_adc_score"
}

object VectorOps {
  def vecDot(a: Column, b: Column): Column =
    Shims.column(DotProduct(Shims.expression(a), Shims.expression(b)))
  def vecNorm2(a: Column): Column =
    Shims.column(Norm2(Shims.expression(a)))
  def hyperplaneBands(v: Column, bands: Int, bitsPerBand: Int): Column =
    Shims.column(HyperplaneBands(Shims.expression(v), bands, bitsPerBand))
  def nearestCell(v: Column, cells: Array[Int],
                  centroids: Array[Array[Double]]): Column =
    Shims.column(NearestCell(Shims.expression(v), cells, centroids))
  def pqEncode(v: Column, cids: Array[Array[Int]],
               centroids: Array[Array[Array[Double]]], subDim: Int): Column =
    Shims.column(PqEncode(Shims.expression(v), cids, centroids, subDim))
  def pqAdcScore(codes: Column, tdot: Column, tnorm: Column, k: Int): Column =
    Shims.column(PqAdcScore(Shims.expression(codes), Shims.expression(tdot),
      Shims.expression(tnorm), k))
}
