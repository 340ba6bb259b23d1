package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge

/** Fused integer kernels for the IVF/PQ family (the [[CosineSimilarity]]
  * rationale at quantizer scale): the Column-HOF forms — nearest-cell
  * argmin, per-subspace code argmin, ADC — evaluate ~2k interpreted
  * boxed lambdas PER ROW (16 cells × 64 dims + 8 m × 16 k × 8 dims),
  * which made the corpus encode the dominant cost of `ann_family_build`
  * (29 s for 200k vectors at sf1). One serializable kernel object holds
  * the trained tables as primitive arrays and every expression fuses to
  * a tight long-arithmetic loop, interpreted and codegen'd alike.
  *
  * EXACTNESS CONTRACT: each kernel replays the HOF form's integer
  * arithmetic bit-for-bit — strict-< argmin keeps the FIRST minimum
  * (the `array_sort((d, k))` tie → lowest index rule), sums are Long,
  * residuals are plain differences — so swapping them into a query
  * changes no oracle hash (the DuckDB replays are unchanged).
  *
  * Trained tables ride as Seq (structural equality keeps TreeNode
  * comparisons sane) and are flattened to primitive arrays once per
  * expression instance; generated code reaches the kernel via
  * `addReferenceObj`, the standard constant-capture seam. */
final class PqKernel(coarseSeq: Seq[Seq[Long]], cbSeq: Seq[Seq[Seq[Long]]])
    extends Serializable {

  private val coarse: Array[Array[Long]] = coarseSeq.map(_.toArray).toArray
  private val cbs: Array[Array[Array[Long]]] =
    cbSeq.map(_.map(_.toArray).toArray).toArray
  private val m = cbs.length
  private val sub = if (m == 0) 0 else cbs(0)(0).length

  private def nearestCell(vq: Array[Long]): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < coarse.length) {
      val cc = coarse(c)
      var s = 0L
      var j = 0
      while (j < vq.length) { val d = vq(j) - cc(j); s += d * d; j += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  private def encode(res: Array[Long]): Array[Int] = {
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val book = cbs(mi)
      val base = mi * sub
      var bestK = 0
      var bestD = Long.MaxValue
      var k = 0
      while (k < book.length) {
        val cb = book(k)
        var s = 0L
        var j = 0
        while (j < sub) { val d = res(base + j) - cb(j); s += d * d; j += 1 }
        if (s < bestD) { bestD = s; bestK = k }
        k += 1
      }
      codes(mi) = bestK
      mi += 1
    }
    codes
  }

  /** Inline milli-grid quantization of a raw double vector — the same
    * IEEE multiply + floor as the `floor(x * 1000)` Column form and the
    * DuckDB `floor(x * 1000)::BIGINT` mirror (Spark's Floor is
    * Math.floor then a long cast). Folding it here removes the last
    * 64-interpreted-lambdas-per-row HOF from the corpus encode scan. */
  private def quantize(v: ArrayData): Array[Long] = {
    val n = v.numElements()
    val vq = new Array[Long](n)
    var i = 0
    while (i < n) { vq(i) = math.floor(v.getDouble(i) * 1000.0).toLong; i += 1 }
    vq
  }

  /** Raw-subvector PQ codes from the RAW double vector. */
  def encodePq(v: ArrayData): ArrayData =
    new GenericArrayData(encode(quantize(v)))

  /** IVFADC encode from the RAW double vector: cell + residual codes,
    * one pass. */
  def encodeIvf(v: ArrayData): InternalRow = {
    val vq = quantize(v)
    val cell = nearestCell(vq)
    val cc = coarse(cell)
    val res = new Array[Long](vq.length)
    var i = 0
    while (i < vq.length) { res(i) = vq(i) - cc(i); i += 1 }
    new GenericInternalRow(
      Array[Any](cell, new GenericArrayData(encode(res))))
  }

  /** Nearest coarse cell of the RAW double vector (ann_ivf_cosine's
    * assignment). */
  def cell(v: ArrayData): Int = nearestCell(quantize(v))

  /** Asymmetric distance: Σ_m L2(q_m, cb[m][codes_m]). */
  def adc(q: ArrayData, codes: ArrayData): Long = {
    val qa = q.toLongArray()
    var s = 0L
    var mi = 0
    while (mi < m) {
      val cb = cbs(mi)(codes.getInt(mi))
      val base = mi * sub
      var j = 0
      while (j < sub) { val d = qa(base + j) - cb(j); s += d * d; j += 1 }
      mi += 1
    }
    s
  }
}

/** struct(cell int, codes array<int>) from a milli-quantized vector. */
case class IvfPqEncode(child: Expression, coarse: Seq[Seq[Long]],
    codebooks: Seq[Seq[Seq[Long]]]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("cell", IntegerType, nullable = false),
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  @transient private lazy val kernel = new PqKernel(coarse, codebooks)

  override def nullSafeEval(v: Any): Any =
    kernel.encodeIvf(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $k.encodeIvf($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<int> raw-subvector codes from a milli-quantized vector. */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Long]]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  @transient private lazy val kernel = new PqKernel(Nil, codebooks)

  override def nullSafeEval(v: Any): Any =
    kernel.encodePq(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $k.encodePq($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** int nearest-cell index from a milli-quantized vector. */
case class NearestCell(child: Expression, coarse: Seq[Seq[Long]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  @transient private lazy val kernel = new PqKernel(coarse, Nil)

  override def nullSafeEval(v: Any): Any =
    kernel.cell(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $k.cell($x);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** long asymmetric (query-to-codes) distance. */
case class PqAdc(left: Expression, right: Expression,
    codebooks: Seq[Seq[Seq[Long]]]) extends BinaryExpression {

  override def dataType: DataType = LongType

  @transient private lazy val kernel = new PqKernel(Nil, codebooks)

  override def nullSafeEval(q: Any, codes: Any): Any =
    kernel.adc(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = ctx.addReferenceObj("pqKernel", kernel, classOf[PqKernel].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $k.adc($q, $c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PqKernels {
  def ivfpq_encode(v: Column, coarse: Seq[Seq[Long]],
      codebooks: Seq[Seq[Seq[Long]]]): Column =
    GraftColumnBridge.column(
      IvfPqEncode(GraftColumnBridge.expression(v), coarse, codebooks))

  def pq_encode(v: Column, codebooks: Seq[Seq[Seq[Long]]]): Column =
    GraftColumnBridge.column(
      PqEncode(GraftColumnBridge.expression(v), codebooks))

  def nearest_cell(v: Column, coarse: Seq[Seq[Long]]): Column =
    GraftColumnBridge.column(
      NearestCell(GraftColumnBridge.expression(v), coarse))

  def pq_adc(q: Column, codes: Column, codebooks: Seq[Seq[Seq[Long]]]): Column =
    GraftColumnBridge.column(
      PqAdc(GraftColumnBridge.expression(q), GraftColumnBridge.expression(codes),
        codebooks))
}
