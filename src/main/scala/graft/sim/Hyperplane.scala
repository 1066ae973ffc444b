package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

import scala.util.hashing.MurmurHash3

/**
 * Deterministic pseudo-random hyperplane component matrix, lazily built once
 * per JVM per expression instance (r22 — hoisted out of [[Similarity]] so the
 * native signature expressions below can share it; the values are IDENTICAL
 * to the r01-r21 UDF's: MurmurHash3.productHash((plane, dim, seed)) mapped to
 * [-1, 1)). @transient: the matrix is deterministic from (planes, seed), so
 * executors rebuild it locally instead of shipping ~planes x dims doubles in
 * every task closure.
 */
private[graft] class PlaneMatrix(planes: Int, seed: Int) extends Serializable {
  @transient private var mat: Array[Array[Double]] = _
  def get(dims: Int): Array[Array[Double]] = {
    if (mat == null || mat(0).length < dims)
      mat = Array.tabulate(planes, dims)((p, i) => PlaneMatrix.component(p, i, seed))
    mat
  }
}

private[graft] object PlaneMatrix {
  /** Uniform in [-1, 1) from the 32-bit hash — adequate for sign tests. */
  def component(plane: Int, dim: Int, seed: Int): Double = {
    val h = MurmurHash3.productHash((plane, dim, seed))
    h.toDouble / Int.MaxValue.toDouble
  }
}

/**
 * Random-hyperplane LSH signature as a native codegen'd expression (r22):
 * one sign bit per plane packed in a LONG — the bucketing kernel of
 * lshTopK / embeddingNearDuplicates / semanticDecontaminate / the streaming
 * near-dup index. The scalar-UDF formulation boxed the whole vector into a
 * Seq[Double] per corpus row (VERDICT r21's allocation-pressure class);
 * this is one fused primitive loop over the (by-then unboxed) input array.
 * Arithmetic replicates the UDF bit-exactly: s = fold of v(i) * row(i) in
 * index order, bit set iff s > 0.
 */
case class HyperplaneSignature(child: Expression, planes: Int, seed: Int)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 63, s"need 1 <= planes <= 63, got $planes")
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_signature requires an ARRAY<DOUBLE|FLOAT> input, got $t")
  }

  @transient private lazy val pm = new PlaneMatrix(planes, seed)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSignature.compute(input.asInstanceOf[ArrayData], pm, planes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pmRef = ctx.addReferenceObj("planeMatrix", pm, classOf[PlaneMatrix].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.sim.HyperplaneSignature.compute($a, $pmRef, $planes, $isFloat);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object HyperplaneSignature {
  /** Shared by interpreted eval and generated code (FLOAT widened per
    * element, like [[DotProduct]] — no upstream cast-to-double copy). */
  def compute(v: ArrayData, pm: PlaneMatrix, planes: Int, isFloat: Boolean): Long = {
    val n = v.numElements()
    val mat = pm.get(n)
    var sig = 0L
    var p = 0
    while (p < planes) {
      val row = mat(p)
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += x * row(i); i += 1
      }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def ofColumn(c: Column, planes: Int, seed: Int): Column =
    GraftSqlBridge.column(HyperplaneSignature(GraftSqlBridge.expression(c), planes, seed))
}

/**
 * Banded hyperplane signatures (`bands` independent LONG signatures of
 * `planesPerBand` sign bits, disjoint plane families) as ONE native
 * expression — the AND-OR amplified LSH kernel. Same bit-exact arithmetic
 * as the UDF it replaces; output is an UNBOXED long array.
 */
case class HyperplaneBandSignatures(child: Expression, bands: Int,
    planesPerBand: Int, seed: Int) extends UnaryExpression {
  require(bands >= 1, s"need bands >= 1, got $bands")
  require(planesPerBand >= 1 && planesPerBand <= 63,
    s"need 1 <= planesPerBand <= 63, got $planesPerBand")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_band_signatures"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_band_signatures requires an ARRAY<DOUBLE|FLOAT> input, got $t")
  }

  @transient private lazy val pm = new PlaneMatrix(bands * planesPerBand, seed)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBandSignatures.compute(
      input.asInstanceOf[ArrayData], pm, bands, planesPerBand, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pmRef = ctx.addReferenceObj("planeMatrix", pm, classOf[PlaneMatrix].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.sim.HyperplaneBandSignatures.compute(" +
        s"$a, $pmRef, $bands, $planesPerBand, $isFloat);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBandSignatures = copy(child = newChild)
}

object HyperplaneBandSignatures {
  /** Shared by interpreted eval and generated code (FLOAT widened per
    * element, like [[DotProduct]]). */
  def compute(v: ArrayData, pm: PlaneMatrix, bands: Int,
      planesPerBand: Int, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val mat = pm.get(n)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var p = 0
      while (p < planesPerBand) {
        val row = mat(b * planesPerBand + p)
        var s = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
          s += x * row(i); i += 1
        }
        if (s > 0) sig |= (1L << p)
        p += 1
      }
      out(b) = sig
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def ofColumn(c: Column, bands: Int, planesPerBand: Int, seed: Int): Column =
    GraftSqlBridge.column(HyperplaneBandSignatures(
      GraftSqlBridge.expression(c), bands, planesPerBand, seed))
}
