package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * 64-bit polynomial rolling hash of a string column — document
 * fingerprinting as a native Catalyst expression with whole-stage codegen
 * (SURVEY north-star: fingerprinting; the custom-Expression path of the
 * build plan's custom-vs-builtin table, §7.3).
 *
 * hash = Σ byte_i · B^(n-1-i)  (mod 2^64), B = 1000000007.
 */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string column, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * RollingHash.Base + (bytes(i) & 0xff)
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |byte[] ${ev.value}_bytes = $c.getBytes();
         |long ${ev.value}_h = 0L;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_bytes.length; ${ev.value}_i++) {
         |  ${ev.value}_h = ${ev.value}_h * ${RollingHash.Base}L + (${ev.value}_bytes[${ev.value}_i] & 0xff);
         |}
         |${ev.value} = ${ev.value}_h;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Base = 1000000007L
  def ofColumn(c: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(c)))
}
