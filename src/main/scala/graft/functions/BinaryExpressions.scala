package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftext.GraftColumns
import org.apache.spark.sql.types._

/** Codegen'd fold over the bytes of a `binary` column — the scalar
  * building block of the multimodal (image/audio/video payload) feature
  * path. Bytes are read unsigned (`b & 0xff`); `weighted` multiplies each
  * byte by its 1-based position (an order-sensitive checksum). Stays
  * inside whole-stage codegen, unlike a Scala UDF over Array[Byte].
  */
case class BinaryByteFold(child: Expression, weighted: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String =
    if (weighted) "binary_byte_weighted_sum" else "binary_byte_sum"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var s = 0L
    var i = 0
    while (i < bytes.length) {
      val v = (bytes(i) & 0xff).toLong
      s += (if (weighted) (i + 1) * v else v)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      val term = if (weighted) s"($i + 1L) * $v" else v
      s"""
         |long $s = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  long $v = (long) ($bytes[$i] & 0xff);
         |  $s += $term;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BinaryByteFold =
    copy(child = newChild)
}

object BinaryFunctions {
  /** Sum of unsigned byte values of a binary column. */
  def byteSum(bin: Column): Column =
    GraftColumns.column(BinaryByteFold(GraftColumns.expression(bin), weighted = false))

  /** Position-weighted sum: Σ (i+1) * byte_i (1-based), an
    * order-sensitive checksum of a binary column.
    */
  def byteWeightedSum(bin: Column): Column =
    GraftColumns.column(BinaryByteFold(GraftColumns.expression(bin), weighted = true))
}
