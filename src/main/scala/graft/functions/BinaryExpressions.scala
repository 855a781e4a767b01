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

/** Codegen'd audio-feature fold over the bytes of a `binary` column —
  * the per-frame kernels of a PCM feature extractor, bytes standing in
  * for samples centered on `center` (so `b - center` is the signed
  * amplitude):
  *
  *  - `energy`: Σ (b − center)² — the frame-energy / RMS numerator.
  *  - `crossings`: #\{i : (bᵢ − center)·(bᵢ₊₁ − center) < 0\} — the
  *    zero-crossing count (adjacent strict sign changes), the classic
  *    cheap pitch/voicedness feature.
  *
  * Like [[BinaryByteFold]] this stays inside whole-stage codegen; a UDF
  * over Array[Byte] would break the codegen span per frame.
  */
case class BinaryByteStat(child: Expression, mode: String, center: Int)
    extends UnaryExpression {
  require(mode == "energy" || mode == "crossings" ||
    mode == "distinct" || mode == "maxfreq", s"unknown mode $mode")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary argument, got ${t.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = s"binary_byte_$mode"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    var s = 0L
    var i = 0
    if (mode == "energy") {
      while (i < bytes.length) {
        val v = (bytes(i) & 0xff).toLong - center
        s += v * v
        i += 1
      }
    } else if (mode == "crossings") {
      while (i + 1 < bytes.length) {
        val a = (bytes(i) & 0xff).toLong - center
        val b = (bytes(i + 1) & 0xff).toLong - center
        if (a * b < 0) s += 1L
        i += 1
      }
    } else {
      val counts = new Array[Long](256)
      while (i < bytes.length) {
        counts(bytes(i) & 0xff) += 1L
        i += 1
      }
      var b = 0
      while (b < 256) {
        if (mode == "distinct") { if (counts(b) > 0) s += 1L }
        else if (counts(b) > s) s = counts(b)
        b += 1
      }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val c = ctx.freshName("counts")
      val body =
        if (mode == "energy")
          s"""
             |for (int $i = 0; $i < $bytes.length; $i++) {
             |  long $a = (long) ($bytes[$i] & 0xff) - ${center}L;
             |  $s += $a * $a;
             |}
           """.stripMargin
        else if (mode == "crossings")
          s"""
             |for (int $i = 0; $i + 1 < $bytes.length; $i++) {
             |  long $a = (long) ($bytes[$i] & 0xff) - ${center}L;
             |  long $b = (long) ($bytes[$i + 1] & 0xff) - ${center}L;
             |  if ($a * $b < 0) $s += 1L;
             |}
           """.stripMargin
        else {
          val reduce =
            if (mode == "distinct") s"if ($c[$b] > 0L) $s += 1L;"
            else s"if ($c[$b] > $s) $s = $c[$b];"
          s"""
             |long[] $c = new long[256];
             |for (int $i = 0; $i < $bytes.length; $i++) {
             |  $c[$bytes[$i] & 0xff] += 1L;
             |}
             |for (int $b = 0; $b < 256; $b++) { $reduce }
           """.stripMargin
        }
      s"""
         |long $s = 0L;
         |$body
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BinaryByteStat =
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

  /** Σ (b − center)² over the bytes — frame energy. */
  def byteEnergy(bin: Column, center: Int): Column =
    GraftColumns.column(BinaryByteStat(GraftColumns.expression(bin), "energy", center))

  /** Adjacent strict sign changes of (b − center) — zero crossings. */
  def byteCrossings(bin: Column, center: Int): Column =
    GraftColumns.column(BinaryByteStat(GraftColumns.expression(bin), "crossings", center))

  /** Count of distinct byte values (0–256) — the alphabet-size half of
    * the byte-entropy screen.
    */
  def byteDistinct(bin: Column): Column =
    GraftColumns.column(BinaryByteStat(GraftColumns.expression(bin), "distinct", 0))

  /** Highest frequency of any single byte value — the dominance half of
    * the byte-entropy screen.
    */
  def byteMaxFreq(bin: Column): Column =
    GraftColumns.column(BinaryByteStat(GraftColumns.expression(bin), "maxfreq", 0))
}
