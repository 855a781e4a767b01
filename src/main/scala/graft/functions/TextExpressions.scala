package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftext.GraftColumns
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact Levenshtein distance with common prefix/suffix trimming.
  *
  * Value-identical to `levenshtein(a, b)` (code-point unit edits, same
  * as DuckDB's `levenshtein`), but strips the shared prefix and suffix
  * before running the O(n*m) dynamic program. Near-duplicate documents
  * — the only pairs the LSH candidate generation emits — differ by
  * small in-place edits, so the DP runs over the short edited window
  * instead of the full document: the kernel drops from
  * O(len_a * len_b) to O(edit_window²) + one linear scan. Worst case
  * (nothing shared) is the classic two-row DP, same as before.
  *
  * Trimming is distance-preserving: if a = x·p and b = x·q then
  * lev(a,b) = lev(p,q), and symmetrically for a shared suffix of the
  * remainders — every optimal alignment can be normalized to match the
  * shared ends. The DP itself is the textbook recurrence, so the result
  * is bit-identical to the untrimmed computation on any input.
  */
case class LevenshteinTrimmed(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two string arguments, " +
        s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "levenshtein_trimmed"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinTrimmed.distance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LevenshteinTrimmed.distance($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevenshteinTrimmed =
    copy(left = newLeft, right = newRight)
}

object LevenshteinTrimmed {
  /** Static kernel, called from both interpreted eval and codegen. */
  def distance(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString.codePoints().toArray
    val t = b.toString.codePoints().toArray
    // Trim the shared prefix, then the shared suffix of the remainders.
    var lo = 0
    var sHi = s.length
    var tHi = t.length
    while (lo < sHi && lo < tHi && s(lo) == t(lo)) lo += 1
    while (sHi > lo && tHi > lo && s(sHi - 1) == t(tHi - 1)) { sHi -= 1; tHi -= 1 }
    val n = sHi - lo
    val m = tHi - lo
    if (n == 0) return m
    if (m == 0) return n
    // Two-row DP over the edited window; iterate the longer side in the
    // outer loop so the rows are as short as possible.
    val (x, xOfs, xLen, y, yOfs, yLen) =
      if (n >= m) (s, lo, n, t, lo, m) else (t, lo, m, s, lo, n)
    val prev = new Array[Int](yLen + 1)
    val curr = new Array[Int](yLen + 1)
    var j = 0
    while (j <= yLen) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= xLen) {
      curr(0) = i
      val xi = x(xOfs + i - 1)
      j = 1
      while (j <= yLen) {
        val cost = if (xi == y(yOfs + j - 1)) 0 else 1
        val del = prev(j) + 1
        val ins = curr(j - 1) + 1
        val sub = prev(j - 1) + cost
        curr(j) = math.min(math.min(del, ins), sub)
        j += 1
      }
      System.arraycopy(curr, 0, prev, 0, yLen + 1)
      i += 1
    }
    prev(yLen)
  }
}

object TextFunctions {
  /** Column wrapper for [[LevenshteinTrimmed]]. */
  def levenshteinTrimmed(a: Column, b: Column): Column =
    GraftColumns.column(LevenshteinTrimmed(
      GraftColumns.expression(a), GraftColumns.expression(b)))
}
