package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** Fused 16-lane MinHash signature of a text column, computed row-locally
  * in one pass over the character-4-gram shingles.
  *
  * Value-identical to the explode → md5 → conv → 16×min-aggregate
  * pipeline it replaces (same shingle positions `1..max(len-3,1)`, same
  * `first-15-hex-chars(md5) % P` base hash, same `(h*A_j + B_j) % P`
  * universal-hash lanes — P = 2³¹−1 keeps every product inside a long),
  * but it materializes ZERO (doc × shingle) rows and needs NO
  * aggregation shuffle: the signature is a scalar projection, so the
  * whole candidate-generation front half of the dedup suite becomes
  * map-only. `min` over a multiset equals `min` over the set, so the
  * kernel doesn't need the distinct the exploded form also skipped.
  * Corpus discipline: exactly ONE md5 per shingle, here literally one
  * `MessageDigest.digest` call.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(t: Any): Any =
    MinHashSig.sig(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val P = 2147483647L // 2^31 - 1 (prime)
  private val A = Array(1L, 3L, 5L, 7L, 11L, 13L, 17L, 19L,
    23L, 29L, 31L, 37L, 41L, 43L, 47L, 53L)
  private val B = Array(0L, 17L, 131L, 1031L, 8191L, 65537L, 524287L, 6700417L,
    127L, 257L, 509L, 2053L, 16411L, 262147L, 1048573L, 33554467L)
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Static kernel, called from both interpreted eval and codegen.
    *
    * Shingle positions are CODE POINTS, matching Spark's `substr` and
    * DuckDB's `substring` (both code-point based) — NOT UTF-16 units, so
    * astral characters shingle identically to the exploded form. One
    * pass records the UTF-8 byte offset of each code-point start; each
    * shingle is then a `(offset, length)` slice of the original byte
    * array fed straight to the digest — zero per-shingle allocation.
    */
  def sig(t: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val bytes = t.getBytes
    val nb = bytes.length
    // offs(c) = byte offset where code point c starts; offs(len) = nb.
    val offs = new Array[Int](nb + 1)
    var len = 0
    var p = 0
    while (p < nb) {
      offs(len) = p
      len += 1
      p += UTF8String.numBytesForFirstByte(bytes(p))
    }
    offs(len) = nb
    val n = math.max(len - 3, 1)
    val mins = Array.fill(16)(Long.MaxValue)
    val digest = md.get()
    var i = 0
    while (i < n) {
      val start = offs(i)
      val end = offs(math.min(i + 4, len))
      digest.reset()
      digest.update(bytes, start, end - start)
      val d = digest.digest()
      // first 15 hex chars of the md5 = bytes 0..6 + the high nibble of
      // byte 7 (exactly what conv(substring(hex, 1, 15), 16, 10) parses)
      var h = 0L
      var k = 0
      while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      h = ((h << 4) | ((d(7) & 0xffL) >>> 4)) % P
      var j = 0
      while (j < 16) {
        val v = (h * A(j) + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

/** `size(split(s, ' '))` without the array: the token-count idiom the
  * whole text-quality suite leans on (l10/l11/l15/l19/l44/l49/l57…)
  * normally materializes one `UTF8String[]` per row — at a ~400-word
  * document that is 400 object headers and a 3 KB array allocated,
  * counted, and thrown away. This expression counts in a single byte
  * scan instead.
  *
  * Exactness: `split` with the one-space literal pattern and limit -1
  * returns exactly (#separator matches + 1) elements — empty strings
  * from leading/trailing/consecutive separators are KEPT at negative
  * limit, so the element count never depends on content between
  * separators. 0x20 never occurs inside a multi-byte UTF-8 sequence
  * (continuation bytes are ≥ 0x80), so the byte scan counts exactly
  * the code-point matches the regex engine would. The rewrite rule
  * [[graft.plans.RewriteSpaceTokenCount]] applies this automatically.
  */
case class SpaceTokenCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "space_token_count"

  override protected def nullSafeEval(input: Any): Any =
    SpaceTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpaceTokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): SpaceTokenCount =
    copy(child = newChild)
}

object SpaceTokenCount {
  /** Static kernel shared by interpreted eval and codegen. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes
    var cnt = 1
    var i = 0
    while (i < n) {
      if (s.getByte(i) == 0x20) cnt += 1
      i += 1
    }
    cnt
  }
}

/** One-pass 32-bit SimHash over space-separated words (Charikar STOC
  * 2002 as the l31 formulation states it): per word, the first 4 bytes
  * of its md5 vote on every bit (+1 if set, −1 if clear); fingerprint
  * bit j is the sign of vote j. Value-identical to the historical
  * `transform(split(text,' '), w -> conv(substring(md5(w),1,8),16,10))`
  * array plus 32 `aggregate()` folds — but those folds are
  * higher-order-function lambdas Spark evaluates INTERPRETED, 32
  * traversals per document on the hot path (l31's whole cost tail).
  * Here: one byte scan, one md5 per word (the corpus discipline), all
  * 32 votes in one pass, codegen'd scalar projection. Splitting is on
  * the literal space BYTE with `split`'s keep-empty-segments semantics
  * (0x20 cannot occur inside a UTF-8 multibyte sequence, so this
  * equals the code-point split).
  */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(t: Any): Any =
    SimHash32.fp(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.fp($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Static kernel, called from both interpreted eval and codegen. */
  def fp(t: UTF8String): Long = {
    val bytes = t.getBytes
    val n = bytes.length
    val votes = new Array[Int](32)
    val digest = md.get()
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        digest.reset()
        digest.update(bytes, start, i - start)
        val d = digest.digest()
        // conv(substring(md5(w),1,8),16,10): the first 4 digest bytes
        // as an unsigned 32-bit value
        val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        var j = 0
        while (j < 32) {
          votes(j) += (((h >> j) & 1L).toInt * 2 - 1)
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}

object TextFunctions {
  /** Column wrapper for [[LevenshteinTrimmed]]. */
  def levenshteinTrimmed(a: Column, b: Column): Column =
    GraftColumns.column(LevenshteinTrimmed(
      GraftColumns.expression(a), GraftColumns.expression(b)))

  /** Column wrapper for [[MinHashSig]]. */
  def minhashSig(t: Column): Column =
    GraftColumns.column(MinHashSig(GraftColumns.expression(t)))

  /** Column wrapper for [[SpaceTokenCount]]. */
  def spaceTokenCount(t: Column): Column =
    GraftColumns.column(SpaceTokenCount(GraftColumns.expression(t)))

  /** Column wrapper for [[SimHash32]]. */
  def simhash32(t: Column): Column =
    GraftColumns.column(SimHash32(GraftColumns.expression(t)))
}
