package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** LevenshteinTrimmed must be value-identical to Spark's built-in
  * `levenshtein` on every input — the trimming is an optimization, not
  * a semantics change. Pinned on adversarial shapes (shared prefix only,
  * shared suffix only, both, neither, empties, repeats, multi-byte code
  * points) and on seeded random pairs, through BOTH the interpreted
  * kernel and the codegen'd whole-stage path.
  */
class TextExpressionsSpec extends SparkSpec {

  private def kernel(a: String, b: String): Int =
    LevenshteinTrimmed.distance(
      UTF8String.fromString(a), UTF8String.fromString(b))

  private val adversarial: Seq[(String, String)] = Seq(
    ("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
    ("kitten", "sitting"), ("flaw", "lawn"),
    // shared prefix only / suffix only / both
    ("prefix-aaaa-X", "prefix-aaaa-Y"),
    ("X-common-tail", "Y-common-tail"),
    ("same-head-A-same-tail", "same-head-BB-same-tail"),
    // trim must stop at the first mismatch even inside runs
    ("aaaaaaab", "aaaaaaba"), ("abababab", "babababa"),
    // one string contained in the other (suffix trim exhausts a side)
    ("abcdef", "abcXdef"), ("abcdef", "cdef"), ("abcdef", "abcd"),
    // multi-byte code points, incl. an astral pair (surrogates)
    ("héllo wörld", "hèllo wörld"), ("日本語テキスト", "日本語デキスト"),
    ("a😀b", "a😁b"), ("😀", ""))

  test("kernel matches Spark levenshtein on adversarial pairs") {
    val s = spark
    import s.implicits._
    val df = adversarial.toDF("a", "b")
      .select(expr("levenshtein(a, b)").as("ref"),
        TextFunctions.levenshteinTrimmed(col("a"), col("b")).as("got"),
        col("a"), col("b"))
    df.collect().foreach { r =>
      assert(r.getInt(0) == r.getInt(1),
        s"mismatch on (${r.getString(2)}, ${r.getString(3)})")
    }
  }

  test("kernel matches Spark levenshtein on seeded random pairs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdeé日😀 "
    def randStr(): String = {
      val n = rnd.nextInt(30)
      val sb = new StringBuilder
      var i = 0
      while (i < n) { sb.append(alphabet.charAt(rnd.nextInt(alphabet.length))); i += 1 }
      // Drop unpaired surrogates the random slice may have produced.
      sb.toString.filter(c => !Character.isSurrogate(c)) +
        (if (rnd.nextBoolean()) "😀" else "")
    }
    val pairs = Seq.fill(300)((randStr(), randStr())) ++
      // near-dup shape: long shared pre/suffix, tiny edit window
      Seq.fill(50) {
        val core = Seq.fill(200)(alphabet.charAt(rnd.nextInt(5))).mkString
        (core, core.patch(rnd.nextInt(core.length), "XY", rnd.nextInt(3)))
      }
    val s = spark
    import s.implicits._
    val bad = pairs.toDF("a", "b")
      .select(expr("levenshtein(a, b)").as("ref"),
        TextFunctions.levenshteinTrimmed(col("a"), col("b")).as("got"))
      .where(col("ref") =!= col("got"))
    assert(bad.count() == 0)
  }

  test("interpreted eval agrees with the codegen path") {
    adversarial.foreach { case (a, b) =>
      val viaSpark = spark.range(1)
        .select(levenshtein(lit(a), lit(b))).head().getInt(0)
      assert(kernel(a, b) == viaSpark, s"interpreted mismatch on ($a, $b)")
    }
  }

  test("minhash_sig matches the exploded explode→md5→min pipeline") {
    // The fused kernel must be value-identical to the historical
    // explode + md5 + conv + 16×min-aggregate formulation (which is
    // still the DuckDB oracle's shape) — including on empty strings,
    // sub-shingle-length strings, and astral code points, where the
    // shingle positions are CODE POINTS (Spark substr semantics), not
    // UTF-16 units.
    val texts = Seq(
      "", "a", "abc", "abcd", "abcde",
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld", "日本語テキストのサンプル",
      "a😀b😁c😂d", "😀😀😀😀😀", "mixed 日本 and 😀 astral ends😀")
    val s = spark
    import s.implicits._
    val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val P = 2147483647L
    val laneA = Seq(1L, 3L, 5L, 7L, 11L, 13L, 17L, 19L,
      23L, 29L, 31L, 37L, 41L, 43L, 47L, 53L)
    val laneB = Seq(0L, 17L, 131L, 1031L, 8191L, 65537L, 524287L, 6700417L,
      127L, 257L, 509L, 2053L, 16411L, 262147L, 1048573L, 33554467L)
    val exploded = base
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), greatest(length(col("text")) - 3, lit(1))),
        i => col("text").substr(i, lit(4)))).as("sh"))
      .select(col("doc_id"),
        (conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long") % P).as("h"))
      .groupBy("doc_id")
      .agg(laneA.indices.map(j =>
        min((col("h") * laneA(j) + laneB(j)) % P).as(s"sig$j")).head,
        laneA.indices.map(j =>
          min((col("h") * laneA(j) + laneB(j)) % P).as(s"sig$j")).tail: _*)
    val fused = base.select(col("doc_id"),
      TextFunctions.minhashSig(col("text")).as("mh"))
    val joined = exploded.join(fused, "doc_id").collect()
    assert(joined.length == texts.length)
    joined.foreach { r =>
      val sigs = (1 to 16).map(r.getLong)
      val mh = r.getSeq[Long](17)
      assert(sigs == mh, s"doc ${r.getLong(0)}: exploded $sigs vs fused $mh")
    }
  }

  test("simhash32 matches the word-hash array + 32-fold aggregate formulation") {
    // The one-pass kernel must be value-identical to the historical
    // transform(split(text,' '), w -> conv(substring(md5(w),1,8),16,10))
    // array plus 32 interpreted aggregate() bit folds (still the DuckDB
    // oracle's shape) — including empty strings, leading/trailing/double
    // spaces (split keeps empty segments), and multibyte words.
    val texts = Seq(
      "", " ", "a", "a b", " a b ", "double  space",
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld", "日本語 テキスト", "ends with space ")
    val s = spark
    import s.implicits._
    val base = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val hashed = base.select(col("doc_id"),
      transform(split(col("text"), " "),
        w => conv(substring(md5(w), 1, 8), 16, 10).cast("long")).as("hw"))
    val bits = (0 until 32).map { j =>
      val contrib = aggregate(col("hw"), lit(0),
        (acc, h) => acc + (shiftright(h, j) % 2).cast("int") * 2 - 1)
      when(contrib > 0, lit(1L << j)).otherwise(lit(0L))
    }
    val expected = hashed.select(col("doc_id"), bits.reduce(_ + _).as("sim"))
    val fused = base.select(col("doc_id"),
      TextFunctions.simhash32(col("text")).as("fp"))
    val joined = expected.join(fused, "doc_id")
      .select("doc_id", "sim", "fp").as[(Long, Long, Long)].collect()
    assert(joined.length == texts.length)
    joined.foreach { case (id, sim, fp) =>
      assert(sim == fp, s"doc $id: aggregate $sim vs kernel $fp")
    }
    // and on a real corpus slice
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpusJoined = docs.select(col("doc_id"),
        transform(split(col("text"), " "),
          w => conv(substring(md5(w), 1, 8), 16, 10).cast("long")).as("hw"))
      .select(col("doc_id"), bits.reduce(_ + _).as("sim"))
      .join(docs.select(col("doc_id"),
        TextFunctions.simhash32(col("text")).as("fp")), "doc_id")
      .where(col("sim") =!= col("fp")).count()
    assert(corpusJoined == 0, s"$corpusJoined corpus docs diverge")
  }

  test("null propagates") {
    val s = spark
    import s.implicits._
    val df = Seq(("a", null: String), (null: String, "b"), ("a", "b"))
      .toDF("a", "b")
      .select(TextFunctions.levenshteinTrimmed(col("a"), col("b")).as("d"))
    assert(df.collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
      == Seq(-1, -1, 1))
  }
}
