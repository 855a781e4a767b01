package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("RewriteLevenshtein swaps the builtin for the trimmed kernel") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteLevenshtein
    try {
      // non-foldable inputs, or ConstantFolding erases the evidence
      val df = spark.range(1).select(
        levenshtein(concat(lit("head-kitten-tail-"), col("id")),
          concat(lit("head-sitting-tail-"), col("id"))).as("d"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("levenshtein_trimmed"),
        s"rule did not rewrite the builtin:\n$opt")
      assert(df.head().getInt(0) == 3)
      // SQL surface gets the rewrite too
      val viaSql = spark.sql(
        "SELECT levenshtein('abcdef' || id, 'abXdef' || id) AS d FROM range(1)")
      assert(viaSql.queryExecution.optimizedPlan.toString
        .contains("levenshtein_trimmed"))
      assert(viaSql.head().getInt(0) == 1)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteLevenshtein)
    }
  }

  test("the threshold form is left untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteLevenshtein
    try {
      val df = spark.sql("SELECT levenshtein('kitten', 'sitting', 1) AS d")
      val opt = df.queryExecution.optimizedPlan.toString
      assert(!opt.contains("levenshtein_trimmed"),
        s"threshold form must keep builtin early-exit semantics:\n$opt")
      assert(df.head().getInt(0) == -1) // beyond threshold => -1
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteLevenshtein)
    }
  }

  test("GraftExtensions injects the rule without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("RewriteSpaceTokenCount: exact parity with size(split) on edge shapes") {
    // The kernel must equal size(split(s, ' ')) on EVERY input — empty
    // string, leading/trailing/consecutive spaces, multi-byte UTF-8.
    val cases = Seq("", " ", "  ", "a", "a b", " a b ", "a  b",
      "héllo wörld", "日本 語 テスト", "tab\there", "a   b")
    import spark.implicits._
    val df = cases.toDF("s").select(
      org.apache.spark.sql.functions.size(split($"s", " ")).as("builtin"),
      graft.functions.TextFunctions.spaceTokenCount($"s").as("kernel"))
    df.collect().zip(cases).foreach { case (r, in) =>
      assert(r.getInt(0) == r.getInt(1), s"mismatch on '$in': $r")
    }
    // null flows through as null (non-legacy size semantics)
    val nrow = Seq[String](null).toDF("s").select(
      graft.functions.TextFunctions.spaceTokenCount($"s").as("k")).head()
    assert(nrow.isNullAt(0))
  }

  test("RewriteSpaceTokenCount fires on the idiom and only the idiom") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RewriteSpaceTokenCount
    try {
      import spark.implicits._
      val df = spark.range(3).select(
        org.apache.spark.sql.functions.size(
          split(concat(lit("a b c "), $"id"), " ")).as("n"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("space_token_count"), s"rule did not fire:\n$opt")
      assert(df.collect().map(_.getInt(0)).toSeq == Seq(4, 4, 4))
      // A non-space pattern must be left alone.
      val other = spark.range(1).select(
        org.apache.spark.sql.functions.size(
          split(concat(lit("a,b,"), $"id"), ",")).as("n"))
      assert(!other.queryExecution.optimizedPlan.toString.contains("space_token_count"))
      assert(other.head().getInt(0) == 3)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RewriteSpaceTokenCount)
    }
  }

  test("SQL registrations expose every codegen kernel to pure SQL") {
    val reg = spark.sessionState.functionRegistry
    GraftFunctions.all.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
    try {
      assert(spark.sql(
        """SELECT graft_vec_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
          |  CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS d""".stripMargin)
        .head().getDouble(0) == 11.0)
      assert(spark.sql(
        "SELECT graft_levenshtein_trimmed('kitten', 'sitting') AS d")
        .head().getInt(0) == 3)
      assert(spark.sql("SELECT graft_minhash_sig('a b c d e f g h i') AS s")
        .head().getSeq[Long](0).length == 16)
      assert(spark.sql("SELECT graft_byte_sum(CAST('ab' AS BINARY)) AS s")
        .head().getLong(0) == 97L + 98L)
      assert(spark.sql(
        "SELECT graft_byte_weighted_sum(CAST('ab' AS BINARY)) AS s")
        .head().getLong(0) == 1L * 97 + 2L * 98)
      assert(spark.sql(
        "SELECT graft_byte_energy(CAST('ab' AS BINARY), 128) AS s")
        .head().getLong(0) == 31L * 31 + 30L * 30)
      assert(spark.sql(
        "SELECT graft_byte_crossings(CAST(x'7F81' AS BINARY), 128) AS s")
        .head().getLong(0) == 1L)
      assert(spark.sql("SELECT graft_byte_distinct(CAST('aabbbb' AS BINARY)) AS s")
        .head().getLong(0) == 2L)
      assert(spark.sql("SELECT graft_byte_maxfreq(CAST('aabbbb' AS BINARY)) AS s")
        .head().getLong(0) == 4L)
      // misuse fails at analysis with the function's name
      val err = intercept[Exception](
        spark.sql("SELECT graft_vec_dot(CAST(array(1.0) AS ARRAY<FLOAT>))").head())
      assert(err.getMessage.contains("graft_vec_dot"))
    } finally GraftFunctions.all.foreach { case (id, _, _) =>
      reg.dropFunction(id)
    }
  }
}
