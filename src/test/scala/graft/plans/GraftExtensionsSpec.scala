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
}
