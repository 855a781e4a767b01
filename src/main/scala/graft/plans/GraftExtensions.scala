package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.functions.LevenshteinTrimmed

/** Optimizer rule: rewrite the built-in two-argument `levenshtein` to
  * the prefix/suffix-trimmed kernel ([[graft.functions.LevenshteinTrimmed]]).
  * Value-identical on every input (the trim is distance-preserving and
  * the spec pins parity), but near-duplicate pairs — the dominant case
  * in any dedup re-scoring pass — cost O(edit_window²) instead of
  * O(document²). Users writing plain SQL `levenshtein(a, b)` get the
  * fast kernel transparently; the three-argument threshold form has
  * different semantics (early-exit -1) and is left untouched, as are
  * non-default string collations.
  */
object RewriteLevenshtein extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Levenshtein(l, r, None)
          if l.dataType == StringType && r.dataType == StringType =>
        LevenshteinTrimmed(l, r)
    }
}

/** Optimizer rule: rewrite `size(split(s, ' '))` — the token-count
  * idiom used throughout the text-quality suite — to the single-pass
  * byte-scan counter [[graft.functions.SpaceTokenCount]], skipping the
  * per-row `UTF8String[]` materialization entirely. Fires only on the
  * exact shape the counter is provably identical to: the one-space
  * LITERAL pattern (any other regex has different match semantics),
  * limit -1 (the `functions.split(c, p)` default, which keeps empty
  * elements so the count is #separators + 1), non-legacy `size(null)`
  * semantics, and a default-collation string input.
  */
object RewriteSpaceTokenCount extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{If, IsNull, Literal, Size, StringSplit}
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // legacySizeOfNull (the ANSI-off default): size(null) = -1, so the
      // null case must keep that value; on a non-nullable input the If
      // is dead weight codegen folds trivially.
      case Size(StringSplit(str, Literal(pat: org.apache.spark.unsafe.types.UTF8String, StringType),
            Literal(-1, IntegerType)), legacy)
          if pat.toString == " " && str.dataType == StringType =>
        if (legacy)
          If(IsNull(str), Literal(-1, IntegerType), graft.functions.SpaceTokenCount(str))
        else graft.functions.SpaceTokenCount(str)
    }
}

/** SQL registrations for the library's codegen'd Catalyst expressions,
  * so a pure-SQL user (spark-sql shell, JDBC, `spark.sql(...)`) can
  * call the kernels without touching the Scala API:
  *
  *   - `graft_vec_dot(array<float>, array<float>)` — fused float dot
  *   - `graft_levenshtein_trimmed(string, string)` — trimmed edit distance
  *   - `graft_minhash_sig(string)` — 16-lane MinHash signature
  *   - `graft_byte_sum(binary)` / `graft_byte_weighted_sum(binary)`
  *   - `graft_byte_energy(binary, center)` / `graft_byte_crossings(binary, center)`
  *     (center must be an integer literal — it shapes the generated code)
  *   - `graft_byte_distinct(binary)` / `graft_byte_maxfreq(binary)` — the
  *     byte-entropy screen's histogram kernels
  *
  * Each builder validates arity up front so a SQL misuse fails at
  * analysis with the function's name, not at runtime inside codegen.
  */
object GraftFunctions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def arity(name: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n,
      s"$name expects $n argument(s), got ${args.length}")

  private def litInt(name: String, e: Expression): Int = {
    require(e.foldable, s"$name: center must be an integer literal")
    e.eval() match {
      case i: Int => i
      case i: java.lang.Integer => i.intValue
      case other =>
        throw new IllegalArgumentException(
          s"$name: center must be an INT literal, got $other")
    }
  }

  private def fd(name: String)(builder: Seq[Expression] => Expression): FunctionDescription =
    (FunctionIdentifier(name), new ExpressionInfo(classOf[GraftExtensions].getName, name),
      builder)

  val all: Seq[FunctionDescription] = Seq(
    fd("graft_vec_dot") { args =>
      arity("graft_vec_dot", args, 2)
      graft.functions.FloatVectorDot(args(0), args(1))
    },
    fd("graft_levenshtein_trimmed") { args =>
      arity("graft_levenshtein_trimmed", args, 2)
      LevenshteinTrimmed(args(0), args(1))
    },
    fd("graft_minhash_sig") { args =>
      arity("graft_minhash_sig", args, 1)
      graft.functions.MinHashSig(args(0))
    },
    fd("graft_simhash32") { args =>
      arity("graft_simhash32", args, 1)
      graft.functions.SimHash32(args(0))
    },
    fd("graft_byte_sum") { args =>
      arity("graft_byte_sum", args, 1)
      graft.functions.BinaryByteFold(args(0), weighted = false)
    },
    fd("graft_byte_weighted_sum") { args =>
      arity("graft_byte_weighted_sum", args, 1)
      graft.functions.BinaryByteFold(args(0), weighted = true)
    },
    fd("graft_byte_energy") { args =>
      arity("graft_byte_energy", args, 2)
      graft.functions.BinaryByteStat(args(0), "energy",
        litInt("graft_byte_energy", args(1)))
    },
    fd("graft_byte_crossings") { args =>
      arity("graft_byte_crossings", args, 2)
      graft.functions.BinaryByteStat(args(0), "crossings",
        litInt("graft_byte_crossings", args(1)))
    },
    fd("graft_byte_distinct") { args =>
      arity("graft_byte_distinct", args, 1)
      graft.functions.BinaryByteStat(args(0), "distinct", 0)
    },
    fd("graft_byte_maxfreq") { args =>
      arity("graft_byte_maxfreq", args, 1)
      graft.functions.BinaryByteStat(args(0), "maxfreq", 0)
    }
  )
}

/** Session-extensions entry point — production wiring is
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`; tests can
  * instead append [[RewriteLevenshtein]] to
  * `spark.experimental.extraOptimizations` and register
  * [[GraftFunctions.all]] on a live session's function registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RewriteLevenshtein)
    ext.injectOptimizerRule(_ => RewriteSpaceTokenCount)
    GraftFunctions.all.foreach(ext.injectFunction)
  }
}
