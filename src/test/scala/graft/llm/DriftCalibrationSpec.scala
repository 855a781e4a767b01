package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The drift-gate bars are hand-shipped constants with a documented
  * derivation ("worst negative-control noise x safety factor, half-
  * significant rounding"). This spec closes the loop: the factored
  * [[LlmQueries.driftBarFrom]] helper, fed each family's OWN negative
  * controls at the three SFs, must reproduce the exact shipped
  * constants — so a deployment can run the same callable over its own
  * reference/held-out split and get a bar derived the documented way,
  * and a future fixture change that silently invalidates a shipped bar
  * fails here with the family named.
  */
class DriftCalibrationSpec extends SparkSpec {
  import spark.implicits._

  private val sfs =
    Seq("sf0.001", "sf0.01", "sf0.1").map(s => s"/root/testdata/$s")

  private def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  test("driftBarFrom reproduces the text bar from l73's unperturbed split") {
    val controls = sfs.map { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val b = expr("CAST(least(size(split(text, ' ')) div 16, 7) AS BIGINT)")
      (docs.where($"doc_id" % 4 =!= 1).select(b.as("bucket")),
        docs.where($"doc_id" % 4 === 1).select(b.as("bucket")))
    }
    assert(LlmQueries.driftBarFrom(controls) == LlmQueries.DriftBarX1e4,
      "text calibration no longer derives the shipped DriftBarX1e4")
  }

  test("driftBarFrom reproduces the vec bar from l81's unperturbed split") {
    val controls = sfs.map { d =>
      val e = spark.read.parquet(s"$d/embeddings.parquet")
        .select($"vec_id", $"embedding",
          sqrt(dot($"embedding", $"embedding")).as("nrm"))
      val ref = e.where($"vec_id" % 4 =!= 1)
      val stride = math.max(37L, math.ceil(ref.count() / 1000.0).toLong)
      val cent = ref.where($"vec_id" % stride === 11)
        .select($"vec_id".as("c_id"), $"embedding".as("cv"), $"nrm".as("cn"))
      def buckets(side: DataFrame): DataFrame = side.join(broadcast(cent))
        .select($"vec_id",
          struct(floor(dot($"embedding", $"cv") / ($"nrm" * $"cn") * 1e6 + 0.5)
            .cast("long").as("cc"), (-$"c_id").as("nc")).as("k"))
        .groupBy("vec_id").agg(max_by($"k.nc" * -1, $"k").as("c_id"))
        .select(($"c_id" % 8).cast("long").as("bucket"))
      (buckets(ref), buckets(e.where($"vec_id" % 4 === 1)))
    }
    assert(LlmQueries.driftBarFrom(controls) == LlmQueries.VecDriftBarX1e4,
      "vec calibration no longer derives the shipped VecDriftBarX1e4")
  }

  test("driftBarFrom reproduces the media bar from m15's unperturbed split") {
    val controls = sfs.map { d =>
      val m = graft.media.MediaOps.mediaTable(spark, d)
        .select($"media_id", $"payload")
      def buckets(side: DataFrame): DataFrame =
        side.select(expr("CAST(least(length(payload) div 100, 7) AS BIGINT)")
          .as("bucket"))
      (buckets(m.where($"media_id" % 4 =!= 1)),
        buckets(m.where($"media_id" % 4 === 1)))
    }
    assert(LlmQueries.driftBarFrom(controls) ==
      graft.media.MediaQueries.MediaDriftBarX1e4,
      "media calibration no longer derives the shipped MediaDriftBarX1e4")
  }

  test("halfSigRound snaps to half-significant operating points") {
    val cases = Seq(22950000L -> 25000000L, 14850000L -> 15000000L,
      25650000L -> 25000000L, 98000000L -> 100000000L, 12499L -> 10000L,
      7L -> 7L, 10L -> 10L, 12L -> 10L, 13L -> 15L)
    cases.foreach { case (in, want) =>
      assert(LlmQueries.halfSigRound(in) == want,
        s"halfSigRound($in) != $want")
    }
  }
}
