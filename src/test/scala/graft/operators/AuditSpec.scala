package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The observe-based audit must report exact counts/bounds from the same
  * pass as the consuming action — no second scan, no cache.
  */
class AuditSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("audited write reports exact rows, nulls, and bounds from one pass") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .where($"l_quantity" >= 10)
      .select($"l_orderkey", $"l_quantity".cast("long").as("qty"))
    val expectedRows = df.count()
    val expectedMin = df.agg(min($"qty")).head().getLong(0)
    val expectedMax = df.agg(max($"qty")).head().getLong(0)

    val out = Files.createTempDirectory("audit").toString
    val metrics = Audit.auditedRun(df, "lineitem_audit", Seq("qty")) {
      _.write.mode("overwrite").parquet(s"$out/sink")
    }
    assert(metrics("rows") == expectedRows, s"rows ${metrics("rows")} != $expectedRows")
    assert(metrics("qty_nulls") == 0L)
    assert(metrics("qty_min") == expectedMin && metrics("qty_max") == expectedMax)
    // and the audit observed the SAME rows the sink received
    assert(spark.read.parquet(s"$out/sink").count() == expectedRows)
  }

  test("audit surfaces nulls introduced mid-pipeline") {
    val df = (1 to 100).map(i => (i.toLong, if (i % 10 == 0) null else s"v$i"))
      .toDF("id", "v")
    val metrics = Audit.auditedRun(df, "null_audit", Seq("v")) { d =>
      d.write.format("noop").mode("overwrite").save()
    }
    assert(metrics("rows") == 100L)
    assert(metrics("v_nulls") == 10L, s"expected 10 nulls, got ${metrics("v_nulls")}")
  }
}
